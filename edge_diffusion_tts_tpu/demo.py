"""Demo / sample-generation script: checkpoint -> few-step mel -> waveform.

Functional equivalent of the reference's generate_sample.py (reference:
generate_sample.py:20-207): load the final model, encode a reference
utterance to semantic tokens, generate mel in N steps, vocode with inverse
mel scale + Griffin-Lim, and optionally run the "oracle" wav -> mel ->
Griffin-Lim -> wav round trip that isolates vocoder error from model error.

The optional noisereduce post-filter of the reference (generate_sample.py:
163-174) is gated on availability — a simple spectral-floor gate is applied
instead when the package is absent.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import CFG
from .inference import EdgeInference
from .models import EdgeDiffusionDecoder, HubertConfig, SemanticEncoder
from .ops.mel import MelFrontend, inverse_mel_scale
from .ops.vocoder import griffin_lim
from .utils.audio import denormalize_mel, normalize_mel


def vocode_mel(
    cfg: CFG,
    mel_log: jnp.ndarray,
    rng: jax.Array,
    n_iter: int = 100,
) -> np.ndarray:
    """Log-mel [B, T, n_mels] -> waveform [B, T*hop] via invmel + Griffin-Lim."""
    fe = MelFrontend(
        sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, n_mels=cfg.n_mels, f_min=cfg.f_min,
        f_max=cfg.f_max,
    )
    spec = inverse_mel_scale(jnp.exp(mel_log), fe.fbank)
    return np.asarray(
        griffin_lim(
            spec, rng, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
            win_length=cfg.win_length, n_iter=n_iter,
        )
    )


def denoise_post_filter(wav: np.ndarray, sample_rate: int) -> np.ndarray:
    """noisereduce when available, else a mild spectral floor gate."""
    try:
        import noisereduce  # noqa: F401  (not in the base image)

        return noisereduce.reduce_noise(y=wav, sr=sample_rate)
    except Exception:
        from .ops.mel import istft, stft_complex

        re, im = stft_complex(jnp.asarray(wav)[None])
        mag = jnp.sqrt(re**2 + im**2)
        floor = jnp.percentile(mag, 20.0, axis=1, keepdims=True)
        gain = jnp.clip((mag - 0.5 * floor) / jnp.maximum(mag, 1e-8), 0.0, 1.0)
        return np.asarray(istft(re * gain, im * gain, length=wav.shape[-1]))[0]


def oracle_roundtrip(
    cfg: CFG, wav: np.ndarray, rng: jax.Array, n_iter: int = 100
) -> np.ndarray:
    """wav -> mel -> Griffin-Lim -> wav: the vocoder-error isolation path.

    Reference: generate_sample.py:180-204.
    """
    fe = MelFrontend(
        sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, n_mels=cfg.n_mels, f_min=cfg.f_min,
        f_max=cfg.f_max,
    )
    mel_log = fe(jnp.asarray(wav)[None])
    return vocode_mel(cfg, mel_log, rng, n_iter)[0][: wav.shape[-1]]


def generate_sample(
    ckpt_path: str,
    wav_path: Optional[str] = None,
    num_steps: int = 4,
    out_path: str = "generated.wav",
    oracle: bool = False,
    post_filter: bool = False,
    seed: int = 0,
    sampler: str = "ddim",
    hubert_cfg: Optional["HubertConfig"] = None,
) -> Tuple[np.ndarray, int]:
    """Full demo: restore model, generate from a reference wav, write output.

    Returns (waveform, sample_rate).  Requires a checkpoint produced by
    training.save_final_model and (unless wav_path given) LJSpeech on disk.
    """
    from scipy.io import wavfile

    from .data import load_wav, resample_np
    from .schedule import DiffusionSchedule
    from .training.checkpoint import restore_final_model

    params, cfg = restore_final_model(ckpt_path)
    rng = jax.random.PRNGKey(seed)

    if wav_path is None:
        wav_path = os.path.join(cfg.ljspeech_dir, "wavs", "LJ001-0010.wav")
    wav, sr = load_wav(wav_path)
    if sr != cfg.sample_rate:
        wav = resample_np(wav, sr, cfg.sample_rate)

    if oracle:
        rec = oracle_roundtrip(cfg, wav, rng)
        wavfile.write(out_path, cfg.sample_rate,
                      (np.clip(rec, -1, 1) * 32767).astype(np.int16))
        return rec, cfg.sample_rate

    from .training.checkpoint import encoder_variables, restore_hubert_config

    encoder = SemanticEncoder(cfg, hubert_cfg or restore_hubert_config(ckpt_path))
    decoder = EdgeDiffusionDecoder(cfg)
    schedule = DiffusionSchedule.create(cfg.diff_steps)

    # encoder_variables threads the saved VQ codebook (vq_state collection)
    # for use_fsq=False checkpoints; FSQ models carry none.
    def encoder_apply(variables, w):
        return encoder.apply(variables, w, method=encoder.encode)

    inf = EdgeInference(
        cfg, schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params["decoder"],
        encoder_apply=encoder_apply,
        encoder_params=encoder_variables(params),
        # The checkpoint's cfg records the training objective; the
        # EdgeInference constructor rejects dpmpp with an eps model.
        prediction="v" if cfg.use_v_prediction else "eps",
        sampler=sampler,
    )

    mel_n = inf.generate_from_audio(jnp.asarray(wav), num_steps=num_steps, rng=rng)

    # Denormalize with the reference utterance's own mel statistics
    # (training operates in normalized-mel space; generate_sample.py:97-121).
    fe = MelFrontend(
        sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, n_mels=cfg.n_mels, f_min=cfg.f_min,
        f_max=cfg.f_max,
    )
    ref_mel = fe(jnp.asarray(wav)[None])
    _, mean, std = normalize_mel(ref_mel)
    mel_log = denormalize_mel(mel_n, mean, std)

    out = vocode_mel(cfg, mel_log, rng)[0]
    if post_filter:
        out = denoise_post_filter(out, cfg.sample_rate)
    wavfile.write(out_path, cfg.sample_rate,
                  (np.clip(out, -1, 1) * 32767).astype(np.int16))
    print(f"wrote {out_path} ({out.shape[-1] / cfg.sample_rate:.2f}s)")
    return out, cfg.sample_rate
