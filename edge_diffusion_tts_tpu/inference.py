"""EdgeInference: few-step mel generation, fully jitted.

The canonical API (reference: edge_diffusion_tts/inference.py:12-62):

  generate_mel(sem_idx, num_steps)      tokens -> normalized log-mel
  generate_from_audio(wav, num_steps)   wav -> tokens -> normalized log-mel

TPU design: the whole denoise loop (decoder forward + DDIM update, 1-4
iterations) compiles to ONE XLA program per (batch, token-length, num_steps)
signature — a ``lax.scan`` over static timesteps with schedule tables resident
in device memory.  The raw-DDIM epsilon interpretation of the decoder output
matches the reference exactly; a v-prediction variant is provided for
models trained with the v2 recipe (train_v2.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .config import CFG
from .schedule import DiffusionSchedule, ddim_sample


class EdgeInference:
    """Few-step (1-4) inference driver around a decoder apply-fn.

    ``decoder_apply(params, x_t, t, sem_idx=..., step_idx=..., sem_features=...)``
    is the flax ``Module.apply`` of EdgeDiffusionDecoder.  Jitted samplers are
    cached per call signature; warm-up once, then each call is one device
    dispatch.
    """

    def __init__(
        self,
        cfg: CFG,
        schedule: DiffusionSchedule,
        decoder_apply,
        decoder_params,
        encoder_apply=None,
        encoder_params=None,
        prediction: str = "eps",
        backend: str = "xla",
        sampler: str = "ddim",
        solver_order: int = 2,
    ):
        """``backend="fused"`` routes generate_mel through the Pallas
        mega-kernel (ops/fused_denoise.py: whole loop in one launch,
        weights VMEM-resident); "xla" uses the lax.scan program.

        ``sampler="dpmpp"`` serves with DPM-Solver++ (order ``solver_order``)
        — the sampler the v2 recipe validates and deploys with (reference
        train_v2.py:166-206); it interprets the decoder as a v-prediction
        (or x0) model, so it requires ``prediction != "eps"``.
        """
        if sampler not in ("ddim", "dpmpp"):
            raise ValueError(f"unknown sampler {sampler!r}")
        if sampler == "dpmpp" and prediction == "eps":
            raise ValueError(
                "DPM-Solver++ serving expects a v-prediction (v2-recipe) "
                "model; train with use_v_prediction or use sampler='ddim'"
            )
        if sampler == "dpmpp" and backend == "fused":
            raise ValueError("the fused backend implements DDIM only")
        self.cfg = cfg
        self.schedule = schedule
        self.decoder_apply = decoder_apply
        self.decoder_params = decoder_params
        self.encoder_apply = encoder_apply
        self.encoder_params = encoder_params
        self.prediction = prediction
        self.backend = backend
        self.sampler = sampler
        self.solver_order = solver_order
        self._gen_mel_jit = {}
        self._encode_jit = None

    # -- jitted program builders --------------------------------------------------

    def _build_generate_mel(self, num_steps: int, masked: bool = False):
        """One fused XLA program: noise -> num_steps x (decode + DDIM) -> x0.

        ``masked=True`` builds the variable-length-batch variant: it takes an
        extra ``sem_mask`` [B, S] bool argument marking real token positions;
        padded keys are excluded from attention so each row's valid frames
        equal its unpadded generation (micro-batched serving, serving.py).
        The fused Pallas backend carries no per-batch masks — masked calls
        use the XLA program.
        """
        schedule = self.schedule
        decoder_apply = self.decoder_apply
        prediction = self.prediction

        if masked:
            if self.sampler == "dpmpp":
                from .schedule import DPMSolverPP

                solver = DPMSolverPP(
                    schedule, order=self.solver_order,
                    predict_x0=prediction == "x0",
                )
                max_t = min(self.cfg.max_timestep, schedule.T - 1)

            @jax.jit
            def run_masked(params, sem_idx, rng, temperature, sem_mask):
                B, T_sem = sem_idx.shape
                mel_mask = jnp.repeat(sem_mask, 2, axis=1)  # 50 Hz -> 100 Hz
                x_T = (
                    jax.random.normal(
                        rng, (B, T_sem * 2, self.cfg.n_mels), jnp.float32
                    )
                    * temperature
                )

                def model_fn(x, t, step_idx):
                    return decoder_apply(
                        params, x, t, sem_idx=sem_idx, step_idx=step_idx,
                        sem_mask=sem_mask, mel_mask=mel_mask,
                    )

                if self.sampler == "dpmpp":
                    return solver.sample(model_fn, x_T, num_steps, max_t=max_t)
                return ddim_sample(
                    schedule, model_fn, x_T, num_steps, prediction=prediction
                )

            return run_masked

        if self.backend == "fused":
            from .ops.fused_denoise import fused_generate_mel

            @jax.jit
            def run_fused(params, sem_idx, rng, temperature):
                B, T_sem = sem_idx.shape
                x_T = (
                    jax.random.normal(
                        rng, (B, T_sem * 2, self.cfg.n_mels), jnp.float32
                    )
                    * temperature
                )
                return fused_generate_mel(
                    self.cfg, schedule, params, sem_idx, x_T, num_steps,
                    prediction,
                )

            return run_fused

        if self.sampler == "dpmpp":
            from .schedule import DPMSolverPP

            solver = DPMSolverPP(
                schedule, order=self.solver_order,
                predict_x0=prediction == "x0",
            )
            max_t = min(self.cfg.max_timestep, schedule.T - 1)

            @jax.jit
            def run_dpmpp(params, sem_idx, rng, temperature):
                B, T_sem = sem_idx.shape
                x_T = (
                    jax.random.normal(
                        rng, (B, T_sem * 2, self.cfg.n_mels), jnp.float32
                    )
                    * temperature
                )

                def model_fn(x, t, step_idx):
                    return decoder_apply(
                        params, x, t, sem_idx=sem_idx, step_idx=step_idx
                    )

                return solver.sample(model_fn, x_T, num_steps, max_t=max_t)

            return run_dpmpp

        @jax.jit
        def run(params, sem_idx, rng, temperature):
            B, T_sem = sem_idx.shape
            T_out = T_sem * 2  # 50 Hz tokens -> 100 Hz mel frames
            x_T = (
                jax.random.normal(rng, (B, T_out, self.cfg.n_mels), jnp.float32)
                * temperature
            )

            def model_fn(x, t, step_idx):
                return decoder_apply(
                    params, x, t, sem_idx=sem_idx, step_idx=step_idx
                )

            return ddim_sample(
                schedule, model_fn, x_T, num_steps, prediction=prediction
            )

        return run

    # -- public API -----------------------------------------------------------------

    def generate_mel(
        self,
        sem_idx: jnp.ndarray,
        num_steps: Optional[int] = None,
        temperature: float = 1.0,
        rng: Optional[jax.Array] = None,
        sem_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Semantic tokens [B, S] -> normalized log-mel [B, 2S, n_mels].

        Reference semantics: inference.py:24-53 (stride = T // num_steps,
        timesteps = range(T-1, 0, -stride)[:num_steps], eta=0 DDIM, returns
        the final x0 prediction).  ``sem_mask`` ([B, S] bool, True = real
        token) enables exact variable-length batching: row i's frames
        ``[:2 * sem_mask[i].sum()]`` match that row's unpadded generation.
        """
        num_steps = (
            num_steps if num_steps is not None else self.cfg.inference_steps
        )
        if num_steps <= 0:
            raise ValueError(f"num_steps must be positive, got {num_steps}")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        masked = sem_mask is not None
        key = (num_steps, masked)
        if key not in self._gen_mel_jit:
            self._gen_mel_jit[key] = self._build_generate_mel(
                num_steps, masked=masked
            )
        if masked:
            return self._gen_mel_jit[key](
                self.decoder_params, sem_idx, rng, jnp.float32(temperature),
                sem_mask,
            )
        return self._gen_mel_jit[key](
            self.decoder_params, sem_idx, rng, jnp.float32(temperature)
        )

    def generate_from_audio(
        self,
        wav: jnp.ndarray,
        num_steps: Optional[int] = None,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Reference wav [T] or [B, T] -> generated normalized log-mel.

        ``num_steps`` defaults to cfg.inference_steps, same as generate_mel.
        Reference: inference.py:56-62 (encode to tokens, then generate_mel).
        The HuBERT+quantizer encode runs as a cached jitted program (one
        compile per wav shape) — for the batched 32-utterance config the
        95M-param HuBERT forward dominates, so it must not re-trace per call.
        """
        if self.encoder_apply is None:
            raise ValueError("EdgeInference was constructed without an encoder")
        if wav.ndim == 1:
            wav = wav[None, :]
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.encoder_apply)
        sem_idx = self._encode_jit(self.encoder_params, wav)
        return self.generate_mel(sem_idx, num_steps, rng=rng)
