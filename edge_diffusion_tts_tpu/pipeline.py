"""Long-audio chunked generation: sliding window + inpainting + crossfade.

TPU-native equivalent of the reference's chunked pipeline
(reference: inference_pipeline.py:51-403):

  - global semantic encoding of the full utterance (pad to x320);
  - 2 s chunks with 0.5 s overlap; each chunk is refined from noise by a
    CFG-guided v-prediction DDIM loop that re-injects the noised tail of the
    previous chunk over the overlap region (inpainting);
  - triangular crossfade accumulation in linear-mel space, then 5x3 average
    smoothing, inverse mel scale, and Griffin-Lim vocoding.

TPU re-design: the per-chunk refine loop is ONE jitted ``lax.scan`` over a
static timestep grid (compiled once, reused for every chunk), and the
conditional + unconditional CFG branches run as a fused batch of 2 through
the decoder instead of two sequential forwards.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import CFG
from .ops.mel import MelFrontend, inverse_mel_scale
from .ops.vocoder import griffin_lim
from .schedule import DiffusionSchedule
from .utils.audio import normalize_mel


class LongFormPipeline:
    """Chunked long-form mel generation around (encoder, decoder) apply fns.

    ``decoder_apply(params, x, t, sem_features=..., step_idx=...)`` and
    ``encoder_apply(params, wav) -> z_q [B, S, D]`` (the features-only
    forward, reference FastSemanticEncoder inference_pipeline.py:19-49).
    """

    def __init__(
        self,
        cfg: CFG,
        schedule: DiffusionSchedule,
        decoder_apply,
        decoder_params,
        encoder_apply=None,
        encoder_params=None,
        chunk_seconds: float = 2.0,
        overlap_seconds: float = 0.5,
        mesh=None,
        prep_buckets=None,
        sem_stride: int = 320,
    ):
        self.cfg = cfg
        self.schedule = schedule
        self.decoder_apply = decoder_apply
        self.decoder_params = decoder_params
        self.encoder_apply = encoder_apply
        self.encoder_params = encoder_params
        # Optional jax.sharding.Mesh: the batched refine shards its stream
        # rows over the mesh's data axis (params replicated, XLA inserts
        # the collectives) — N chips serve N x the concurrent long-form
        # streams at one stream's per-chunk latency.  Row counts must then
        # be multiples of the data-axis size (``row_quantum``); the serving
        # scheduler pads its batches accordingly.
        self.mesh = mesh
        self.mel_frontend = MelFrontend(
            sample_rate=cfg.sample_rate,
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            n_mels=cfg.n_mels,
            f_min=cfg.f_min,
            f_max=cfg.f_max,
        )
        # Samples per semantic latent (hubert-base conv stack: 320 = 20 ms
        # at 16 kHz).  The chunk->latent slicing, the prep's pad-to-valid,
        # and the serving warmup's S all follow this; pass the encoder's
        # HubertConfig.total_stride when it isn't the production stack
        # (run_server derives it from the checkpoint's hubert.json).
        self.sem_stride = int(sem_stride)
        self.chunk_samples = int(chunk_seconds * cfg.sample_rate)
        self.overlap_samples = int(overlap_seconds * cfg.sample_rate)
        self.hop_samples = self.chunk_samples - self.overlap_samples
        self.chunk_frames = self.chunk_samples // cfg.hop_length + 1
        self.overlap_frames = self.overlap_samples // cfg.hop_length + 1
        self.hop_frames = self.chunk_frames - self.overlap_frames
        # Optional compile-bounding for stream_prep: sample-count buckets
        # (sorted ascending).  When set, every stream's prep pads its wav to
        # the smallest bucket >= its length and runs ONE program per BUCKET
        # (instead of one per distinct wav length — an unbounded compile
        # surface under real serving traffic).  Exactness comes from the
        # masked HuBERT forward (models/hubert.py wav_len): the encode of a
        # bucket-padded wav equals the exact-length encode up to float
        # accumulation order (~1e-6); chunk stats and the PRNG chain are
        # row-identical by construction.  Requires encoder_apply to accept
        # a ``wav_len`` kwarg (SemanticEncoder does).
        self.prep_buckets = (
            tuple(sorted(int(b) for b in prep_buckets)) if prep_buckets else None
        )
        self._refine_jit = {}
        # stream_prep programs, created ONCE here rather than check-then-
        # create in the request path: LongFormScheduler.submit runs
        # stream_prep on each client's handler thread, and with warmup
        # disabled two concurrent first submits could otherwise both build a
        # wrapper and pay a duplicate multi-minute tunneled encoder compile.
        self._prep_jit = jax.jit(self._prep_impl)
        self._prep_bucket_jit = jax.jit(
            lambda p, w, r, L: self._prep_impl(p, w, r, wav_len=L)
        )

    @property
    def row_quantum(self) -> int:
        """Smallest valid row count for the batched refine (the mesh's
        data-axis size, or 1 single-device)."""
        if self.mesh is None:
            return 1
        from .parallel.mesh import DATA_AXIS

        return self.mesh.shape[DATA_AXIS]

    # -- jitted chunk refine -------------------------------------------------

    def _build_refine(
        self,
        strength: float,
        steps: int,
        cfg_scale: float,
        from_keys: bool = False,
    ):
        """One XLA program: noise -> steps x (CFG decode + inpaint DDIM) -> x0.

        Batched over a leading stream axis B, and every row is a pure
        function of its OWN inputs: per-row PRNG keys (``rngs [B]``) drive
        all noise draws and a per-row ``have_known [B]`` flag gates the
        inpainting, so a row's result does not depend on which other streams
        share the batch.  That independence is what lets the serving-side
        ``LongFormScheduler`` continuously batch concurrent long-form
        streams while keeping each stream reproducible from its seed alone
        (tests/test_pipeline.py::test_refine_batch_rows_match_single).

        ``from_keys=True`` builds the dispatch-minimal serving variant: the
        coarse input is pure noise drawn INSIDE the program from per-row
        ``k_noise`` (bit-identical to ``jax.random.normal(k_noise, (1,T,M))``
        outside), so a chunk tick costs ONE device program — through a
        tunneled chip every extra dispatch is ~30 ms, which is what made
        per-chunk host-side prep dominate the batched refine itself.

        Reference semantics: inpaint_teacher_refine
        (inference_pipeline.py:145-196).
        """
        schedule = self.schedule
        cfg = self.cfg
        overlap = self.overlap_frames
        t_start = int(cfg.diff_steps * strength)
        grid = np.linspace(t_start, 0, steps + 1).astype(np.int64)[:-1]
        t_grid = jnp.asarray(grid, dtype=jnp.int32)
        t_next_grid = jnp.asarray(
            np.concatenate([grid[1:], [0]]), dtype=jnp.int32
        )

        if self.mesh is not None:
            # Rows sharded over the data axis, params replicated; the
            # fused CFG batch of 2B inside stays row-sharded (XLA GSPMD).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import DATA_AXIS

            rows = NamedSharding(self.mesh, P(DATA_AXIS))
            repl = NamedSharding(self.mesh, P())
            jit = lambda f: jax.jit(  # noqa: E731
                f,
                in_shardings=(repl, rows, rows, rows, rows, rows),
                out_shardings=rows,
            )
        else:
            jit = jax.jit

        @jit
        def refine(params, x_in, sem_features, known_mel, have_known, rngs):
            B, T, M = known_mel.shape
            if from_keys:
                # x_in carries per-row NOISE KEYS [B] instead of samples.
                x_coarse = jax.vmap(
                    lambda k: jax.random.normal(k, (T, M), known_mel.dtype)
                )(x_in)
            else:
                x_coarse = x_in
            keys = jax.vmap(jax.random.split)(rngs)  # [B, 2] keys
            k_init, k_loop = keys[:, 0], keys[:, 1]
            t0 = jnp.full((B,), t_start, jnp.int32)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, (T, M), x_coarse.dtype)
            )(k_init)
            x_curr, _ = schedule.q_sample(x_coarse, t0, noise)

            frame_idx = jnp.arange(T)[None, :, None]
            overlap_mask = (frame_idx < overlap) & have_known[:, None, None]
            z_null = jnp.zeros_like(sem_features)
            s_idx = jnp.zeros((2 * B,), jnp.int32)
            sem_both = jnp.concatenate([sem_features, z_null], axis=0)

            def body(carry, inp):
                x, keys = carry
                t, t_next = inp
                ks = jax.vmap(jax.random.split)(keys)
                keys, k_known = ks[:, 0], ks[:, 1]
                t_b = jnp.full((B,), t, jnp.int32)

                # Inpainting: re-inject the noised known tail over the overlap.
                noise_k = jax.vmap(
                    lambda k: jax.random.normal(k, (T, M))
                )(k_known)
                known_noisy, _ = schedule.q_sample(known_mel, t_b, noise_k)
                x = jnp.where(overlap_mask, known_noisy, x)

                # CFG as one fused batch of [cond; uncond].
                if cfg_scale != 1.0:
                    x2 = jnp.concatenate([x, x], axis=0)
                    t2 = jnp.concatenate([t_b, t_b], axis=0)
                    v2 = self.decoder_apply(
                        params, x2, t2, sem_features=sem_both, step_idx=s_idx
                    )
                    v_cond, v_uncond = v2[:B], v2[B:]
                    v = v_uncond + cfg_scale * (v_cond - v_uncond)
                else:
                    v = self.decoder_apply(
                        params, x, t_b,
                        sem_features=sem_features, step_idx=s_idx[:B],
                    )

                x0 = jnp.clip(schedule.predict_x0_from_v(x, t_b, v), -3.0, 3.0)
                eps = schedule.predict_eps_from_v(x, t_b, v)
                ab_next = schedule.alpha_bar[t_next]
                x = jnp.sqrt(ab_next) * x0 + jnp.sqrt(1.0 - ab_next) * eps
                return (x, keys), None

            (x_curr, _), _ = jax.lax.scan(
                body, (x_curr, k_loop), (t_grid, t_next_grid)
            )
            x_curr = jnp.where(overlap_mask, known_mel, x_curr)
            return x_curr

        return refine

    def refine_chunk(
        self,
        x_coarse,
        sem_features,
        known_mel=None,
        strength: float = 0.2,
        steps: int = 10,
        cfg_scale: float = 1.0,
        rng=None,
    ):
        """Refine one chunk; jitted per (strength, steps, cfg_scale)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        have = known_mel is not None
        if known_mel is None:
            known_mel = jnp.zeros_like(x_coarse)
        else:
            pad = x_coarse.shape[1] - known_mel.shape[1]
            known_mel = jnp.pad(known_mel, ((0, 0), (0, pad), (0, 0)))
        B = x_coarse.shape[0]
        rngs = rng[None] if B == 1 else jax.random.split(rng, B)
        return self.refine_chunk_batch(
            x_coarse, sem_features, known_mel,
            jnp.asarray([have] * B), rngs,
            strength=strength, steps=steps, cfg_scale=cfg_scale,
        )

    def refine_chunk_batch(
        self,
        x_coarse,
        sem_features,
        known_mel,
        have_known,
        rngs,
        *,
        strength: float,
        steps: int,
        cfg_scale: float,
    ):
        """Batched refine over a leading stream axis: the serving scheduler's
        entry point.  ``known_mel`` must already be padded to ``x_coarse``'s
        frame count; ``have_known [B]`` gates inpainting per row; ``rngs``
        carries one PRNG key per row (a single key broadcasts over B=1).
        Rows are computed independently (see ``_build_refine``).  Under a
        mesh, row counts not divisible by ``row_quantum`` are padded with
        discarded rows."""
        key = (strength, steps, cfg_scale, "x")
        if key not in self._refine_jit:
            self._refine_jit[key] = self._build_refine(
                strength, steps, cfg_scale, from_keys=False
            )
        args, n, pad = self._pad_rows(
            x_coarse, sem_features, known_mel, have_known, rngs
        )
        out = self._refine_jit[key](self.decoder_params, *args)
        return out if pad == 0 else out[:n]

    def _pad_rows(self, x_in, sem_features, known_mel, have_known, rngs):
        """Pad every row-sharded refine argument to a multiple of
        ``row_quantum`` (padding rows repeat row 0's key material and carry
        ``have_known=False``; their output is sliced away)."""
        n = known_mel.shape[0]
        q = self.row_quantum
        pad = (q - n % q) % q
        if pad == 0:
            return (x_in, sem_features, known_mel, have_known, rngs), n, 0
        rep = lambda a: np.concatenate(  # noqa: E731
            [np.asarray(a)] + [np.asarray(a[:1])] * pad, axis=0
        )
        have = np.concatenate(
            [np.asarray(have_known), np.zeros((pad,), bool)]
        )
        return (rep(x_in), rep(sem_features), rep(known_mel), have,
                rep(rngs)), n, pad

    def refine_chunk_batch_keys(
        self,
        k_noise,
        sem_features,
        known_mel,
        have_known,
        rngs,
        *,
        strength: float,
        steps: int,
        cfg_scale: float,
    ):
        """``refine_chunk_batch`` with the coarse noise drawn on-device from
        per-row ``k_noise [B]`` keys — ONE dispatch per chunk tick, no H2D
        of the noise.  Row i equals ``refine_chunk_batch`` with
        ``x_coarse[i] = jax.random.normal(k_noise[i], (1, T, M))``.  This is
        the entry point ``ChunkStream``/``LongFormScheduler`` use; inputs
        may be host numpy (they ride the call's H2D).  Under a mesh, row
        counts not divisible by ``row_quantum`` are padded with discarded
        rows."""
        key = (strength, steps, cfg_scale, "k")
        if key not in self._refine_jit:
            self._refine_jit[key] = self._build_refine(
                strength, steps, cfg_scale, from_keys=True
            )
        args, n, pad = self._pad_rows(
            k_noise, sem_features, known_mel, have_known, rngs
        )
        out = self._refine_jit[key](self.decoder_params, *args)
        return out if pad == 0 else out[:n]

    def stream_prep(self, wav: np.ndarray, rng):
        """A long-form stream's ENTIRE device-derived prep as ONE program.

        ``wav [1, total]`` -> host numpy tuple
        ``(z_q_global [1,S,D], mean [N,1,M], std [N,1,M],
        k_noise [N,2], k_ref [N,2])`` where N is the stream's chunk count:

        - global semantic encode (pad to x320, as ``encode_global``);
        - every chunk's denormalization statistics — chunk slicing done
          in-program via a computed gather (an index CONSTANT at real
          lengths would blow the tunnel's remote-compile body limit),
          row-equal to ``normalize_mel(mel_frontend(chunk))`` per chunk up
          to last-ulp XLA fusion differences (the reference's per-chunk GT
          stats, inference_pipeline.py:354-356);
        - the per-chunk PRNG chain, bit-identical to N sequential
          ``rng, k_noise, k_ref = jax.random.split(rng, 3)`` calls.

        One dispatch + one fetch per submit instead of three of each —
        through a tunneled chip each dispatch is ~30 ms, and submit latency
        is the time-to-first-increment floor for a new stream.  Without
        ``prep_buckets`` the program re-traces per wav length (N and the
        pads are shape-derived); with buckets (see __init__) it compiles
        once per BUCKET: the wav is zero-padded to the bucket, the true
        length rides in as a traced scalar (``wav_len`` -> masked HuBERT
        forward, exact to accumulation order), and the host keeps only the
        stream's true chunk rows.
        """
        return self.stream_prep_async(wav, rng)()

    def stream_prep_async(self, wav: np.ndarray, rng):
        """Dispatch the stream_prep program WITHOUT blocking on the fetch.

        Returns a zero-arg ``realize()`` that fetches (and host-slices) the
        results — ``realize()() == stream_prep(...)`` bit for bit.  JAX
        dispatch is asynchronous, so N streams submitted concurrently queue
        their prep programs back to back on the device and overlap the
        per-dispatch tunnel round-trip (~30 ms each) instead of serializing
        submit handlers on it; the scheduler's first tick then blocks only
        on the data it actually reads (time-to-first-increment, the
        long-form product metric)."""
        if self.encoder_apply is None:
            raise ValueError("pipeline constructed without an encoder")

        total = int(np.asarray(wav).shape[1])
        if self.prep_buckets:
            pad_to = next((b for b in self.prep_buckets if b >= total), None)
            if pad_to is None:
                # Oversize wavs fall back to the per-length program instead
                # of rejecting the request; the lazy compile this triggers is
                # the cost of exceeding the configured bucket ladder.
                import warnings

                warnings.warn(
                    f"stream of {total} samples exceeds the largest prep "
                    f"bucket {self.prep_buckets[-1]}; falling back to an "
                    f"unbucketed per-length prep (lazy compile)",
                    stacklevel=2,
                )
            else:
                n_true = max(
                    1, -(-(total - self.overlap_samples) // self.hop_samples)
                )
                # The unbucketed path encodes the wav padded up to a whole
                # latent (x sem_stride); pass that length as the mask
                # boundary so both paths see the same effective input.
                st = self.sem_stride
                enc_len = total + (st - total % st) % st
                wav_b = np.zeros((1, pad_to), np.float32)
                wav_b[:, :total] = np.asarray(wav)
                out = self._prep_bucket_jit(
                    self.encoder_params, jnp.asarray(wav_b), rng,
                    jnp.int32(enc_len),
                )

                def realize(out=out, n_true=n_true):
                    z, mean, std, kns, krs = jax.device_get(out)
                    return (z, mean[:n_true], std[:n_true],
                            kns[:n_true], krs[:n_true])

                return realize

        out = self._prep_jit(self.encoder_params, jnp.asarray(wav), rng)
        return lambda out=out: jax.device_get(out)

    def _prep_impl(self, enc_params, wav, rng, wav_len=None):
        """The stream_prep program body (traced under self._prep_jit /
        self._prep_bucket_jit)."""
        total = wav.shape[1]
        n = max(
            1,
            -(-(total - self.overlap_samples) // self.hop_samples),
        )
        st = self.sem_stride
        pad320 = (st - total % st) % st
        wav_320 = jnp.pad(wav, ((0, 0), (0, pad320)))
        if wav_len is None:
            z = self.encoder_apply(enc_params, wav_320)
        else:
            z = self.encoder_apply(enc_params, wav_320, wav_len=wav_len)
        cs, hop = self.chunk_samples, self.hop_samples
        padded = jnp.pad(
            wav[0], (0, max(0, (n - 1) * hop + cs - total))
        )
        idx = (jnp.arange(n) * hop)[:, None] + jnp.arange(cs)[None, :]
        chunks = padded[idx]
        _, mean, std = normalize_mel(self.mel_frontend(chunks))

        def body(r, _):
            r, kn, kr = jax.random.split(r, 3)
            return r, (kn, kr)

        _, (kns, krs) = jax.lax.scan(body, rng, None, length=n)
        return z, mean, std, kns, krs

    # -- full pipeline -------------------------------------------------------

    def encode_global(self, wav_16k: jnp.ndarray) -> jnp.ndarray:
        """Global semantic features for the whole utterance (pad to a whole
        latent)."""
        if self.encoder_apply is None:
            raise ValueError("pipeline constructed without an encoder")
        T = wav_16k.shape[-1]
        st = self.sem_stride
        if T % st:
            wav_16k = jnp.pad(wav_16k, ((0, 0), (0, st - T % st)))
        return self.encoder_apply(self.encoder_params, wav_16k)

    def generate(
        self,
        wav: np.ndarray,
        strength: float = 0.6,
        steps: int = 50,
        cfg_scale: float = 2.0,
        rng=None,
        vocode: bool = True,
        griffin_lim_iters: int = 100,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Full utterance -> (linear mel [n_mels, T], waveform or None).

        Follows the reference main loop (inference_pipeline.py:296-403):
        per-chunk ground-truth mel stats for denormalization, triangular
        crossfade, average-pool smoothing, Griffin-Lim.  Implemented by
        draining ``generate_streaming`` — ONE chunk loop serves both modes.
        The shared overlap-add/finalization logic is checked against an
        independent oracle (model patched out) in
        tests/test_pipeline.py::test_streaming_overlap_add_oracle.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        wav = np.asarray(wav, np.float32).reshape(1, -1)
        total = wav.shape[1]

        segments = [
            seg
            for seg, _ in self.generate_streaming(
                wav, strength=strength, steps=steps, cfg_scale=cfg_scale,
                rng=rng,
            )
        ]
        final_mel = np.concatenate(segments, axis=1)

        if not vocode:
            return final_mel, None

        wav_out = self.vocode(
            final_mel, jax.random.fold_in(rng, 1), n_iter=griffin_lim_iters
        )
        return final_mel, np.asarray(wav_out)[:total]

    def generate_streaming(
        self,
        wav: np.ndarray,
        strength: float = 0.6,
        steps: int = 50,
        cfg_scale: float = 2.0,
        rng=None,
    ):
        """Generator variant of ``generate``: yields (linear_mel_increment,
        frame_offset) per chunk as soon as its crossfade region is final.

        For live serving: each yielded increment is ``hop_frames`` wide
        (the last chunk yields its full remainder), so audio can be vocoded
        and played while later chunks are still being generated.  Numerics
        match the offline path except the final weight renormalization is
        applied per increment.

        Implemented as the single-stream driver over ``ChunkStream`` — the
        serving-side ``LongFormScheduler`` drives many of these machines
        through one batched refine program instead.
        """
        stream = ChunkStream(
            self, wav, strength=strength, steps=steps, cfg_scale=cfg_scale,
            rng=rng,
        )
        while not stream.done:
            k_noise, z_chunk, known_mel, have, k_ref = stream.next_job()
            # The same dispatch-minimal surface the serving scheduler uses
            # (ONE device program per chunk) so solo and batched streams
            # run literally the same code path; B=1.
            x_ref = self.refine_chunk_batch_keys(
                k_noise[None], z_chunk, known_mel, np.asarray([have]),
                k_ref[None],
                strength=strength, steps=steps, cfg_scale=cfg_scale,
            )
            for seg, offset in stream.complete(np.asarray(x_ref)):
                yield seg, offset

    def generate_streaming_audio(
        self,
        wav: np.ndarray,
        strength: float = 0.6,
        steps: int = 50,
        cfg_scale: float = 2.0,
        rng=None,
        context_seconds: float = 0.5,
        crossfade_samples: int = 320,
        griffin_lim_iters: int = 50,
    ):
        """Streaming WAVEFORM generation: yields (wav_increment, sample_offset).

        Completes the live-serving story the reference never built (it only
        vocodes whole utterances offline, inference_pipeline.py:394-403):
        each finalized linear-mel increment from ``generate_streaming`` is
        vocoded inside a sliding window that carries ``context_seconds`` of
        already-final mel to its left, and consecutive emissions are blended
        over ``crossfade_samples`` waveform samples held back from the
        previous window.  Increment offsets are contiguous:
        ``offset[k+1] == offset[k] + len(chunk[k])``.

        Why this is NOT sample-exact vs the offline path: Griffin-Lim phase
        is the fixed point of a GLOBAL iterative projection (and depends on
        its random init), so any chunked scheme renders different phase than
        a whole-utterance pass.  Equivalence is therefore held where it is
        well-defined — in mel space: re-analysis of the streamed waveform
        tracks the generated mel as closely as the offline waveform's does
        (tests/test_pipeline.py::test_streaming_audio_mel_equivalence).

        RNG contract matches ``generate``: the stream consumes ``rng`` and
        the vocoder keys derive from ``fold_in(rng, 1)``, so the mel content
        is identical to ``generate(wav, rng=rng)``.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        wav_in = np.asarray(wav, np.float32).reshape(1, -1)
        return self.stream_audio(
            self.generate_streaming(
                wav_in, strength=strength, steps=steps, cfg_scale=cfg_scale,
                rng=rng,
            ),
            total=wav_in.shape[1],
            rng=rng,
            context_seconds=context_seconds,
            crossfade_samples=crossfade_samples,
            griffin_lim_iters=griffin_lim_iters,
        )

    def stream_audio(
        self,
        mel_iter,
        total: int,
        rng,
        context_seconds: float = 0.5,
        crossfade_samples: int = 320,
        griffin_lim_iters: int = 50,
    ):
        """Wrap a finalized-linear-mel increment iterator into waveform
        increments — the vocoder half of ``generate_streaming_audio``,
        reusable over ANY source of ``(mel_seg, frame_offset)`` increments
        (e.g. a scheduler-batched stream in serving.py).  ``total`` caps the
        emitted samples at the source waveform length; vocoder keys derive
        from ``fold_in(rng, 1)`` exactly as ``generate_streaming_audio``.
        """
        cfg = self.cfg
        hop = cfg.hop_length
        k_gl = jax.random.fold_in(rng, 1)
        ctx_frames = max(
            int(context_seconds * cfg.sample_rate) // hop,
            crossfade_samples // hop + 2,
        )

        hist = np.zeros((cfg.n_mels, 0), np.float32)
        out_pos = 0
        tail = np.zeros((0,), np.float32)  # held-back crossfade samples

        def render(F: int):
            """Vocode the window of mel history ending at frame F.

            The window start must reach back past the first NOT-yet-emitted
            sample (``out_pos``), plus ``ctx_frames`` of context for
            Griffin-Lim quality — a fixed ``F - (hop + ctx)`` lookback drops
            audio whenever an increment exceeds it (e.g. the last chunk's
            full remainder under the default 2 s / 0.5 s geometry)."""
            w0 = max(0, min(F - self.hop_frames, out_pos // hop) - ctx_frames)
            wav_win = self.vocode(
                hist[:, w0:F],
                jax.random.fold_in(k_gl, w0),
                n_iter=griffin_lim_iters,
            )
            return w0 * hop, np.asarray(wav_win)

        it = iter(mel_iter)
        cur = next(it, None)
        while cur is not None:
            nxt = next(it, None)
            is_last = nxt is None
            seg, _ = cur
            hist = np.concatenate([hist, seg.astype(np.float32)], axis=1)
            base, wav_win = render(hist.shape[1])
            avail_end = base + wav_win.shape[0]
            target_end = (
                min(total, avail_end) if is_last
                else avail_end - crossfade_samples
            )
            if target_end > out_pos:
                chunk = wav_win[out_pos - base : target_end - base].copy()
                n = min(tail.shape[0], chunk.shape[0])
                if n > 0:
                    ramp = np.linspace(0.0, 1.0, n, dtype=np.float32)
                    chunk[:n] = tail[:n] * (1.0 - ramp) + chunk[:n] * ramp
                yield chunk, out_pos
                tail = wav_win[
                    target_end - base
                    : min(target_end + crossfade_samples, avail_end) - base
                ].copy()
                out_pos = target_end
            cur = nxt

    def vocode(
        self, linear_mel: np.ndarray, rng, n_iter: int = 100
    ) -> np.ndarray:
        """Linear mel [n_mels, T] -> waveform via smooth + invmel + Griffin-Lim.

        The whole chain is ONE jitted program (the nested griffin_lim jit
        inlines): the streaming-audio path calls this per increment, and
        its ~6 eager ops would otherwise each pay a tunneled dispatch.
        Re-specializes per window width; streaming render windows settle to
        a steady width after the first increments.
        """
        if not hasattr(self, "_vocode_jit"):
            from functools import partial as _partial

            @_partial(jax.jit, static_argnames=("n_iter",))
            def run(mel, rng, n_iter):
                # 5x3 average-pool smoothing, stride 1, same padding
                # (reference: inference_pipeline.py:380-392).
                kh, kw = 5, 3
                dims, strides = (1, kh, kw), (1, 1, 1)
                pad = ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2))
                smoothed = jax.lax.reduce_window(
                    mel, 0.0, jax.lax.add, dims, strides, pad
                )
                counts = jax.lax.reduce_window(
                    jnp.ones_like(mel), 0.0, jax.lax.add, dims, strides, pad
                )
                smoothed = smoothed / counts
                mel_btm = jnp.transpose(smoothed, (0, 2, 1))  # [1, T, M]
                spec = inverse_mel_scale(mel_btm, self.mel_frontend.fbank)
                return griffin_lim(
                    spec,
                    rng,
                    n_fft=self.cfg.n_fft,
                    hop_length=self.cfg.hop_length,
                    win_length=self.cfg.win_length,
                    n_iter=n_iter,
                )

            self._vocode_jit = run
        wav = self._vocode_jit(
            jnp.asarray(linear_mel)[None], rng, n_iter=n_iter
        )
        return np.asarray(wav[0])


class ChunkStream:
    """Host-side state machine for ONE long-form stream.

    Splits ``generate_streaming``'s chunk loop into a prepare/complete pair
    so a scheduler can interleave many streams through the pipeline's
    batched refine program (continuous batching, serving.py::
    LongFormScheduler):

    - ``next_job()`` -> ``(k_noise [2], z_chunk [1,S,D] np,
      known_mel [1,T,M] np, have_known, k_ref [2])``: the inputs for the
      stream's next chunk, for ``refine_chunk_batch_keys``.  All randomness
      derives from this stream's own PRNG chain, so the refined chunk is
      independent of any batch it rides in.
    - ``complete(x_ref [1,T,M] np)`` folds the refined chunk into the
      crossfade accumulator and returns the newly finalized
      ``(linear_mel_segment, frame_offset)`` increments (possibly none).

    Dispatch economics (the TPU re-design): construction runs ONE device
    program total (``LongFormPipeline.stream_prep``: global semantic
    encode + all chunks' denorm stats + the whole per-chunk PRNG chain)
    and fetches its results to host, so ``next_job``/``complete`` are pure
    numpy and the only device program per chunk is the (batched) refine
    itself.  Through a tunneled chip every dispatch costs ~30 ms; the
    naive per-chunk prep (noise draw, pads, per-chunk mel stats, denorm)
    was ~10 dispatches per stream per tick and dominated the batched
    refine it fed (1065 -> 46 ms/tick measured, SERVE_LF_r03.json).

    The chunk geometry, crossfade windows, per-chunk mel statistics, and
    boundary-weight handling are exactly ``generate_streaming``'s (reference
    inference_pipeline.py:296-374 semantics).
    """

    def __init__(
        self,
        pipe: LongFormPipeline,
        wav: np.ndarray,
        strength: float = 0.6,
        steps: int = 50,
        cfg_scale: float = 2.0,
        rng=None,
    ):
        cfg = pipe.cfg
        self.pipe = pipe
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.wav = np.asarray(wav, np.float32).reshape(1, -1)
        self.total = self.wav.shape[1]
        self.total_frames = self.total // cfg.hop_length + 1
        self.num_chunks = max(
            1,
            int(np.ceil((self.total - pipe.overlap_samples) / pipe.hop_samples)),
        )
        est_frames = self.total_frames + pipe.chunk_frames
        self.acc = np.zeros((cfg.n_mels, est_frames), np.float32)
        self.wsum = np.zeros((1, est_frames), np.float32)

        fade = pipe.overlap_frames
        self.window = np.ones((1, pipe.chunk_frames), np.float32)
        self.window[0, :fade] = np.linspace(0, 1, fade)
        self.window[0, -fade:] = np.linspace(1, 0, fade)
        self.sem_per_chunk = pipe.chunk_samples // pipe.sem_stride
        self.prev_tail = None
        self.emitted = 0
        self.i = 0

        # The stream's ENTIRE device-prep as ONE program (LongFormPipeline
        # .stream_prep; see class docstring), dispatched asynchronously so
        # concurrent submits overlap their tunnel round-trips; the fetch
        # happens lazily at the first next_job().  Everything after that is
        # numpy plus one refine program per chunk.
        self._prep = pipe.stream_prep_async(self.wav, rng)

    def _ensure_prep(self):
        if self._prep is not None:
            (self.z_q_global, self._mean, self._std,
             self._k_noise, self._k_ref) = self._prep()
            self._prep = None
            # Loud guard: if the encoder's actual latent rate disagrees
            # with pipe.sem_stride, every chunk would silently slice the
            # wrong features (HubertConfig.tiny emits at stride 20, not
            # 320).  The encode input is the wav padded up to a whole
            # latent (bucketed prep: up to the bucket), so the true count
            # is within one frame of padded_len/sem_stride.
            n_lat = self.z_q_global.shape[1]
            st = self.pipe.sem_stride
            buckets = self.pipe.prep_buckets
            padded = next((b for b in buckets if b >= self.total), self.total) \
                if buckets else self.total
            expect = (padded + st - 1) // st
            if not (0.5 * expect <= n_lat <= 2.0 * expect):
                raise ValueError(
                    f"encoder produced {n_lat} latents for {padded} samples "
                    f"but pipe.sem_stride={st} expects ~{expect}: construct "
                    f"LongFormPipeline with sem_stride="
                    f"hubert_cfg.total_stride"
                )

    @property
    def done(self) -> bool:
        return self.i >= self.num_chunks

    def next_job(self):
        """Prepare chunk ``i``'s refine inputs (does not advance ``i``).

        Pure host numpy — the returned arrays ride the refine call's H2D."""
        assert not self.done, "stream exhausted"
        self._ensure_prep()
        pipe, cfg = self.pipe, self.pipe.cfg
        k_noise, k_ref = self._k_noise[self.i], self._k_ref[self.i]
        s0 = self.i * pipe.hop_samples
        lat0 = s0 // pipe.sem_stride
        z_chunk = self.z_q_global[:, lat0 : lat0 + self.sem_per_chunk, :]
        if z_chunk.shape[1] < self.sem_per_chunk:
            z_chunk = np.pad(
                z_chunk,
                ((0, 0), (0, self.sem_per_chunk - z_chunk.shape[1]), (0, 0)),
            )
        have = self.prev_tail is not None
        if have:
            pad = pipe.chunk_frames - self.prev_tail.shape[1]
            known_mel = np.pad(self.prev_tail, ((0, 0), (0, pad), (0, 0)))
        else:
            known_mel = np.zeros(
                (1, pipe.chunk_frames, cfg.n_mels), np.float32
            )
        return k_noise, z_chunk, known_mel, have, k_ref

    def complete(self, x_ref: np.ndarray):
        """Fold the refined chunk in; return newly finalized increments.

        ``x_ref`` must be host numpy (the caller's single D2H per tick)."""
        self._ensure_prep()
        pipe = self.pipe
        i, num_chunks = self.i, self.num_chunks
        x_ref = np.asarray(x_ref)
        self.prev_tail = x_ref[:, -pipe.overlap_frames :, :]

        lin = np.exp(
            x_ref * self._std[i : i + 1] + self._mean[i : i + 1]
        ).astype(np.float32)[0].T

        # Boundary chunks keep full weight at the sequence edges: the
        # fade-in/out only makes sense against a neighboring chunk, and
        # a weight-0 edge frame would otherwise be emitted as silence
        # (acc=0/clip(wsum=0) = 0 — a click at stream start/end).
        fade = pipe.overlap_frames
        win = self.window
        if i == 0 or i == num_chunks - 1:
            win = self.window.copy()
            if i == 0:
                win[0, :fade] = 1.0
            if i == num_chunks - 1:
                win[0, -fade:] = 1.0
        f0 = i * pipe.hop_frames
        self.acc[:, f0 : f0 + pipe.chunk_frames] += lin * win
        self.wsum[:, f0 : f0 + pipe.chunk_frames] += win
        self.i += 1

        # Frames before the NEXT chunk's fade-in are final now.
        final_upto = (
            self.total_frames if i == num_chunks - 1 else f0 + pipe.hop_frames
        )
        final_upto = min(final_upto, self.total_frames)
        out = []
        if final_upto > self.emitted:
            seg = self.acc[:, self.emitted : final_upto] / np.clip(
                self.wsum[:, self.emitted : final_upto], 1e-5, None
            )
            out.append((seg, self.emitted))
            self.emitted = final_upto
        return out
