"""Jitted training and validation steps for all three phases.

Each step is a pure function ``(state, batch, rng) -> (state, metrics)``
compiled once per shape signature, with the state donated (buffers reused
in place by XLA).  The mel frontend runs *inside* the step on device.

Reference behavior:
  - diffusion step: train_v2.py:97-163 (v-prediction, CFG dropout, vq loss)
    and train.py:148-170 (epsilon objective variant);
  - progressive distillation: training/consistency.py:52-89;
  - consistency: training/consistency.py:92-122;
  - validation: train_v2.py:166-206 (4-step DPM-Solver++ cosine similarity)
    and utils/visualization.py:18-44 (epsilon-MSE eval).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CFG
from ..ops.mel import MelFrontend
from ..schedule import DiffusionSchedule, DPMSolverPP, _bcast, ddim_sample
from ..utils.audio import normalize_mel
from .state import TrainState, ema_update


def _mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a - b))


def _cosine_sim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean per-sample cosine similarity over flattened [B, -1]."""
    a = a.reshape(a.shape[0], -1)
    b = b.reshape(b.shape[0], -1)
    num = jnp.sum(a * b, axis=1)
    den = jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1) + 1e-8
    return jnp.mean(num / den)


class Trainer:
    """Factory for jitted phase steps around (encoder, decoder, schedule, tx).

    Static configuration (modules, optimizer, mel frontend) lives here; all
    dynamic state is in the TrainState pytree.
    """

    def __init__(self, cfg: CFG, encoder, decoder, schedule: DiffusionSchedule, tx):
        self.cfg = cfg
        self.encoder = encoder
        self.decoder = decoder
        self.schedule = schedule
        self.tx = tx
        self.mel_frontend = MelFrontend(
            sample_rate=cfg.sample_rate,
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            n_mels=cfg.n_mels,
            f_min=cfg.f_min,
            f_max=cfg.f_max,
        )

    # -- shared pieces ------------------------------------------------------

    def _encode(
        self,
        params: Any,
        vq_state: Any,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        train: bool,
    ):
        """Run the semantic encoder (wav or precomputed-features path)."""
        variables = {"params": params["encoder"]}
        if vq_state:
            variables["vq_state"] = vq_state["encoder"]
        rngs = {"dropout": jax.random.fold_in(rng, 0), "vq": jax.random.fold_in(rng, 1)}
        kwargs = dict(train=train, deterministic=not train)
        if "hubert_features" in batch:
            outs, mutated = self.encoder.apply(
                variables,
                batch["hubert_features"],
                method=self.encoder.from_features,
                mutable=["vq_state"],
                rngs=rngs,
                **kwargs,
            )
        else:
            outs, mutated = self.encoder.apply(
                variables, batch["wav"], mutable=["vq_state"], rngs=rngs, **kwargs
            )
        new_vq_state = (
            {"encoder": mutated["vq_state"]} if "vq_state" in mutated else vq_state
        )
        return outs, new_vq_state

    def _decode(
        self,
        params: Any,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        **cond,
    ) -> jnp.ndarray:
        rngs = {"dropout": rng} if rng is not None else None
        return self.decoder.apply(
            {"params": params}, x_t, t, deterministic=deterministic, rngs=rngs, **cond
        )

    def _mel_normalized(self, wav: jnp.ndarray) -> jnp.ndarray:
        mel = self.mel_frontend(wav)
        mel_n, _, _ = normalize_mel(mel)
        return mel_n

    def _context_pair(self, params, sem_idx, sem_features):
        """(token context, features context) — see decoder.align_contexts.
        PPTrainer overrides this to unwrap its packed parameter layout."""
        return self.decoder.apply(
            {"params": params}, sem_idx, sem_features,
            method=self.decoder.align_contexts,
        )

    def _teacher_decay(self, opt_state, base: float):
        """Effective EMA decay for this data step.

        Under gradient accumulation the optimizer only applies an update
        every k-th step; the reference EMAs the teacher after every OPTIMIZER
        step (train.py:240-249), so on the k-1 accumulation-only steps the
        teacher must not move (decay 1.0).  ``opt_state`` is the MultiSteps
        state AFTER tx.update: mini_step wraps to 0 exactly when an update
        was applied."""
        if self.cfg.grad_accumulation > 1:
            return jnp.where(opt_state.mini_step == 0, base, 1.0)
        return base

    # -- phase 1: diffusion -------------------------------------------------

    def make_diffusion_loss(self, vq_weight: Optional[float] = None) -> Callable:
        """The phase-1 loss closure ``(params, vq_state, batch, rng) ->
        (loss, (new_vq_state, metrics))`` — reused by the single-device jitted
        step and by the shard_map data-parallel step (parallel/data_parallel.py)."""
        cfg = self.cfg
        schedule = self.schedule
        vq_weight = vq_weight if vq_weight is not None else cfg.vq_commit

        def loss_fn(params, vq_state, batch, rng):
            k_enc, k_cfgdrop, k_t, k_noise, k_dec = jax.random.split(rng, 5)
            mel_n = self._mel_normalized(batch["wav"])
            B = mel_n.shape[0]

            (z_q, sem_idx, vq_loss, ppl, used), new_vq_state = self._encode(
                params, vq_state, batch, k_enc, train=True
            )

            # Token-embedding alignment: the diffusion objective conditions
            # through sem_features (STE gradient into the encoder, v2 recipe)
            # so token_emb — the path inference/serving actually uses
            # (inference.py generate_mel) — would otherwise receive no
            # gradient until phase 2.  Pull token_emb(sem_idx) toward the
            # (stopped) trained features context so a phase-1-only (train_v2)
            # checkpoint serves through tokens correctly.
            align_loss = jnp.asarray(0.0, jnp.float32)
            if cfg.token_align_weight > 0:
                ctx_tok, ctx_feat = self._context_pair(
                    params["decoder"], sem_idx, jax.lax.stop_gradient(z_q)
                )
                align_loss = _mse(ctx_tok, jax.lax.stop_gradient(ctx_feat))

            # Classifier-free-guidance conditioning dropout, per sample
            # (the reference drops per batch, train_v2.py:118-119; per-sample
            # is the standard CFG recipe and strictly lower-variance).
            drop = jax.random.bernoulli(k_cfgdrop, cfg.cfg_dropout, (B, 1, 1))
            z_q = jnp.where(drop, 0.0, z_q)

            # Deterministic replay: a batch may carry explicit "t"/"noise"
            # draws so the objective can be evaluated on EXACTLY the same
            # randomness as the torch reference (tests/test_parity_training.py).
            t = (
                batch["t"]
                if "t" in batch
                else jax.random.randint(k_t, (B,), 1, cfg.max_timestep)
            )
            noise = (
                batch["noise"]
                if "noise" in batch
                else jax.random.normal(k_noise, mel_n.shape, mel_n.dtype)
            )
            x_t, _ = schedule.q_sample(mel_n, t, noise)
            step_idx = jnp.zeros((B,), jnp.int32)

            pred = self._decode(
                params["decoder"],
                x_t,
                t,
                rng=k_dec,
                deterministic=False,
                sem_features=z_q,
                step_idx=step_idx,
            )
            if cfg.use_v_prediction:
                target = schedule.get_v_target(mel_n, noise, t)
                x0_pred = schedule.predict_x0_from_v(x_t, t, pred)
            else:
                target = noise
                x0_pred = schedule.predict_x0_from_eps(x_t, t, pred)
            diff_loss = _mse(pred, target)
            loss = (
                diff_loss
                + vq_weight * vq_loss
                + cfg.token_align_weight * align_loss
            )

            x0_pred = jax.lax.stop_gradient(x0_pred)
            metrics = {
                "loss": loss,
                "diff_loss": diff_loss,
                "vq_loss": vq_loss,
                "align_loss": align_loss,
                "perplexity": ppl,
                "used_codes": used,
                "x0_mse": _mse(x0_pred, mel_n),
                "x0_cos": _cosine_sim(x0_pred, mel_n),
            }
            return loss, (new_vq_state, metrics)

        return loss_fn

    def make_diffusion_step(self, vq_weight: Optional[float] = None) -> Callable:
        """v-prediction (or epsilon) denoising-objective step with CFG dropout."""
        loss_fn = self.make_diffusion_loss(vq_weight)

        @functools.partial(jax.jit, donate_argnums=0)
        def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
            grads, (new_vq_state, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.vq_state, batch, rng
            )
            updates, new_opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree.map(
                lambda p, u: p + u.astype(p.dtype),
                state.params,
                updates,
            )
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                vq_state=new_vq_state,
                opt_state=new_opt_state,
            )
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        return step

    # -- phase 2: progressive distillation -----------------------------------

    def make_progressive_loss(
        self, num_steps: int, vq_weight: float = 0.05
    ) -> Callable:
        """Phase-2 loss closure ``(params, teacher, vq_state, batch, rng) ->
        (loss, (new_vq_state, metrics))`` — reused by the jitted step and the
        data-parallel step."""
        cfg = self.cfg
        schedule = self.schedule
        stride = cfg.diff_steps // num_steps

        def loss_fn(params, teacher, vq_state, batch, rng):
            k_enc, k_i, k_noise, k_dec = jax.random.split(rng, 4)
            mel_n = self._mel_normalized(batch["wav"])
            B = mel_n.shape[0]

            (_, sem_idx, vq_loss, ppl, used), new_vq_state = self._encode(
                params, vq_state, batch, k_enc, train=True
            )

            # Deterministic replay (see make_diffusion_loss).
            step_indices = (
                batch["step_indices"]
                if "step_indices" in batch
                else jax.random.randint(k_i, (B,), 0, num_steps)
            )
            t = (step_indices + 1) * stride - 1
            noise = (
                batch["noise"]
                if "noise" in batch
                else jax.random.normal(k_noise, mel_n.shape, mel_n.dtype)
            )
            x_t, _ = schedule.q_sample(mel_n, t, noise)

            v_student = self._decode(
                params["decoder"],
                x_t,
                t,
                rng=k_dec,
                deterministic=False,
                sem_idx=sem_idx,
                step_idx=step_indices,
            )
            x0_student = schedule.predict_x0_from_v(x_t, t, v_student)

            if teacher is not None and num_steps < cfg.diff_steps:
                v_teacher = self._decode(
                    teacher, x_t, t, sem_idx=sem_idx, step_idx=step_indices
                )
                x0_teacher = jax.lax.stop_gradient(
                    schedule.predict_x0_from_v(x_t, t, v_teacher)
                )
                loss = _mse(x0_student, x0_teacher)
            else:
                v_target = schedule.get_v_target(mel_n, noise, t)
                loss = _mse(v_student, v_target)

            loss = loss + vq_weight * vq_loss
            metrics = {
                "loss": loss,
                "vq_loss": vq_loss,
                "perplexity": ppl,
                "used_codes": used,
                "x0_mse": _mse(jax.lax.stop_gradient(x0_student), mel_n),
            }
            return loss, (new_vq_state, metrics)

        return loss_fn

    def make_pd_two_step_loss(
        self, num_steps: int, vq_weight: float = 0.05
    ) -> Callable:
        """TRUE progressive distillation (Salimans & Ho 2022): the teacher
        takes TWO DDIM steps t -> t_mid -> t_next; the student learns the x0
        that reaches the teacher's endpoint in ONE step.

        This fixes the reference's degenerate objective (consistency.py:60-89
        compares student and teacher at the SAME t, which is exactly zero at
        teacher re-init and is never driven apart by anything but weight
        decay).  Enabled via cfg/train(progressive_exact=True); the default
        keeps reference semantics for parity.
        """
        cfg = self.cfg
        schedule = self.schedule
        stride = cfg.diff_steps // num_steps
        half = max(stride // 2, 1)

        def loss_fn(params, teacher, vq_state, batch, rng):
            k_enc, k_i, k_noise, k_dec = jax.random.split(rng, 4)
            mel_n = self._mel_normalized(batch["wav"])
            B = mel_n.shape[0]

            (_, sem_idx, vq_loss, ppl, used), new_vq_state = self._encode(
                params, vq_state, batch, k_enc, train=True
            )

            step_indices = jax.random.randint(k_i, (B,), 0, num_steps)
            t = (step_indices + 1) * stride - 1
            t_mid = jnp.maximum(t - half, 0)
            t_next = jnp.maximum(t - stride, 0)
            noise = jax.random.normal(k_noise, mel_n.shape, mel_n.dtype)
            x_t, _ = schedule.q_sample(mel_n, t, noise)

            def teacher_ddim(x, t_a, t_b):
                v = self._decode(
                    teacher, x, t_a, sem_idx=sem_idx, step_idx=step_indices
                )
                eps = schedule.predict_eps_from_v(x, t_a, v)
                x_b, _ = schedule.get_ddim_step(x, t_a, t_b, eps, eta=0.0)
                return x_b

            x_mid = teacher_ddim(x_t, t, t_mid)
            x_tgt = jax.lax.stop_gradient(teacher_ddim(x_mid, t_mid, t_next))

            # Solve for the x0 whose single DDIM step t -> t_next lands on
            # x_tgt:  x_tgt = sab_n x0 + s1m_n (x_t - sab_t x0) / s1m_t.
            sab_t = _bcast(schedule.sqrt_alpha_bar, t)
            s1m_t = _bcast(schedule.sqrt_one_minus_alpha_bar, t)
            sab_n = _bcast(schedule.sqrt_alpha_bar, t_next)
            s1m_n = _bcast(schedule.sqrt_one_minus_alpha_bar, t_next)
            denom = sab_n - s1m_n * sab_t / s1m_t
            x0_target = (x_tgt - (s1m_n / s1m_t) * x_t) / jnp.where(
                jnp.abs(denom) < 1e-6, 1e-6, denom
            )
            x0_target = jnp.clip(x0_target, -3.0, 3.0)

            v_student = self._decode(
                params["decoder"], x_t, t, rng=k_dec, deterministic=False,
                sem_idx=sem_idx, step_idx=step_indices,
            )
            x0_student = schedule.predict_x0_from_v(x_t, t, v_student)
            loss = _mse(x0_student, x0_target) + vq_weight * vq_loss

            metrics = {
                "loss": loss,
                "vq_loss": vq_loss,
                "perplexity": ppl,
                "used_codes": used,
                "x0_mse": _mse(jax.lax.stop_gradient(x0_student), mel_n),
            }
            return loss, (new_vq_state, metrics)

        return loss_fn

    def make_progressive_step(
        self,
        num_steps: int,
        vq_weight: float = 0.05,
        ema_decay: float = 0.999,
        exact: bool = False,
    ) -> Callable:
        """Student x0 matches EMA-teacher x0 at the reduced step grid.

        Reference: consistency.py:52-89 + train.py:240-249 (teacher EMA after
        every optimizer step; vq loss weight 0.05; token-index conditioning).
        ``exact=True`` uses the two-step-teacher objective instead
        (make_pd_two_step_loss).
        """
        loss_fn = (
            self.make_pd_two_step_loss(num_steps, vq_weight)
            if exact
            else self.make_progressive_loss(num_steps, vq_weight)
        )

        @functools.partial(jax.jit, donate_argnums=0)
        def step(state: TrainState, batch, rng):
            grads, (new_vq_state, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.teacher, state.vq_state, batch, rng
            )
            updates, new_opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree.map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates
            )
            new_teacher = (
                ema_update(
                    state.teacher, new_params["decoder"],
                    self._teacher_decay(new_opt_state, ema_decay),
                )
                if state.teacher is not None
                else None
            )
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    vq_state=new_vq_state,
                    opt_state=new_opt_state,
                    teacher=new_teacher,
                ),
                metrics,
            )

        return step

    # -- phase 3: consistency ------------------------------------------------

    def make_consistency_loss(
        self, vq_weight: float = 0.05, consistency_weight: float = 1.0
    ) -> Callable:
        """Phase-3 loss closure ``(params, vq_state, batch, rng) ->
        (loss, (new_vq_state, metrics))``.  ``consistency_weight`` scales the
        consistency term relative to the reconstruction anchor
        (cfg.consistency_weight; the reference uses an implicit 1.0)."""
        cfg = self.cfg
        schedule = self.schedule

        def loss_fn(params, vq_state, batch, rng):
            k_enc, k_t1, k_t2, k_noise, k_dec1, k_dec2 = jax.random.split(rng, 6)
            mel_n = self._mel_normalized(batch["wav"])
            B = mel_n.shape[0]

            (_, sem_idx, vq_loss, ppl, used), new_vq_state = self._encode(
                params, vq_state, batch, k_enc, train=True
            )

            # Deterministic replay (see make_diffusion_loss).
            t1 = (
                batch["t1"]
                if "t1" in batch
                else jax.random.randint(k_t1, (B,), 1, cfg.diff_steps)
            )
            t2 = (
                batch["t2"]
                if "t2" in batch
                else jax.random.randint(k_t2, (B,), 1, cfg.diff_steps)
            )
            noise = (
                batch["noise"]
                if "noise" in batch
                else jax.random.normal(k_noise, mel_n.shape, mel_n.dtype)
            )
            x_t1, _ = schedule.q_sample(mel_n, t1, noise)
            x_t2, _ = schedule.q_sample(mel_n, t2, noise)
            step_idx = jnp.zeros((B,), jnp.int32)

            v1 = self._decode(
                params["decoder"], x_t1, t1, rng=k_dec1, deterministic=False,
                sem_idx=sem_idx, step_idx=step_idx,
            )
            v2 = self._decode(
                params["decoder"], x_t2, t2, rng=k_dec2, deterministic=False,
                sem_idx=sem_idx, step_idx=step_idx,
            )
            x0_1 = schedule.predict_x0_from_v(x_t1, t1, v1)
            x0_2 = schedule.predict_x0_from_v(x_t2, t2, v2)

            consistency = _mse(x0_1, jax.lax.stop_gradient(x0_2))
            recon = 0.5 * (_mse(x0_1, mel_n) + _mse(x0_2, mel_n))
            loss = consistency_weight * consistency + recon + vq_weight * vq_loss

            metrics = {
                "loss": loss,
                "consistency_loss": consistency,
                "recon_loss": recon,
                "vq_loss": vq_loss,
                "perplexity": ppl,
                "used_codes": used,
                "x0_mse": _mse(jax.lax.stop_gradient(x0_1), mel_n),
            }
            return loss, (new_vq_state, metrics)

        return loss_fn

    def make_consistency_exact_loss(
        self,
        vq_weight: float = 0.05,
        grid_size: int = 40,
        consistency_weight: float = 1.0,
    ) -> Callable:
        """Consistency training a la Song et al. 2023: ADJACENT timesteps on
        a discretized grid, same noise, EMA-teacher target at the lower t.

        The reference instead compares the student at two INDEPENDENT random
        timesteps and anchors with reconstruction (consistency.py:92-122);
        this variant is the published objective.  Takes (params, teacher,
        vq_state, batch, rng) — teacher required (state.with_teacher()).
        """
        cfg = self.cfg
        schedule = self.schedule
        grid = np.linspace(1, cfg.diff_steps - 1, grid_size).astype(np.int64)
        t_lo_tbl = jnp.asarray(grid[:-1], jnp.int32)
        t_hi_tbl = jnp.asarray(grid[1:], jnp.int32)

        def loss_fn(params, teacher, vq_state, batch, rng):
            k_enc, k_n, k_noise, k_dec = jax.random.split(rng, 4)
            mel_n = self._mel_normalized(batch["wav"])
            B = mel_n.shape[0]

            (_, sem_idx, vq_loss, ppl, used), new_vq_state = self._encode(
                params, vq_state, batch, k_enc, train=True
            )

            n = jax.random.randint(k_n, (B,), 0, grid_size - 1)
            t_lo = jnp.take(t_lo_tbl, n)
            t_hi = jnp.take(t_hi_tbl, n)
            noise = jax.random.normal(k_noise, mel_n.shape, mel_n.dtype)
            x_hi, _ = schedule.q_sample(mel_n, t_hi, noise)
            x_lo, _ = schedule.q_sample(mel_n, t_lo, noise)
            step_idx = jnp.zeros((B,), jnp.int32)

            v_s = self._decode(
                params["decoder"], x_hi, t_hi, rng=k_dec, deterministic=False,
                sem_idx=sem_idx, step_idx=step_idx,
            )
            x0_s = schedule.predict_x0_from_v(x_hi, t_hi, v_s)

            v_t = self._decode(
                teacher, x_lo, t_lo, sem_idx=sem_idx, step_idx=step_idx
            )
            x0_t = jax.lax.stop_gradient(
                jnp.clip(schedule.predict_x0_from_v(x_lo, t_lo, v_t), -3.0, 3.0)
            )

            consistency = _mse(x0_s, x0_t)
            loss = consistency_weight * consistency + vq_weight * vq_loss
            metrics = {
                "loss": loss,
                "consistency_loss": consistency,
                "vq_loss": vq_loss,
                "perplexity": ppl,
                "used_codes": used,
                "x0_mse": _mse(jax.lax.stop_gradient(x0_s), mel_n),
            }
            return loss, (new_vq_state, metrics)

        return loss_fn

    def make_consistency_step(
        self,
        vq_weight: float = 0.05,
        exact: bool = False,
        ema_decay: float = 0.999,
        consistency_weight: float = 1.0,
    ) -> Callable:
        """Same-noise two-timestep consistency + 0.5 * reconstruction.

        Reference: consistency.py:92-122 (x0(t1) matches sg(x0(t2)), both from
        the student; plus mean of both reconstruction MSEs, halved).
        ``exact=True`` uses adjacent-timestep EMA-teacher consistency
        (make_consistency_exact_loss) with the teacher EMA-updated per step.
        """
        if exact:
            loss_fn = self.make_consistency_exact_loss(
                vq_weight, consistency_weight=consistency_weight
            )

            @functools.partial(jax.jit, donate_argnums=0)
            def exact_step(state: TrainState, batch, rng):
                grads, (new_vq_state, metrics) = jax.grad(loss_fn, has_aux=True)(
                    state.params, state.teacher, state.vq_state, batch, rng
                )
                updates, new_opt_state = self.tx.update(
                    grads, state.opt_state, state.params
                )
                new_params = jax.tree.map(
                    lambda p, u: p + u.astype(p.dtype), state.params, updates
                )
                new_teacher = ema_update(
                    state.teacher, new_params["decoder"],
                    self._teacher_decay(new_opt_state, ema_decay),
                )
                return (
                    state.replace(
                        step=state.step + 1,
                        params=new_params,
                        vq_state=new_vq_state,
                        opt_state=new_opt_state,
                        teacher=new_teacher,
                    ),
                    metrics,
                )

            return exact_step

        loss_fn = self.make_consistency_loss(
            vq_weight, consistency_weight=consistency_weight
        )

        @functools.partial(jax.jit, donate_argnums=0)
        def step(state: TrainState, batch, rng):
            grads, (new_vq_state, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.vq_state, batch, rng
            )
            updates, new_opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree.map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates
            )
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    vq_state=new_vq_state,
                    opt_state=new_opt_state,
                ),
                metrics,
            )

        return step

    # -- chained multi-step dispatch ------------------------------------------

    def make_chained_step(
        self,
        kind: str = "diffusion",
        num_steps: Optional[int] = None,
        vq_weight: Optional[float] = None,
        ema_decay: float = 0.999,
        exact: bool = False,
        consistency_weight: float = 1.0,
    ) -> Callable:
        """K optimizer steps per device dispatch, as ONE jitted program.

        Through the tunnel every dispatch costs ~30 ms regardless of program
        size, so the one-dispatch-per-step driver realizes ~3% of the benched
        step rate (TRAIN_r03: 38 utt/s wall vs 1,283 utt/s device).  This is
        the trainer-side ChunkStream lesson: `lax.scan` over K steps with
        ON-DEVICE corpus row gathering, one launch, one D2H metrics fetch.

        Returned signature::

            (state, corpus, idx, rng) -> (state, stacked_metrics)

        - ``corpus``: dict of [N, ...] arrays resident in HBM (e.g.
          {"wav": [N, segment_len]}); leaves are gathered rows per step.
          Passed as an ARGUMENT, not a capture (big captures become HLO
          constants and blow the tunnel's compile-body limit).
        - ``idx``: [K, B] int32 row indices (K = chain length is read from
          the shape; one compile per distinct K).
        - ``stacked_metrics``: the per-step metric tree with a leading [K]
          axis — fetch once per dispatch.

        ``kind`` selects the phase objective ("diffusion" / "progressive" /
        "consistency") with the same knobs as the single-step factories.  A
        teacher left in the state by an earlier phase rides through the carry
        untouched unless this phase's objective EMA-updates it (progressive,
        exact consistency).
        """
        if kind == "diffusion":
            loss_fn = self.make_diffusion_loss(vq_weight)
            takes_teacher, ema = False, False
        elif kind == "progressive":
            if num_steps is None:
                raise ValueError("progressive chaining needs num_steps")
            w = vq_weight if vq_weight is not None else 0.05
            loss_fn = (
                self.make_pd_two_step_loss(num_steps, w)
                if exact
                else self.make_progressive_loss(num_steps, w)
            )
            takes_teacher, ema = True, True
        elif kind == "consistency":
            w = vq_weight if vq_weight is not None else 0.05
            if exact:
                loss_fn = self.make_consistency_exact_loss(
                    w, consistency_weight=consistency_weight
                )
                takes_teacher, ema = True, True
            else:
                loss_fn = self.make_consistency_loss(
                    w, consistency_weight=consistency_weight
                )
                takes_teacher, ema = False, False
        else:
            raise ValueError(f"unknown chained kind {kind!r}")

        @functools.partial(jax.jit, donate_argnums=0)
        def chained(state: TrainState, corpus, idx, rng):
            rngs = jax.random.split(rng, idx.shape[0])

            def body(st, xs):
                row_idx, sub = xs
                batch = jax.tree.map(
                    lambda a: jnp.take(a, row_idx, axis=0), corpus
                )
                if takes_teacher:
                    grads, (new_vq, metrics) = jax.grad(
                        loss_fn, has_aux=True
                    )(st.params, st.teacher, st.vq_state, batch, sub)
                else:
                    grads, (new_vq, metrics) = jax.grad(
                        loss_fn, has_aux=True
                    )(st.params, st.vq_state, batch, sub)
                updates, new_opt = self.tx.update(
                    grads, st.opt_state, st.params
                )
                new_params = jax.tree.map(
                    lambda p, u: p + u.astype(p.dtype), st.params, updates
                )
                new_teacher = st.teacher
                if ema and st.teacher is not None:
                    new_teacher = ema_update(
                        st.teacher, new_params["decoder"],
                        self._teacher_decay(new_opt, ema_decay),
                    )
                metrics["grad_norm"] = optax.global_norm(grads)
                return (
                    st.replace(
                        step=st.step + 1,
                        params=new_params,
                        vq_state=new_vq,
                        opt_state=new_opt,
                        teacher=new_teacher,
                    ),
                    metrics,
                )

            return jax.lax.scan(body, state, (idx, rngs))

        return chained

    # -- validation ----------------------------------------------------------

    def make_validate_fn(
        self, num_steps: int = 4, order: int = 2,
        conditioning: str = "features",
    ) -> Callable:
        """4-step DPM-Solver++ generation scored by cosine similarity to GT.

        Reference: train_v2.py:166-206.  Returns a jitted
        ``(params, vq_state, batch, rng) -> metrics`` function.

        ``conditioning`` selects the decoder context path to score:
        "features" (sem_features/sem_proj — the v2 recipe's training and
        serving path) or "tokens" (sem_idx/token_emb — the v1 inference
        path, which the distillation phases train).  The driver validates
        each phase through the path that phase trains.
        """
        cfg = self.cfg
        solver = DPMSolverPP(self.schedule, order=order)
        if conditioning not in ("features", "tokens"):
            raise ValueError(f"unknown conditioning {conditioning!r}")

        @jax.jit
        def validate(params, vq_state, batch, rng):
            k_enc, k_x = jax.random.split(rng)
            mel_n = self._mel_normalized(batch["wav"])
            (z_q, sem_idx, _, _, _), _ = self._encode(
                params, vq_state, batch, k_enc, train=False
            )
            B, T, _ = mel_n.shape
            x_T = jax.random.normal(k_x, mel_n.shape, mel_n.dtype)

            def model_fn(x, t, step_idx):
                kw = (
                    dict(sem_features=z_q)
                    if conditioning == "features"
                    else dict(sem_idx=sem_idx)
                )
                return self._decode(
                    params["decoder"], x, t, step_idx=step_idx, **kw
                )

            x0 = solver.sample(model_fn, x_T, num_steps, max_t=cfg.max_timestep)
            return {
                "val_cos": _cosine_sim(x0, mel_n),
                "val_mse": _mse(x0, mel_n),
            }

        return validate

    def make_validate_ddim_fn(
        self, num_steps: int, conditioning: str = "tokens",
    ) -> Callable:
        """Few-step RAW DDIM validation — the sampler the distillation phases
        exist to serve (reference inference.py:44-51 runs this exact loop at
        1-4 steps; DPM-Solver++ in make_validate_fn is a stronger sampler
        that can mask a few-step-raw-DDIM deficit, VERDICT r4 item 2).

        Returns a jitted ``(params, vq_state, batch, rng) -> metrics`` fn.
        Uses the model's trained prediction space (v by default) and the
        step_idx grid ddim_sample feeds the step embedding.
        """
        cfg = self.cfg
        schedule = self.schedule
        if conditioning not in ("features", "tokens"):
            raise ValueError(f"unknown conditioning {conditioning!r}")

        @jax.jit
        def validate(params, vq_state, batch, rng):
            k_enc, k_x = jax.random.split(rng)
            mel_n = self._mel_normalized(batch["wav"])
            (z_q, sem_idx, _, _, _), _ = self._encode(
                params, vq_state, batch, k_enc, train=False
            )
            x_T = jax.random.normal(k_x, mel_n.shape, mel_n.dtype)

            def model_fn(x, t, step_idx):
                kw = (
                    dict(sem_features=z_q)
                    if conditioning == "features"
                    else dict(sem_idx=sem_idx)
                )
                return self._decode(
                    params["decoder"], x, t, step_idx=step_idx, **kw
                )

            x0 = ddim_sample(
                schedule, model_fn, x_T, num_steps,
                prediction="v" if cfg.use_v_prediction else "eps",
            )
            return {
                "val_cos": _cosine_sim(x0, mel_n),
                "val_mse": _mse(x0, mel_n),
            }

        return validate

    def make_eval_eps_fn(self) -> Callable:
        """Epsilon-MSE on a validation batch (reference: visualization.py:18-44).

        Timesteps are drawn from [1, cfg.max_timestep), the same range the
        diffusion phase trains on — sampling the full [1, diff_steps) would
        mix in never-trained timesteps (t >= 950 by default) and add
        systematic off-distribution error to the best_diffusion selection
        metric."""
        cfg = self.cfg
        schedule = self.schedule

        @jax.jit
        def evaluate(params, vq_state, batch, rng):
            k_enc, k_t, k_noise = jax.random.split(rng, 3)
            mel_n = self._mel_normalized(batch["wav"])
            B = mel_n.shape[0]
            (z_q, sem_idx, _, _, _), _ = self._encode(
                params, vq_state, batch, k_enc, train=False
            )
            t = jax.random.randint(k_t, (B,), 1, cfg.max_timestep)
            noise = jax.random.normal(k_noise, mel_n.shape, mel_n.dtype)
            x_t, _ = schedule.q_sample(mel_n, t, noise)
            pred = self._decode(
                params["decoder"], x_t, t, sem_idx=sem_idx,
                step_idx=jnp.zeros((B,), jnp.int32),
            )
            if cfg.use_v_prediction:
                target = schedule.get_v_target(mel_n, noise, t)
            else:
                target = noise
            return {"val_eps_mse": _mse(pred, target)}

        return evaluate
