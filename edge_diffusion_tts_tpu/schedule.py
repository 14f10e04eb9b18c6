"""Diffusion schedule math as pure JAX functions over precomputed tables.

The schedule is an immutable pytree of jnp arrays (cosine beta/alpha-bar
tables and derived quantities) so it can be closed over by jitted functions,
donated, or device-put once and reused.  All sampling-step updates are pure:
``x_{t-1} = f(tables, x_t, t, model_output)``.

Functional equivalent of the reference DiffusionSchedule / DPMSolverPP
(reference: edge_diffusion_tts/schedule.py:11-266, 269-533), re-designed for
XLA: timestep grids are static python tuples, sampling loops live in
``lax.scan`` / unrolled jitted bodies, and stochastic steps take explicit PRNG
keys.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def _bcast(table: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Gather per-timestep scalars and broadcast to [B, 1, 1]."""
    return jnp.take(table, t)[:, None, None]


@flax.struct.dataclass
class DiffusionSchedule:
    """Precomputed cosine-schedule tables (all float32, shape [T]).

    Note: like the reference (schedule.py:26-43), ``beta_start``/``beta_end``
    are accepted by the constructor but the schedule is cosine — the linear
    endpoints are ignored.
    """

    T: int = flax.struct.field(pytree_node=False)
    betas: jnp.ndarray = None
    alphas: jnp.ndarray = None
    alpha_bar: jnp.ndarray = None
    sqrt_alpha_bar: jnp.ndarray = None
    sqrt_one_minus_alpha_bar: jnp.ndarray = None
    sqrt_recip_alpha_bar: jnp.ndarray = None
    sqrt_recip_alpha_bar_minus_one: jnp.ndarray = None
    posterior_variance: jnp.ndarray = None
    lambda_t: jnp.ndarray = None

    @classmethod
    def create(
        cls,
        T: int,
        beta_start: float = 1e-4,
        beta_end: float = 2e-2,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        # Cosine alpha-bar (Nichol & Dhariwal), s=0.008; matches the reference
        # tables (schedule.py:36-59) to float32 precision.
        del beta_start, beta_end  # cosine schedule; kept for API parity
        # Tables are computed in float32 end-to-end so they match the
        # reference bit-for-bit (the reference builds them with torch f32).
        s = np.float32(0.008)
        x = np.linspace(0.0, T, T + 1, dtype=np.float32)
        ab = np.cos(((x / np.float32(T)) + s) / (1 + s) * np.float32(math.pi) * 0.5)
        ab = (ab * ab).astype(np.float32)
        ab = ab / ab[0]
        betas = (np.float32(1.0) - (ab[1:] / ab[:-1])).astype(np.float32)
        betas = np.clip(betas, 0.0001, 0.9999).astype(np.float32)

        alphas = (np.float32(1.0) - betas).astype(np.float32)
        alpha_bar = np.cumprod(alphas, axis=0, dtype=np.float32)

        sqrt_ab = np.sqrt(alpha_bar)
        sqrt_1mab = np.sqrt(1.0 - alpha_bar)
        alpha_bar_prev = np.concatenate([[1.0], alpha_bar[:-1]])
        posterior_var = betas * (1.0 - alpha_bar_prev) / (1.0 - alpha_bar)
        lambda_t = np.log(sqrt_ab / sqrt_1mab)

        arr = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            T=T,
            betas=arr(betas),
            alphas=arr(alphas),
            alpha_bar=arr(alpha_bar),
            sqrt_alpha_bar=arr(sqrt_ab),
            sqrt_one_minus_alpha_bar=arr(sqrt_1mab),
            sqrt_recip_alpha_bar=arr(np.sqrt(1.0 / alpha_bar)),
            sqrt_recip_alpha_bar_minus_one=arr(np.sqrt(1.0 / alpha_bar - 1.0)),
            posterior_variance=arr(posterior_var),
            lambda_t=arr(lambda_t),
        )

    # ---- forward process -----------------------------------------------------

    def q_sample(
        self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward noising q(x_t | x_0).  Noise must be supplied (explicit PRNG).

        Reference: schedule.py:61-86.
        """
        x_t = _bcast(self.sqrt_alpha_bar, t) * x0 + _bcast(
            self.sqrt_one_minus_alpha_bar, t
        ) * noise
        return x_t, noise

    # ---- parameterization conversions -----------------------------------------

    def predict_x0_from_eps(self, x_t, t, eps):
        """x0 from epsilon-prediction.  Reference: schedule.py:88-107."""
        return (
            _bcast(self.sqrt_recip_alpha_bar, t) * x_t
            - _bcast(self.sqrt_recip_alpha_bar_minus_one, t) * eps
        )

    def predict_x0_from_v(self, x_t, t, v):
        """x0 = sqrt(ab)*x_t - sqrt(1-ab)*v.  Reference: schedule.py:109-125."""
        return (
            _bcast(self.sqrt_alpha_bar, t) * x_t
            - _bcast(self.sqrt_one_minus_alpha_bar, t) * v
        )

    def predict_eps_from_v(self, x_t, t, v):
        """eps = sqrt(1-ab)*x_t + sqrt(ab)*v.  Reference: schedule.py:127-140."""
        return (
            _bcast(self.sqrt_one_minus_alpha_bar, t) * x_t
            + _bcast(self.sqrt_alpha_bar, t) * v
        )

    def get_v_target(self, x0, noise, t):
        """v = sqrt(ab)*eps - sqrt(1-ab)*x0.  Reference: schedule.py:142-155."""
        return (
            _bcast(self.sqrt_alpha_bar, t) * noise
            - _bcast(self.sqrt_one_minus_alpha_bar, t) * x0
        )

    # ---- reverse-process steps -------------------------------------------------

    def get_ddim_step(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        t_prev: jnp.ndarray,
        eps_pred: jnp.ndarray,
        eta: float = 0.0,
        rng: Optional[jax.Array] = None,
        x0_clip: float = 3.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One DDIM update (deterministic at eta=0), x0 clamped to +-x0_clip.

        t_prev < 0 selects alpha_bar=1 (the clean endpoint).
        Reference: schedule.py:157-202.
        """
        ab_t = _bcast(self.alpha_bar, t)
        ab_prev = jnp.where(
            t_prev[:, None, None] >= 0,
            _bcast(self.alpha_bar, jnp.clip(t_prev, 0, self.T - 1)),
            jnp.ones_like(ab_t),
        )

        x0_pred = (x_t - jnp.sqrt(1.0 - ab_t) * eps_pred) / jnp.sqrt(ab_t)
        x0_pred = jnp.clip(x0_pred, -x0_clip, x0_clip)

        sigma = eta * jnp.sqrt(
            (1.0 - ab_prev) / (1.0 - ab_t) * (1.0 - ab_t / ab_prev)
        )
        dir_xt = jnp.sqrt(1.0 - ab_prev - sigma**2) * eps_pred

        if eta > 0:
            if rng is None:
                raise ValueError("eta > 0 requires an explicit PRNG key")
            noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
        else:
            noise = 0.0
        x_prev = jnp.sqrt(ab_prev) * x0_pred + dir_xt + sigma * noise
        return x_prev, x0_pred

    def ddpm_step(
        self, x_t: jnp.ndarray, t: jnp.ndarray, eps_pred: jnp.ndarray, rng: jax.Array
    ) -> jnp.ndarray:
        """One ancestral DDPM step with posterior variance; no noise at t=0.

        Reference: schedule.py:204-238.
        """
        alpha = _bcast(self.alphas, t)
        alpha_bar = _bcast(self.alpha_bar, t)
        beta = _bcast(self.betas, t)

        mean = (x_t - beta / jnp.sqrt(1.0 - alpha_bar) * eps_pred) / jnp.sqrt(alpha)
        var = _bcast(self.posterior_variance, t)
        noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
        nonzero = (t > 0).astype(x_t.dtype)[:, None, None]
        return mean + nonzero * jnp.sqrt(var) * noise

    # ---- static timestep grids ---------------------------------------------------

    def get_schedule_for_steps(self, num_steps: int) -> List[int]:
        """Evenly strided timestep grid (python ints; static under jit).

        Reference: schedule.py:240-252.
        """
        stride = max(self.T // num_steps, 1)
        return list(range(self.T - 1, 0, -stride))[:num_steps]


# ---------------------------------------------------------------------------
# Samplers (schedule-driven loops; model_fn: (x, t[B], step_idx[B]) -> output)
# ---------------------------------------------------------------------------


def ddim_sample(
    schedule: DiffusionSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    num_steps: int,
    prediction: str = "eps",
) -> jnp.ndarray:
    """Few-step DDIM loop as a ``lax.scan`` over a static timestep grid.

    Returns the final x0 prediction (normalized-mel space), matching
    EdgeInference.generate_mel (reference: edge_diffusion_tts/inference.py:24-53):
    timesteps = range(T-1, 0, -stride)[:n], t_prev = max(t - stride, 0).
    """
    B = x_T.shape[0]
    stride = max(schedule.T // num_steps, 1)
    ts = schedule.get_schedule_for_steps(num_steps)

    def one_step(x, t, t_prev, i):
        t_b = jnp.full((B,), t, dtype=jnp.int32)
        tp_b = jnp.full((B,), t_prev, dtype=jnp.int32)
        i_b = jnp.full((B,), i, dtype=jnp.int32)
        out = model_fn(x, t_b, i_b)
        if prediction == "v":
            eps = schedule.predict_eps_from_v(x, t_b, out)
        else:
            eps = out
        return schedule.get_ddim_step(x, t_b, tp_b, eps, eta=0.0)

    # Few-step loops unroll (measured ~10% faster on v5e than a lax.scan of
    # the same body — while-loop trip overhead dominates at 1-8 steps);
    # longer grids scan to keep program size bounded.
    if len(ts) <= 8:
        x, x0 = x_T, jnp.zeros_like(x_T)
        for i, t in enumerate(ts):
            x, x0 = one_step(x, t, max(t - stride, 0), i)
        return x0

    t_grid = jnp.asarray(ts, dtype=jnp.int32)
    t_prev_grid = jnp.asarray([max(t - stride, 0) for t in ts], dtype=jnp.int32)
    # The strided grid can hold fewer than num_steps entries when stride
    # does not tile [1, T); iterate what exists.
    step_grid = jnp.arange(len(ts), dtype=jnp.int32)

    def body(carry, inp):
        x, _ = carry
        t, t_prev, i = inp
        x_next, x0 = one_step(x, t, t_prev, i)
        return (x_next, x0), None

    (x, x0), _ = jax.lax.scan(
        body, (x_T, jnp.zeros_like(x_T)), (t_grid, t_prev_grid, step_grid)
    )
    return x0


def ddpm_sample(
    schedule: DiffusionSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    rng: jax.Array,
    prediction: str = "eps",
) -> jnp.ndarray:
    """Full-schedule ancestral sampling (T steps) via ``lax.scan``.

    Reference behavior: schedule.py:204-238 applied for t = T-1 .. 0.
    """
    B = x_T.shape[0]
    t_grid = jnp.arange(schedule.T - 1, -1, -1, dtype=jnp.int32)

    def body(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        t_b = jnp.full((B,), t, dtype=jnp.int32)
        i_b = jnp.zeros((B,), dtype=jnp.int32)
        out = model_fn(x, t_b, i_b)
        if prediction == "v":
            eps = schedule.predict_eps_from_v(x, t_b, out)
        else:
            eps = out
        x = schedule.ddpm_step(x, t_b, eps, sub)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), t_grid)
    return x


class DPMSolverPP:
    """DPM-Solver++ sampler (orders 1-3) over log-SNR-spaced timesteps.

    Timestep selection happens on host from the (numpy-copied) lambda table;
    the sampling loop is a statically-unrolled jit-friendly python loop with a
    2-deep x0 history, exactly mirroring the reference semantics
    (reference: edge_diffusion_tts/schedule.py:269-533).
    """

    def __init__(
        self,
        schedule: DiffusionSchedule,
        order: int = 2,
        predict_x0: bool = False,
    ):
        self.schedule = schedule
        self.order = order
        self.predict_x0 = predict_x0
        self._lambda_np = np.asarray(schedule.lambda_t)

    def get_time_steps(self, num_steps: int, max_t: Optional[int] = None) -> List[int]:
        """Log-SNR-uniform grid as static python ints.

        Reference: schedule.py:299-324.
        """
        max_t = max_t or (self.schedule.T - 1)
        lam = self._lambda_np
        lambda_max = lam[1]
        lambda_min = lam[max_t]
        lambdas = np.linspace(lambda_min, lambda_max, num_steps + 1)
        ts = []
        for l in lambdas[:-1]:
            t = int(np.abs(lam - l).argmin())
            ts.append(max(1, min(t, max_t)))
        return ts

    def model_to_x0(self, model_output, x_t, t):
        if self.predict_x0:
            return model_output
        return self.schedule.predict_x0_from_v(x_t, t, model_output)

    def first_order_update(self, x, x0_pred, t, t_prev):
        """Reference: schedule.py:339-364."""
        s = self.schedule
        alpha_prev = _bcast(s.sqrt_alpha_bar, t_prev)
        sigma_t = _bcast(s.sqrt_one_minus_alpha_bar, t)
        sigma_prev = _bcast(s.sqrt_one_minus_alpha_bar, t_prev)
        h = _bcast(s.lambda_t, t_prev) - _bcast(s.lambda_t, t)
        return (sigma_prev / sigma_t) * x + alpha_prev * (1 - jnp.exp(-h)) * x0_pred

    def second_order_update(self, x, x0_pred, x0_prev, t, t_prev, t_prev2):
        """Reference: schedule.py:366-402."""
        s = self.schedule
        alpha_prev = _bcast(s.sqrt_alpha_bar, t_prev)
        sigma_t = _bcast(s.sqrt_one_minus_alpha_bar, t)
        sigma_prev = _bcast(s.sqrt_one_minus_alpha_bar, t_prev)
        lam_t = _bcast(s.lambda_t, t)
        lam_prev = _bcast(s.lambda_t, t_prev)
        lam_prev2 = _bcast(s.lambda_t, t_prev2)
        h = lam_prev - lam_t
        r = (lam_prev2 - lam_prev) / h
        D0 = x0_pred
        D1 = (1.0 / r) * (x0_pred - x0_prev)
        return (
            (sigma_prev / sigma_t) * x
            + alpha_prev * (1 - jnp.exp(-h)) * D0
            + alpha_prev * ((1 - jnp.exp(-h)) / h + 1) * D1 * 0.5
        )

    def third_order_update(self, x, x0_preds, t, t_prev):
        """Reference: schedule.py:404-438."""
        s = self.schedule
        alpha_prev = _bcast(s.sqrt_alpha_bar, t_prev)
        sigma_t = _bcast(s.sqrt_one_minus_alpha_bar, t)
        sigma_prev = _bcast(s.sqrt_one_minus_alpha_bar, t_prev)
        h = _bcast(s.lambda_t, t_prev) - _bcast(s.lambda_t, t)
        D0 = x0_preds[0]
        D1 = x0_preds[0] - x0_preds[1]
        D2 = x0_preds[0] - 2 * x0_preds[1] + x0_preds[2]
        return (
            (sigma_prev / sigma_t) * x
            + alpha_prev * (1 - jnp.exp(-h)) * D0
            + alpha_prev * ((1 - jnp.exp(-h)) / h + 1) * D1 * 0.5
            + alpha_prev * ((1 - jnp.exp(-h)) / (h**2) + 0.5 / h + 0.5) * D2 / 6
        )

    def sample(
        self,
        model_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
        x_T: jnp.ndarray,
        num_steps: int = 10,
        max_t: Optional[int] = None,
        return_intermediates: bool = False,
        x0_clip: float = 3.0,
    ):
        """Run the solver; loop is unrolled over the static timestep grid.

        ``model_fn(x, t[B], step_idx[B])`` should return the model output
        (v-prediction by default).  Reference: schedule.py:440-527.
        """
        max_t = max_t or 950
        timesteps = self.get_time_steps(num_steps, max_t)
        B = x_T.shape[0]
        x = x_T
        x0_history: list = []
        t_history: list = []
        intermediates = []

        for i, t in enumerate(timesteps):
            t_b = jnp.full((B,), t, dtype=jnp.int32)
            i_b = jnp.full((B,), i, dtype=jnp.int32)
            out = model_fn(x, t_b, i_b)
            x0_pred = self.model_to_x0(out, x, t_b)
            x0_pred = jnp.clip(x0_pred, -x0_clip, x0_clip)
            if return_intermediates:
                intermediates.append(x0_pred)

            t_prev = timesteps[i + 1] if i < len(timesteps) - 1 else 0
            tp_b = jnp.full((B,), t_prev, dtype=jnp.int32)

            if self.order == 1 or len(x0_history) == 0:
                x = self.first_order_update(x, x0_pred, t_b, tp_b)
            elif self.order == 2 or len(x0_history) == 1:
                x = self.second_order_update(
                    x, x0_pred, x0_history[-1], t_b, tp_b, t_history[-1]
                )
            else:
                # History list ordering matches the reference exactly
                # (schedule.py:511-514 passes [x0_pred] + x0_history[-2:]).
                x = self.third_order_update(
                    x, [x0_pred] + x0_history[-2:], t_b, tp_b
                )

            x0_history.append(x0_pred)
            t_history.append(tp_b)
            if len(x0_history) > 2:
                x0_history.pop(0)
                t_history.pop(0)

        if return_intermediates:
            return x, intermediates
        return x
