"""Schedule math: closed-form identities + numeric parity with the reference."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edge_diffusion_tts_tpu.schedule import (
    DiffusionSchedule,
    DPMSolverPP,
    ddim_sample,
    ddpm_sample,
)

from conftest import REFERENCE_PATH, has_reference

T = 1000


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create(T)


def test_table_shapes_and_monotonicity(sched):
    for name in [
        "betas",
        "alphas",
        "alpha_bar",
        "sqrt_alpha_bar",
        "sqrt_one_minus_alpha_bar",
        "posterior_variance",
        "lambda_t",
    ]:
        assert getattr(sched, name).shape == (T,)
    ab = np.asarray(sched.alpha_bar)
    assert np.all(np.diff(ab) < 0), "alpha_bar must be strictly decreasing"
    assert ab[0] < 1.0 and ab[-1] > 0.0
    lam = np.asarray(sched.lambda_t)
    assert np.all(np.diff(lam) < 0), "log-SNR must decrease with t"


def test_q_sample_and_eps_roundtrip(sched):
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (2, 16, 8))
    noise = jax.random.normal(k2, (2, 16, 8))
    t = jax.random.randint(k3, (2,), 1, T)
    x_t, _ = sched.q_sample(x0, t, noise)
    x0_rec = sched.predict_x0_from_eps(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-4)


def test_v_parameterization_identities(sched):
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (3, 10, 4))
    noise = jax.random.normal(k2, (3, 10, 4))
    t = jax.random.randint(k3, (3,), 1, T)
    x_t, _ = sched.q_sample(x0, t, noise)
    v = sched.get_v_target(x0, noise, t)
    x0_rec = sched.predict_x0_from_v(x_t, t, v)
    eps_rec = sched.predict_eps_from_v(x_t, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=2e-4)


def test_ddim_step_with_true_eps_moves_toward_x0(sched):
    # With the exact noise as eps_pred, DDIM should land exactly on
    # q_sample(x0, t_prev) deterministic trajectory.
    rng = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(rng)
    x0 = 0.5 * jax.random.normal(k1, (2, 8, 4))  # small, avoid the +-3 clamp
    noise = jax.random.normal(k2, (2, 8, 4))
    t = jnp.array([800, 400], dtype=jnp.int32)
    t_prev = jnp.array([600, 200], dtype=jnp.int32)
    x_t, _ = sched.q_sample(x0, t, noise)
    x_prev, x0_pred = sched.get_ddim_step(x_t, t, t_prev, noise, eta=0.0)
    np.testing.assert_allclose(np.asarray(x0_pred), np.asarray(x0), atol=1e-3)
    expected, _ = sched.q_sample(x0, t_prev, noise)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected), atol=1e-3)


def test_ddim_step_tprev_negative_gives_x0(sched):
    rng = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(rng)
    x0 = 0.5 * jax.random.normal(k1, (1, 8, 4))
    noise = jax.random.normal(k2, (1, 8, 4))
    t = jnp.array([500], dtype=jnp.int32)
    x_t, _ = sched.q_sample(x0, t, noise)
    x_prev, x0_pred = sched.get_ddim_step(
        x_t, t, jnp.array([-1], dtype=jnp.int32), noise, eta=0.0
    )
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0_pred), atol=1e-5)


def test_schedule_for_steps(sched):
    assert sched.get_schedule_for_steps(4) == [999, 749, 499, 249]
    assert len(sched.get_schedule_for_steps(8)) == 8


def test_ddim_sample_with_oracle_model(sched):
    # Oracle model returns the exact eps that produced x_T from a fixed x0;
    # a 4-step DDIM loop must then recover x0.
    rng = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(rng)
    x0 = 0.5 * jax.random.normal(k1, (2, 8, 4))
    noise = jax.random.normal(k2, (2, 8, 4))
    t999 = jnp.full((2,), 999, dtype=jnp.int32)
    x_T, _ = sched.q_sample(x0, t999, noise)

    def oracle(x, t, step_idx):
        # true eps for the current x given the known x0
        sab = jnp.take(sched.sqrt_alpha_bar, t)[:, None, None]
        s1mab = jnp.take(sched.sqrt_one_minus_alpha_bar, t)[:, None, None]
        return (x - sab * x0) / s1mab

    out = ddim_sample(sched, oracle, x_T, num_steps=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ddpm_sample_runs_and_is_finite(sched):
    small = DiffusionSchedule.create(50)

    def zero_model(x, t, step_idx):
        return jnp.zeros_like(x)

    x_T = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 4))
    out = ddpm_sample(small, zero_model, x_T, jax.random.PRNGKey(6))
    assert np.all(np.isfinite(np.asarray(out)))


def test_dpm_solver_timesteps_and_sample(sched):
    solver = DPMSolverPP(sched, order=2, predict_x0=False)
    ts = solver.get_time_steps(4, max_t=950)
    assert len(ts) == 4
    assert ts[0] == 950 or ts[0] <= 950
    assert all(1 <= t <= 950 for t in ts)
    assert ts == sorted(ts, reverse=True)

    def zero_model(x, t, step_idx):
        return jnp.zeros_like(x)

    x_T = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 4))
    out = solver.sample(zero_model, x_T, num_steps=4)
    assert out.shape == x_T.shape
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# Numeric parity against the PyTorch reference implementation (read-only).
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
class TestReferenceParity:
    @pytest.fixture(scope="class")
    def ref_sched(self):
        sys.path.insert(0, REFERENCE_PATH)
        from edge_diffusion_tts.schedule import DiffusionSchedule as RefSchedule

        return RefSchedule(T)

    def test_tables_match(self, sched, ref_sched):
        import torch

        for name in [
            "betas",
            "alphas",
            "alpha_bar",
            "sqrt_alpha_bar",
            "sqrt_one_minus_alpha_bar",
            "sqrt_recip_alpha_bar",
            "sqrt_recip_alpha_bar_minus_one",
            "posterior_variance",
            "lambda_t",
        ]:
            ours = np.asarray(getattr(sched, name))
            ref = getattr(ref_sched, name).numpy()
            # Residual differences are single-ulp f32 noise between torch and
            # numpy transcendental kernels, amplified by cancellation in the
            # beta formula; tolerances still catch any real formula change.
            np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=2e-4, err_msg=name)

    def test_ddim_step_matches(self, sched, ref_sched):
        import torch

        rng = np.random.RandomState(0)
        x_t = rng.randn(2, 8, 4).astype(np.float32)
        eps = rng.randn(2, 8, 4).astype(np.float32)
        t = np.array([700, 300])
        t_prev = np.array([450, 50])

        ref_x, ref_x0 = ref_sched.get_ddim_step(
            torch.from_numpy(x_t),
            torch.from_numpy(t),
            torch.from_numpy(t_prev),
            torch.from_numpy(eps),
            eta=0.0,
        )
        our_x, our_x0 = sched.get_ddim_step(
            jnp.asarray(x_t),
            jnp.asarray(t, dtype=jnp.int32),
            jnp.asarray(t_prev, dtype=jnp.int32),
            jnp.asarray(eps),
            eta=0.0,
        )
        np.testing.assert_allclose(np.asarray(our_x), ref_x.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(our_x0), ref_x0.numpy(), atol=1e-5)

    def test_ddpm_step_matches(self, sched, ref_sched):
        """Ancestral-step MEAN parity (noise is injected explicitly on our
        side, so compare at matched noise)."""
        import torch

        rng = np.random.RandomState(5)
        x_t = rng.randn(2, 8, 4).astype(np.float32)
        eps = rng.randn(2, 8, 4).astype(np.float32)
        t = np.array([600, 0])  # include t=0 (no-noise branch)

        # Reference draws torch.randn internally; pin determinism by seeding
        # and re-deriving the same normal draw both sides is impractical, so
        # compare the deterministic component: at t=0 both add no noise, and
        # at t>0 subtract the (known) injected noise term.
        torch.manual_seed(0)
        ref_out = ref_sched.ddpm_step(
            torch.from_numpy(x_t), torch.from_numpy(t), torch.from_numpy(eps)
        ).numpy()

        alpha = np.asarray(sched.alphas)[t][:, None, None]
        ab = np.asarray(sched.alpha_bar)[t][:, None, None]
        beta = np.asarray(sched.betas)[t][:, None, None]
        mean = (x_t - beta / np.sqrt(1 - ab) * eps) / np.sqrt(alpha)
        # t=0 row must equal the mean exactly on both sides
        np.testing.assert_allclose(ref_out[1], mean[1], atol=1e-5)

        import jax

        ours = sched.ddpm_step(
            jnp.asarray(x_t), jnp.asarray(t, dtype=jnp.int32), jnp.asarray(eps),
            jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(np.asarray(ours)[1], mean[1], atol=1e-5)
        # t>0: both equal mean + sqrt(posterior_var) * (their own) noise —
        # check the variance scale by normalizing the residual.
        var = np.asarray(sched.posterior_variance)[t[0]]
        res_ref = (ref_out[0] - mean[0]) / np.sqrt(var)
        res_our = (np.asarray(ours)[0] - mean[0]) / np.sqrt(var)
        assert 0.5 < res_ref.std() < 2.0
        assert 0.5 < res_our.std() < 2.0

    def test_v_conversions_match(self, sched, ref_sched):
        import torch

        rng = np.random.RandomState(1)
        x_t = rng.randn(2, 8, 4).astype(np.float32)
        v = rng.randn(2, 8, 4).astype(np.float32)
        t = np.array([900, 100])
        for ours_fn, ref_fn in [
            (sched.predict_x0_from_v, ref_sched.predict_x0_from_v),
            (sched.predict_eps_from_v, ref_sched.predict_eps_from_v),
        ]:
            ours = ours_fn(
                jnp.asarray(x_t), jnp.asarray(t, dtype=jnp.int32), jnp.asarray(v)
            )
            ref = ref_fn(torch.from_numpy(x_t), torch.from_numpy(t), torch.from_numpy(v))
            np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    def test_dpm_solver_matches(self, sched, ref_sched):
        import torch

        sys.path.insert(0, REFERENCE_PATH)
        from edge_diffusion_tts.schedule import DPMSolverPP as RefSolver

        ref_solver = RefSolver(ref_sched, order=2, predict_x0=False)
        our_solver = DPMSolverPP(sched, order=2, predict_x0=False)
        assert our_solver.get_time_steps(4, 950) == [
            int(t) for t in ref_solver.get_time_steps(4, 950)
        ]

        # Fixed linear "model": v = 0.1 * x (deterministic, framework-free)
        rng = np.random.RandomState(2)
        x_T = rng.randn(1, 16, 8).astype(np.float32)

        class TorchLinModel:
            def __call__(self, x, t, sem_features=None, step_idx=None):
                return 0.1 * x

        ref_out = ref_solver.sample(
            TorchLinModel(),
            torch.from_numpy(x_T),
            sem_features=torch.zeros(1, 4, 8),
            num_steps=4,
        )

        def jax_model(x, t, step_idx):
            return 0.1 * x

        our_out = our_solver.sample(jax_model, jnp.asarray(x_T), num_steps=4)
        np.testing.assert_allclose(
            np.asarray(our_out), ref_out.numpy(), rtol=1e-4, atol=1e-5
        )
