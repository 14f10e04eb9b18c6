"""Fused Pallas denoise mega-kernel vs the lax.scan DDIM oracle (interpret
mode on CPU; the TPU path is exercised by bench.py / verify)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
from edge_diffusion_tts_tpu.ops.fused_denoise import (
    FusedEdgeInference,
    fused_generate_mel,
)
from edge_diffusion_tts_tpu.schedule import DiffusionSchedule, ddim_sample

# Long-running lane: excluded from `pytest -m 'not slow'` (CLAUDE.md).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = CFG(hidden=32, layers=2, heads=2, dropout=0.0, attn_window_size=8)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    # Randomize (incl. the zero-init out head) so outputs are nontrivial.
    leaves, tree = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    params = jax.tree.unflatten(
        tree, [p + 0.02 * jax.random.normal(k, p.shape) for p, k in zip(leaves, ks)]
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    return cfg, dec, params, schedule


@pytest.mark.parametrize("num_steps", [1, 4])
def test_fused_matches_oracle(setup, num_steps):
    cfg, dec, params, schedule = setup
    B, S = 2, 12
    sem_idx = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, 2304)
    x_T = jax.random.normal(jax.random.PRNGKey(2), (B, S * 2, cfg.n_mels))

    def model_fn(x, t, si):
        return dec.apply({"params": params}, x, t, sem_idx=sem_idx, step_idx=si)

    oracle = ddim_sample(schedule, model_fn, x_T, num_steps, prediction="eps")
    fused = fused_generate_mel(
        cfg, schedule, params, sem_idx, x_T, num_steps, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(oracle), atol=1e-4
    )


def test_fused_v_prediction(setup):
    cfg, dec, params, schedule = setup
    B, S = 1, 10
    sem_idx = jnp.zeros((B, S), jnp.int32)
    x_T = jax.random.normal(jax.random.PRNGKey(3), (B, S * 2, cfg.n_mels))

    def model_fn(x, t, si):
        return dec.apply({"params": params}, x, t, sem_idx=sem_idx, step_idx=si)

    oracle = ddim_sample(schedule, model_fn, x_T, 2, prediction="v")
    fused = fused_generate_mel(
        cfg, schedule, params, sem_idx, x_T, 2, prediction="v", interpret=True
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle), atol=1e-4)


def test_edge_inference_fused_backend_matches_xla(setup):
    cfg, dec, params, schedule = setup
    from edge_diffusion_tts_tpu.inference import EdgeInference

    apply = lambda p, x, t, **kw: dec.apply({"params": p}, x, t, **kw)
    sem_idx = jax.random.randint(jax.random.PRNGKey(9), (1, 12), 0, 2304)
    rng = jax.random.PRNGKey(10)
    a = EdgeInference(cfg, schedule, apply, params).generate_mel(
        sem_idx, num_steps=4, rng=rng
    )
    b = EdgeInference(cfg, schedule, apply, params, backend="fused").generate_mel(
        sem_idx, num_steps=4, rng=rng
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_facade(setup):
    cfg, dec, params, schedule = setup
    inf = FusedEdgeInference(cfg, schedule, params)
    sem_idx = jnp.zeros((1, 8), jnp.int32)
    mel = inf.generate_mel(sem_idx, num_steps=2)
    assert mel.shape == (1, 16, cfg.n_mels)
    assert np.isfinite(np.asarray(mel)).all()


@pytest.mark.parametrize("prediction", ["eps", "v"])
def test_fused_ddpm_matches_ddpm_step_oracle(setup, prediction):
    """Fused full-schedule DDPM vs the repo's own ddpm_step driven with the
    SAME per-step noise (injected via the kernel's noise-input test mode).
    Oracle semantics: schedule.ddpm_sample (t = T-1..0, step_idx=0, no
    noise at t=0; reference: edge_diffusion_tts/schedule.py:204-238)."""
    from edge_diffusion_tts_tpu.ops.fused_denoise import fused_ddpm_sample

    cfg, dec, params, _ = setup
    sched8 = DiffusionSchedule.create(8)
    B, S = 2, 12
    sem_idx = jax.random.randint(jax.random.PRNGKey(11), (B, S), 0, 2304)
    x_T = jax.random.normal(jax.random.PRNGKey(12), (B, S * 2, cfg.n_mels))

    keys = jax.random.split(jax.random.PRNGKey(13), sched8.T)
    noise = jnp.stack(
        [jax.random.normal(k, x_T.shape) for k in keys], axis=1
    )  # [B, T_sched, T_mel, M]

    x = x_T
    for i, t in enumerate(range(sched8.T - 1, -1, -1)):
        t_b = jnp.full((B,), t, jnp.int32)
        out = dec.apply(
            {"params": params}, x, t_b, sem_idx=sem_idx,
            step_idx=jnp.zeros((B,), jnp.int32),
        )
        if prediction == "v":
            eps = sched8.predict_eps_from_v(x, t_b, out)
        else:
            eps = out
        # ddpm_step with its internal draw replaced by the injected noise.
        alpha = sched8.alphas[t]
        ab = sched8.alpha_bar[t]
        beta = sched8.betas[t]
        mean = (x - beta / jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(alpha)
        sigma = jnp.where(t > 0, jnp.sqrt(sched8.posterior_variance[t]), 0.0)
        x = mean + sigma * noise[:, i]

    fused = fused_ddpm_sample(
        cfg, sched8, params, sem_idx, x_T, prediction=prediction,
        noise=noise, interpret=True,
    )
    # The unclamped DDPM recurrence on an untrained decoder amplifies the
    # trajectory to O(1e3); tolerance must be relative (measured max rel
    # error ~2e-7 at that scale).
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(x), rtol=1e-4, atol=1e-3
    )


def test_fused_ddpm_prng_smoke(setup):
    """On-chip-PRNG mode: finite output with plausible first/second moments,
    deterministic per seed, different across seeds.  (Bit-level behavior is
    TPU-only; interpret mode implements pltpu.prng_* on CPU.)"""
    from edge_diffusion_tts_tpu.ops.fused_denoise import fused_ddpm_sample

    cfg, dec, params, _ = setup
    sched8 = DiffusionSchedule.create(8)
    B, S = 1, 10
    sem_idx = jnp.zeros((B, S), jnp.int32)
    x_T = jax.random.normal(jax.random.PRNGKey(14), (B, S * 2, cfg.n_mels))

    try:
        a = fused_ddpm_sample(
            cfg, sched8, params, sem_idx, x_T,
            rng=jax.random.PRNGKey(0), interpret=True,
        )
    except NotImplementedError:
        pytest.skip("pltpu.prng_* not supported by interpret mode here")
    b = fused_ddpm_sample(
        cfg, sched8, params, sem_idx, x_T,
        rng=jax.random.PRNGKey(0), interpret=True,
    )
    c = fused_ddpm_sample(
        cfg, sched8, params, sem_idx, x_T,
        rng=jax.random.PRNGKey(1), interpret=True,
    )
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6
