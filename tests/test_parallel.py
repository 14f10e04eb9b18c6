"""Parallel subsystem on the virtual 8-device CPU mesh: DP step correctness
(matches the single-device step numerically), sharded inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.models.hubert import HubertConfig
from edge_diffusion_tts_tpu.parallel import (
    make_mesh,
    replicate,
    shard_batch,
)
from edge_diffusion_tts_tpu.parallel.data_parallel import make_dp_diffusion_step
from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
from edge_diffusion_tts_tpu.training import (
    Trainer,
    create_train_state,
    init_models,
    make_optimizer,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(n_dev):
    cfg = CFG(
        hidden=32,
        layers=1,
        heads=2,
        segment_secs=0.1,
        batch_size=n_dev,
        grad_accumulation=1,
        diff_steps=50,
        max_timestep=48,
        dropout=0.0,
        cfg_dropout=0.0,
    )
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=100)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)
    state = create_train_state(cfg, params, vq_state, tx)
    return cfg, trainer, state


def test_mesh_shapes():
    mesh = make_mesh((8, 1))
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh((4, 2))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dp_step_runs_and_replicates():
    n = 8
    cfg, trainer, state = _setup(n)
    mesh = make_mesh((n, 1))
    step = make_dp_diffusion_step(trainer, mesh)
    batch = {
        "wav": np.random.RandomState(0)
        .randn(n, cfg.segment_len)
        .astype(np.float32)
        * 0.1
    }
    with mesh:
        state = replicate(state, mesh)
        device_batch = shard_batch(batch, mesh)
        state, metrics = step(state, device_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # Params identical on every shard (fully-addressable single process):
    leaf = jax.tree.leaves(state.params["decoder"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_progressive_and_consistency_steps():
    n = 8
    cfg, trainer, state = _setup(n)
    mesh = make_mesh((n, 1))
    batch = {
        "wav": np.random.RandomState(2)
        .randn(n, cfg.segment_len)
        .astype(np.float32)
        * 0.1
    }
    from edge_diffusion_tts_tpu.parallel import (
        make_dp_consistency_step,
        make_dp_progressive_step,
    )

    with mesh:
        state = replicate(state.with_teacher(), mesh)
        device_batch = shard_batch(batch, mesh)
        pstep = make_dp_progressive_step(trainer, mesh, num_steps=4)
        state, m1 = pstep(state, device_batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(m1["loss"]))
        cstep = make_dp_consistency_step(trainer, mesh)
        state, m2 = cstep(state, device_batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(m2["loss"]))
    assert int(state.step) == 2


def test_dp_generate_sharded_matches_unsharded():
    """make_dp_generate: batched few-step generation sharded over the data
    axis equals the unsharded program."""
    import jax.numpy as jnp

    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.parallel import make_dp_generate
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule, ddim_sample

    cfg = CFG(hidden=32, layers=1, heads=2, diff_steps=40, dropout=0.0)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    B, S = 8, 10

    def build(params, sem_idx, rng, temperature):
        x_T = jax.random.normal(rng, (B, S * 2, cfg.n_mels)) * temperature

        def model_fn(x, t, si):
            return dec.apply({"params": params}, x, t, sem_idx=sem_idx,
                             step_idx=si)

        return ddim_sample(schedule, model_fn, x_T, 2)

    sem_idx = jnp.zeros((B, S), jnp.int32)
    rng = jax.random.PRNGKey(1)
    ref = build(params, sem_idx, rng, jnp.float32(1.0))

    mesh = make_mesh((8, 1))
    with mesh:
        gen = make_dp_generate(build, mesh)
        out = gen(params, sem_idx, rng, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dp_loss_progress():
    n = 8
    cfg, trainer, state = _setup(n)
    mesh = make_mesh((n, 1))
    step = make_dp_diffusion_step(trainer, mesh)
    batch = {
        "wav": np.random.RandomState(1)
        .randn(n, cfg.segment_len)
        .astype(np.float32)
        * 0.1
    }
    losses = []
    with mesh:
        state = replicate(state, mesh)
        device_batch = shard_batch(batch, mesh)
        for i in range(4):
            state, metrics = step(state, device_batch, jax.random.PRNGKey(2))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
