"""Multi-host scaffolding on the single-process virtual mesh: pod-mesh
construction, the process-local data feed, and a DP step over the result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.parallel import (
    host_local_batch,
    init_multihost,
    make_pod_mesh,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
# Long-running lane: excluded from `pytest -m 'not slow'` (CLAUDE.md).
pytestmark = [pytest.mark.slow, pytestmark]


def test_init_single_process_noop():
    assert init_multihost() == (0, 1)


def test_make_pod_mesh_single_slice():
    mesh = make_pod_mesh((4, 2), ("data", "model"))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_pod_mesh((8,), ("data",))
    assert mesh1.shape == {"data": 8}


def test_two_process_dp_step_matches_single_process():
    """Multi-host for REAL (VERDICT r4 item 5): two OS processes, local
    coordinator, Gloo CPU collectives — one DP diffusion step whose gradient
    psum crosses the process boundary must produce exactly the
    single-process loss.  Drives tools/multihost_smoke.py (which also writes
    MULTIHOST_r05.json when run standalone)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "multihost_smoke",
        _os.path.join(_os.path.dirname(__file__), "..", "tools",
                      "multihost_smoke.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.launch(artifact="")
    assert report["ok"], report
    assert report["loss_delta"] < 1e-6


def test_host_local_batch_feeds_dp_step():
    """host_local_batch's output drops into the shard_map DP step and
    matches feeding the same batch with shard_batch."""
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models.hubert import HubertConfig
    from edge_diffusion_tts_tpu.parallel import make_mesh, replicate, shard_batch
    from edge_diffusion_tts_tpu.parallel.data_parallel import (
        make_dp_diffusion_step,
    )
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
    from edge_diffusion_tts_tpu.training import (
        Trainer,
        create_train_state,
        init_models,
        make_optimizer,
    )

    cfg = CFG(
        hidden=32, layers=1, heads=2, segment_secs=0.1, batch_size=8,
        grad_accumulation=1, diff_steps=50, max_timestep=48, dropout=0.0,
    )
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=100)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)

    wav = np.random.RandomState(0).randn(8, cfg.segment_len).astype(
        np.float32
    ) * 0.1

    mesh = make_pod_mesh((8,), ("data",))
    step = make_dp_diffusion_step(trainer, mesh)
    with mesh:
        # copies: the jitted step donates its state, and replicate() may
        # alias the incoming buffers
        state = replicate(
            create_train_state(
                cfg,
                jax.tree.map(jnp.array, params),
                jax.tree.map(jnp.array, vq_state),
                tx,
            ),
            mesh,
        )
        batch = host_local_batch({"wav": wav}, mesh)
        assert batch["wav"].shape == (8, cfg.segment_len)
        state, m1 = step(state, batch, jax.random.PRNGKey(1))
    loss1 = float(m1["loss"])

    mesh2 = make_mesh((8, 1))
    step2 = make_dp_diffusion_step(trainer, mesh2)
    with mesh2:
        state2 = replicate(
            create_train_state(
                cfg,
                jax.tree.map(jnp.array, params),
                jax.tree.map(jnp.array, vq_state),
                tx,
            ),
            mesh2,
        )
        state2, m2 = step2(
            state2,
            shard_batch({"wav": jnp.asarray(wav)}, mesh2),
            jax.random.PRNGKey(1),
        )
    # identical batch + rng through either feeding path -> identical loss
    assert abs(loss1 - float(m2["loss"])) < 1e-6
