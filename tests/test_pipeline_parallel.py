"""Pipeline parallelism on the virtual CPU mesh: the staged decoder backbone
and the PP diffusion step must match the single-device computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.models.decoder import (
    EdgeDiffusionDecoder,
    init_decoder_params,
)
from edge_diffusion_tts_tpu.models.hubert import HubertConfig
from edge_diffusion_tts_tpu.parallel import (
    PIPE_AXIS,
    create_pp_state,
    make_pp_backbone,
    make_pp_diffusion_step,
    pp_pack_params,
    pp_unpack_params,
)
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


def pipe_mesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), (PIPE_AXIS,))


def _cfg(layers=4):
    return CFG(
        hidden=32,
        layers=layers,
        heads=2,
        segment_secs=0.1,
        batch_size=8,
        grad_accumulation=1,
        diff_steps=50,
        max_timestep=48,
        dropout=0.0,
        cfg_dropout=0.25,
    )


def test_pack_roundtrip():
    cfg = _cfg()
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    full = {"encoder": {"w": jnp.ones((3,))}, "decoder": params}
    packed = pp_pack_params(full)
    stack_leaf = jax.tree.leaves(packed["decoder"]["pp_stack"])[0]
    assert stack_leaf.shape[0] == cfg.layers
    restored = pp_unpack_params(packed)
    jax.tree.map(
        np.testing.assert_array_equal, restored["decoder"], params
    )


@pytest.mark.parametrize("n_stages,n_mb", [(2, 2), (4, 4)])
def test_pp_backbone_matches_sequential(n_stages, n_mb):
    cfg = _cfg(layers=4)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    from edge_diffusion_tts_tpu.parallel.pipeline_parallel import (
        stack_layer_params,
    )

    stack, _rest = stack_layer_params(params)

    B, T, H, C = 8, 12, cfg.hidden, 6
    k = jax.random.PRNGKey(1)
    h0 = jax.random.normal(k, (B, T, H))
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (B, C, H))
    cond = jax.random.normal(jax.random.fold_in(k, 2), (B, H))

    want = dec.apply(
        {"params": params}, h0, ctx, cond, deterministic=True,
        method=dec.backbone,
    )
    pp_fwd = make_pp_backbone(cfg, pipe_mesh(n_stages), n_mb)
    got = pp_fwd(stack, h0, ctx, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pp_backbone_masked_matches_sequential():
    """Attention key masks (variable-length serving batches) thread through
    the staged backbone: masked PP forward == masked single-device backbone
    on every valid row."""
    cfg = _cfg(layers=4)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    from edge_diffusion_tts_tpu.parallel.pipeline_parallel import (
        stack_layer_params,
    )

    stack, _rest = stack_layer_params(params)

    B, T, H, C = 8, 12, cfg.hidden, 6
    k = jax.random.PRNGKey(1)
    h0 = jax.random.normal(k, (B, T, H))
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (B, C, H))
    cond = jax.random.normal(jax.random.fold_in(k, 2), (B, H))
    rng = np.random.default_rng(0)
    ctx_mask = jnp.asarray(rng.integers(0, 2, (B, C)) > 0).at[:, 0].set(True)
    mel_mask = jnp.asarray(rng.integers(0, 2, (B, T)) > 0).at[:, 0].set(True)

    want = dec.apply(
        {"params": params}, h0, ctx, cond, deterministic=True,
        mel_mask=mel_mask, ctx_mask=ctx_mask, method=dec.backbone,
    )
    pp_fwd = make_pp_backbone(cfg, pipe_mesh(4), 4)
    got = pp_fwd(stack, h0, ctx, cond, mel_mask=mel_mask, ctx_mask=ctx_mask)
    valid = np.asarray(mel_mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5
    )


def test_pp_trainer_masked_decode_matches_plain():
    """PPTrainer._decode on a packed tree accepts sem_mask/mel_mask (the
    serving-batch contract) and matches the unpacked masked decoder."""
    cfg = _cfg(layers=4)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    from edge_diffusion_tts_tpu.parallel.pipeline_parallel import (
        PPTrainer, pp_pack_params,
    )
    from edge_diffusion_tts_tpu.models.hubert import HubertConfig as HC
    from edge_diffusion_tts_tpu.models import SemanticEncoder

    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=10)
    enc = SemanticEncoder(cfg, HC.tiny())
    trainer = PPTrainer(cfg, enc, dec, schedule, tx, pipe_mesh(4), 4)

    B, S = 4, 6
    T = 2 * S
    rng = np.random.default_rng(1)
    x_t = jnp.asarray(rng.standard_normal((B, T, cfg.n_mels)), jnp.float32)
    t = jnp.asarray(rng.integers(1, cfg.diff_steps, (B,)), jnp.int32)
    sem = jnp.asarray(
        rng.integers(0, cfg.effective_codebook_size(), (B, S)), jnp.int32
    )
    sem_mask = jnp.asarray(rng.integers(0, 2, (B, S)) > 0).at[:, 0].set(True)
    mel_mask = jnp.repeat(sem_mask, 2, axis=1)

    ref = dec.apply(
        {"params": params}, x_t, t, sem_idx=sem,
        sem_mask=sem_mask, mel_mask=mel_mask,
    )
    packed = pp_pack_params({"decoder": params})["decoder"]
    got = trainer._decode(
        packed, x_t, t, sem_idx=sem, sem_mask=sem_mask, mel_mask=mel_mask
    )
    valid = np.asarray(mel_mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(ref)[valid], atol=2e-5
    )


def test_pp_backbone_grads_match():
    """Gradients flow back through ppermute/psum identically to the
    sequential backbone (the transpose of the pipeline schedule)."""
    cfg = _cfg(layers=4)
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, jax.random.PRNGKey(0), cfg)["params"]
    from edge_diffusion_tts_tpu.parallel.pipeline_parallel import (
        stack_layer_params,
        unstack_layer_params,
    )

    stack, rest = stack_layer_params(params)
    B, T, H, C = 4, 10, cfg.hidden, 5
    k = jax.random.PRNGKey(3)
    h0 = jax.random.normal(k, (B, T, H))
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (B, C, H))
    cond = jax.random.normal(jax.random.fold_in(k, 2), (B, H))

    def seq_loss(layer_params):
        full = dict(rest)
        full.update(layer_params)
        out = dec.apply(
            {"params": full}, h0, ctx, cond, deterministic=True,
            method=dec.backbone,
        )
        return jnp.sum(out * out)

    layer_params = {k_: params[k_] for k_ in params if k_.startswith("layers_")}
    want = jax.grad(seq_loss)(layer_params)

    pp_fwd = make_pp_backbone(cfg, pipe_mesh(4), 2)

    def pp_loss(stack):
        out = pp_fwd(stack, h0, ctx, cond)
        return jnp.sum(out * out)

    got_stack = jax.grad(pp_loss)(stack)
    got = unstack_layer_params(got_stack, {})
    for name in want:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4
            ),
            got[name],
            want[name],
        )


def test_dp_pp_step_matches_single_device():
    """2D (data=2, pipe=4) mesh: batch shards over data, layers over pipe;
    one composed step still matches the single-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = _cfg(layers=4)
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=100)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)

    wav = jax.random.normal(
        jax.random.PRNGKey(5), (cfg.batch_size, cfg.segment_len)
    ) * 0.1
    step_rng = jax.random.PRNGKey(7)

    params_sd = jax.tree.map(jnp.array, params)
    vq_sd = jax.tree.map(jnp.array, vq_state)
    state = create_train_state(cfg, params_sd, vq_sd, tx)
    state1, m1 = trainer.make_diffusion_step()(state, {"wav": wav}, step_rng)

    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("data", PIPE_AXIS)
    )
    pp_state = create_pp_state(cfg, params, vq_state, tx, mesh)
    pp_step = make_pp_diffusion_step(
        trainer, mesh, num_microbatches=2, data_axis="data"
    )
    batch = {"wav": jax.device_put(wav, NamedSharding(mesh, P("data")))}
    pp_state1, m2 = pp_step(pp_state, batch, step_rng)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    got = pp_unpack_params(jax.device_get(pp_state1.params))
    want = jax.device_get(state1.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        got["decoder"],
        want["decoder"],
    )


def test_pp_step_matches_single_device():
    cfg = _cfg(layers=4)
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=100)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)

    batch = {
        "wav": jax.random.normal(
            jax.random.PRNGKey(5), (cfg.batch_size, cfg.segment_len)
        )
        * 0.1
    }
    step_rng = jax.random.PRNGKey(7)

    # single device (copy the trees: both steps donate their state, and the
    # packed pp state shares the encoder/rest buffers otherwise)
    params_sd = jax.tree.map(jnp.array, params)
    vq_sd = jax.tree.map(jnp.array, vq_state)
    state = create_train_state(cfg, params_sd, vq_sd, tx)
    ref_step = trainer.make_diffusion_step()
    state1, m1 = ref_step(state, batch, step_rng)

    # pipelined over 4 stages, 4 microbatches
    mesh = pipe_mesh(4)
    pp_state = create_pp_state(cfg, params, vq_state, tx, mesh)
    pp_step = make_pp_diffusion_step(trainer, mesh, num_microbatches=4)
    pp_state1, m2 = pp_step(pp_state, batch, step_rng)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    assert abs(float(m1["grad_norm"]) - float(m2["grad_norm"])) < 1e-4

    got = pp_unpack_params(jax.device_get(pp_state1.params))
    want = jax.device_get(state1.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        got["decoder"],
        want["decoder"],
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        got["encoder"],
        want["encoder"],
    )


def test_train_driver_pipeline(tmp_path):
    """cfg.pipeline_stages routes the whole 3-phase driver through the
    PPTrainer; the final model is saved in canonical layout and loads into
    EdgeInference."""
    import os

    from edge_diffusion_tts_tpu.training import train
    from edge_diffusion_tts_tpu.training.checkpoint import restore_final_model

    cfg = CFG(
        hidden=32, layers=2, heads=2, segment_secs=0.1, batch_size=2,
        grad_accumulation=1, diff_steps=8, max_timestep=7,
        progressive_target_steps=4, diffusion_epochs=1,
        progressive_epochs_per_halving=1, consistency_epochs=1,
        dropout=0.0, out_dir=str(tmp_path), val_batches=1,
        log_every_steps=1, pipeline_stages=2, pipeline_microbatches=2,
    )
    wavs = (
        np.random.RandomState(0)
        .randn(2, cfg.batch_size, cfg.segment_len)
        .astype(np.float32)
        * 0.1
    )
    loader = [{"wav": w} for w in wavs]
    state = train(
        cfg, train_loader=loader, val_loader=loader[:1],
        hubert_cfg=HubertConfig.tiny(),
        phases=["diffusion", "progressive", "consistency"],
    )
    assert int(state.step) == 6
    assert "pp_stack" in state.params["decoder"]  # packed during training
    run_dir = cfg.get_run_dir()
    params, _rcfg = restore_final_model(
        os.path.join(run_dir, "edge_model_final")
    )
    # canonical layout on disk
    assert "layers_0" in params["decoder"] and "pp_stack" not in params["decoder"]


def test_pp_distillation_phases_match_single_device():
    """PPTrainer pipelines phases 2 and 3 (incl. the EMA teacher decode and
    validation) through the same _decode override — compare one progressive
    and one consistency step, plus the DPM++ validate fn, vs single device."""
    from edge_diffusion_tts_tpu.parallel import make_pp_trainer

    cfg = _cfg(layers=4)
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=100)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)
    mesh = pipe_mesh(4)
    ppt = make_pp_trainer(trainer, mesh, num_microbatches=2)

    wav = jax.random.normal(
        jax.random.PRNGKey(5), (cfg.batch_size, cfg.segment_len)
    ) * 0.1
    step_rng = jax.random.PRNGKey(7)

    # progressive (exact two-step-teacher objective exercises the teacher
    # decode through the pipeline twice)
    state = create_train_state(
        cfg, jax.tree.map(jnp.array, params), jax.tree.map(jnp.array, vq_state),
        tx,
    ).with_teacher()
    s1, m1 = trainer.make_progressive_step(num_steps=4, exact=True)(
        state, {"wav": wav}, step_rng
    )

    pp_state = create_pp_state(cfg, params, vq_state, tx, mesh).with_teacher()
    s2, m2 = ppt.make_progressive_step(num_steps=4, exact=True)(
        pp_state, {"wav": wav}, step_rng
    )
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5

    # consistency step continues from the updated states
    s1b, c1 = trainer.make_consistency_step(exact=True)(
        s1, {"wav": wav}, jax.random.PRNGKey(9)
    )
    s2b, c2 = ppt.make_consistency_step(exact=True)(
        s2, {"wav": wav}, jax.random.PRNGKey(9)
    )
    assert abs(float(c1["loss"]) - float(c2["loss"])) < 1e-5

    got = pp_unpack_params(jax.device_get(s2b.params))
    want = jax.device_get(s1b.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        got["decoder"],
        want["decoder"],
    )

    # validation (4-step DPM++) pipelines too
    v1 = trainer.make_validate_fn(num_steps=2)(
        want, jax.device_get(s1b.vq_state), {"wav": wav[:4]},
        jax.random.PRNGKey(11),
    )
    v2 = ppt.make_validate_fn(num_steps=2)(
        jax.device_get(s2b.params), jax.device_get(s2b.vq_state),
        {"wav": wav[:4]}, jax.random.PRNGKey(11),
    )
    assert abs(float(v1["val_cos"]) - float(v2["val_cos"])) < 1e-4
