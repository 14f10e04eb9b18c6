"""Training subsystem: all three phase steps, optimizer masking, EMA,
checkpoint round-trip, LR schedule, and a 3-phase smoke train run."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.models.hubert import HubertConfig
from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
from edge_diffusion_tts_tpu.training import (
    Trainer,
    create_train_state,
    ema_update,
    init_models,
    make_optimizer,
    progressive_step_schedule,
    restore_checkpoint,
    save_checkpoint,
)


# Long-running lane: excluded from `pytest -m 'not slow'` (CLAUDE.md).
pytestmark = pytest.mark.slow


def tiny_cfg(**kw):
    defaults = dict(
        hidden=32,
        layers=1,
        heads=2,
        segment_secs=0.1,
        batch_size=2,
        grad_accumulation=1,
        diff_steps=50,
        max_timestep=48,
        diffusion_epochs=1,
        progressive_epochs_per_halving=1,
        consistency_epochs=1,
        dropout=0.0,
    )
    defaults.update(kw)
    return CFG(**defaults)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=100)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)
    state = create_train_state(cfg, params, vq_state, tx)
    batch = {
        "wav": jnp.asarray(
            np.random.RandomState(0)
            .randn(cfg.batch_size, cfg.segment_len)
            .astype(np.float32)
            * 0.1
        )
    }
    return cfg, trainer, state, batch


def test_diffusion_step_decreases_loss(setup):
    cfg, trainer, state, batch = setup
    step = trainer.make_diffusion_step()
    rng = jax.random.PRNGKey(1)
    state = jax.tree.map(jnp.copy, state)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.fold_in(rng, 0))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert np.isfinite(losses).all()
    # Same batch + same rng every step: loss must drop as params learn it.
    assert losses[-1] < losses[0]


def test_hubert_params_frozen(setup):
    cfg, trainer, state, batch = setup
    step = trainer.make_diffusion_step()
    state = jax.tree.map(jnp.copy, state)
    before = jax.tree.map(np.asarray, state.params["encoder"]["hubert"])
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    after = state.params["encoder"]["hubert"]
    leaves_b = jax.tree.leaves(before)
    leaves_a = jax.tree.leaves(after)
    for b, a in zip(leaves_b, leaves_a):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_progressive_step_with_teacher(setup):
    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state).with_teacher()
    step = trainer.make_progressive_step(num_steps=4)
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # teacher must have moved toward the updated student (EMA)
    t_leaf = np.asarray(jax.tree.leaves(state.teacher)[0])
    s_leaf = np.asarray(jax.tree.leaves(state.params["decoder"])[0])
    assert t_leaf.shape == s_leaf.shape


def test_exact_progressive_distillation(setup):
    """Two-step-teacher PD: loss is NONZERO at teacher re-init (unlike the
    reference's same-t objective, which starts at exactly 0) and decreases."""
    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state).with_teacher()
    step = trainer.make_progressive_step(num_steps=4, exact=True)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(70))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[0] > 1e-4, "exact PD must have signal at teacher init"
    assert losses[-1] < losses[0]


def test_consistency_step(setup):
    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state)
    step = trainer.make_consistency_step()
    state, metrics = step(state, batch, jax.random.PRNGKey(4))
    for k in ("loss", "consistency_loss", "recon_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_progressive_large_step_count_no_nan(setup):
    """Regression: step indices beyond the 16-entry step_emb table must clamp
    (the reference hard-crashes here; flax Embed OOB gathers fill NaN)."""
    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state).with_teacher()
    step = trainer.make_progressive_step(num_steps=25)  # > MAX_STEP_EMB
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(50 + i))
        assert np.isfinite(float(metrics["loss"])), i


def test_exact_consistency_step(setup):
    """Adjacent-timestep EMA-teacher consistency: finite, has signal, and
    the teacher EMA-updates each step."""
    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state).with_teacher()
    step = trainer.make_consistency_step(exact=True, ema_decay=0.9)
    t0 = np.asarray(jax.tree.leaves(state.teacher)[0]).copy()
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(80 + i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    t1 = np.asarray(jax.tree.leaves(state.teacher)[0])
    assert not np.array_equal(t0, t1), "teacher must EMA-update"


def test_validate_fn(setup):
    cfg, trainer, state, batch = setup
    validate = trainer.make_validate_fn(num_steps=2)
    m = validate(state.params, state.vq_state, batch, jax.random.PRNGKey(5))
    assert -1.0 <= float(m["val_cos"]) <= 1.0
    assert np.isfinite(float(m["val_mse"]))


def test_ema_update_moves_toward_student():
    teacher = {"w": jnp.zeros(3)}
    student = {"w": jnp.ones(3)}
    out = ema_update(teacher, student, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, atol=1e-6)


def test_progressive_step_schedule():
    assert progressive_step_schedule(1000, 4) == [500, 250, 125, 62, 31, 15, 7, 4]
    assert progressive_step_schedule(8, 4) == [4]
    assert progressive_step_schedule(4, 4) == []


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state)
    step = trainer.make_diffusion_step()
    state, _ = step(state, batch, jax.random.PRNGKey(6))
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, state, cfg, {"note": "test"})
    restored, cfg2, meta = restore_checkpoint(path, state)
    assert int(restored.step) == int(state.step)
    assert meta["note"] == "test"
    assert cfg2.hidden == cfg.hidden
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_frozen_host_substitution(setup, tmp_path):
    """save_checkpoint(frozen_host=...) writes the host copy of the frozen
    HuBERT subtree in place of the device copy (skipping the big D2H fetch)
    without changing the on-disk format, values, or the caller's state."""
    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state)
    frozen_host = jax.device_get(state.params["encoder"]["hubert"])
    path = os.path.join(str(tmp_path), "ckpt_frozen")
    save_checkpoint(path, state, cfg, {"note": "frozen"},
                    frozen_host=frozen_host)
    # Caller's tree untouched (substitution must shallow-copy, not mutate).
    assert not isinstance(
        jax.tree.leaves(state.params["encoder"]["hubert"])[0], np.ndarray
    )
    restored, _, meta = restore_checkpoint(path, state)
    assert meta["note"] == "frozen"
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_teacher_arity_mismatch(setup, tmp_path):
    """Regression: a checkpoint saved WITH an EMA teacher (mid-distillation)
    must restore into a fresh teacher-less template, and vice versa."""
    cfg, trainer, state, batch = setup
    with_t = jax.tree.map(jnp.copy, state).with_teacher()
    path = os.path.join(str(tmp_path), "ckpt_t")
    save_checkpoint(path, with_t, cfg, {})
    restored, _, _ = restore_checkpoint(path, jax.tree.map(jnp.copy, state))
    assert restored.teacher is not None

    path2 = os.path.join(str(tmp_path), "ckpt_not")
    save_checkpoint(path2, jax.tree.map(jnp.copy, state), cfg, {})
    restored2, _, _ = restore_checkpoint(path2, with_t)
    assert restored2.teacher is None


def test_grad_accumulation_multisteps():
    cfg = tiny_cfg(grad_accumulation=2)
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=100)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)
    state = create_train_state(cfg, params, vq_state, tx)
    step = trainer.make_diffusion_step()
    batch = {"wav": jnp.zeros((cfg.batch_size, cfg.segment_len), jnp.float32)}
    p0 = np.asarray(state.params["decoder"]["out_proj"]["kernel"])
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    # First micro-step accumulates only: params unchanged.
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder"]["out_proj"]["kernel"]), p0
    )
    # Micro-steps 2-4: the inner optimizer applies at steps 2 and 4 (the
    # first inner update is a no-op because warmup LR starts at 0).
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(2 + i))
    assert not np.array_equal(
        np.asarray(state.params["decoder"]["out_proj"]["kernel"]), p0
    )


def test_auto_resume(tmp_path):
    """Crash-restart semantics: resume='auto' picks up checkpoint_latest and
    continues from the recorded step (incl. optimizer state)."""
    from edge_diffusion_tts_tpu.training import train

    cfg = tiny_cfg(
        diff_steps=8, max_timestep=7, out_dir=str(tmp_path),
        ckpt_every_steps=1, val_batches=0, plot_every_steps=0,
    )
    loader = [
        {"wav": np.zeros((cfg.batch_size, cfg.segment_len), np.float32)}
        for _ in range(2)
    ]
    state1 = train(cfg, train_loader=loader, val_loader=None,
                   hubert_cfg=HubertConfig.tiny(), phases=["diffusion"])
    assert int(state1.step) == 2

    cfg2 = tiny_cfg(
        diff_steps=8, max_timestep=7, out_dir=str(tmp_path),
        ckpt_every_steps=1, val_batches=0, plot_every_steps=0,
        diffusion_epochs=2,
    )
    state2 = train(cfg2, train_loader=loader, val_loader=None,
                   hubert_cfg=HubertConfig.tiny(), phases=["diffusion"],
                   resume="auto")
    # resumed at step 2 and ran 2 more epochs x 2 steps
    assert int(state2.step) == 6


def test_mid_epoch_eval_best_checkpoint(tmp_path):
    """val_every_steps wiring: every N steps the epsilon-MSE eval runs on val
    batches, writes eval/val_eps_mse, and checkpoints best_diffusion on the
    lowest eval loss (reference: train.py:190-199)."""
    import json

    from edge_diffusion_tts_tpu.training import train

    cfg = tiny_cfg(
        diff_steps=8, max_timestep=7, out_dir=str(tmp_path),
        val_every_steps=2, val_batches=1, plot_every_steps=0,
        ckpt_every_steps=0, log_every_steps=1, diffusion_epochs=2,
    )
    wavs = (
        np.random.RandomState(3)
        .randn(2, cfg.batch_size, cfg.segment_len)
        .astype(np.float32)
        * 0.1
    )
    loader = [{"wav": w} for w in wavs]
    train(cfg, train_loader=loader, val_loader=loader[:1],
          hubert_cfg=HubertConfig.tiny(), phases=["diffusion"])
    run_dir = cfg.get_run_dir()
    assert os.path.isdir(os.path.join(run_dir, "best_diffusion"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    eval_rows = [l for l in lines if "eval/val_eps_mse" in l]
    # 4 steps total, cadence 2 -> evals at steps 2 and 4
    assert len(eval_rows) == 2
    assert all(np.isfinite(r["eval/val_eps_mse"]) for r in eval_rows)


def test_consistency_weight_scales_loss(setup):
    """cfg.consistency_weight wiring: the phase-3 consistency term scales."""
    cfg, trainer, state, batch = setup
    rng = jax.random.PRNGKey(11)
    loss1 = trainer.make_consistency_loss(vq_weight=0.0, consistency_weight=1.0)
    loss3 = trainer.make_consistency_loss(vq_weight=0.0, consistency_weight=3.0)
    l1, (_, m1) = loss1(state.params, state.vq_state, batch, rng)
    l3, (_, m3) = loss3(state.params, state.vq_state, batch, rng)
    c = float(m1["consistency_loss"])
    np.testing.assert_allclose(
        float(l3) - float(l1), 2.0 * c, rtol=1e-5, atol=1e-7
    )


def test_training_dynamics_regression(tmp_path):
    """Seed-fixed tiny 3-phase run on a synthetic harmonic corpus: the model
    must LEARN (val_cos improves over init) and the consistency phase must
    make 1-step generation competitive with 4-step (the property the
    on-device soak showed at scale: 1-step cos 0.50 vs 4-step 0.33 after
    1,650 steps — README 'Validated training dynamics')."""
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
    from edge_diffusion_tts_tpu.training import train

    cfg = tiny_cfg(
        diff_steps=8, max_timestep=7, progressive_target_steps=4,
        batch_size=4, diffusion_epochs=10, progressive_epochs_per_halving=2,
        consistency_epochs=8, out_dir=str(tmp_path), val_batches=0,
        plot_every_steps=0, val_every_steps=0, ckpt_every_steps=0,
        lr=2e-3, cfg_dropout=0.0, seed=0,
    )
    # Harmonic pseudo-speech: per-utterance fundamental + harmonics with an
    # amplitude envelope; 4 fixed utterances seen every epoch.
    rs = np.random.RandomState(0)
    t_ax = np.arange(cfg.segment_len) / cfg.sample_rate
    wavs = []
    for i in range(cfg.batch_size):
        f0 = 110.0 * (i + 1)
        sig = sum(
            (0.5 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t_ax + rs.rand())
            for k in range(3)
        )
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t_ax + rs.rand())
        wavs.append((0.2 * env * sig).astype(np.float32))
    batch = {"wav": np.stack(wavs)}
    loader = [batch, batch]

    state = train(
        cfg, train_loader=loader, val_loader=None,
        hubert_cfg=HubertConfig.tiny(),
        phases=["diffusion", "progressive", "consistency"],
    )

    # Score with the same validate fn the driver uses (DPM++ cosine to GT).
    from edge_diffusion_tts_tpu.training import Trainer, make_optimizer

    encoder, decoder, params0, vq0 = init_models(
        CFG.from_dict(cfg.to_dict()), jax.random.PRNGKey(0),
        hubert_cfg=HubertConfig.tiny(),
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    trainer = Trainer(cfg, encoder, decoder, schedule,
                      make_optimizer(cfg, 10))
    dev_batch = {"wav": jnp.asarray(batch["wav"])}
    rng = jax.random.PRNGKey(42)
    val4 = trainer.make_validate_fn(num_steps=4)
    val1 = trainer.make_validate_fn(num_steps=1)
    cos_init = float(
        val4(params0, vq0, dev_batch, rng)["val_cos"]
    )
    cos4 = float(val4(state.params, state.vq_state, dev_batch, rng)["val_cos"])
    cos1 = float(val1(state.params, state.vq_state, dev_batch, rng)["val_cos"])

    assert cos4 > cos_init + 0.05, (cos_init, cos4)
    # Consistency training keeps 1-step within striking distance of 4-step
    # (at full scale it ends BEST; at this toy scale allow a small margin).
    assert cos1 > cos4 - 0.1, (cos1, cos4)
    assert cos1 > cos_init, (cos_init, cos1)


def test_train_driver_smoke(tmp_path):
    """End-to-end 3-phase driver on synthetic data (1 epoch each, tiny)."""
    from edge_diffusion_tts_tpu.training import train

    cfg = tiny_cfg(
        diff_steps=8,
        max_timestep=7,
        progressive_target_steps=4,
        out_dir=str(tmp_path),
        val_batches=1,
        log_every_steps=1,
    )

    wavs = (
        np.random.RandomState(0)
        .randn(2, cfg.batch_size, cfg.segment_len)
        .astype(np.float32)
        * 0.1
    )
    loader = [{"wav": w} for w in wavs]

    from edge_diffusion_tts_tpu.models.hubert import HubertConfig

    state = train(
        cfg,
        train_loader=loader,
        val_loader=loader[:1],
        hubert_cfg=HubertConfig.tiny(),
        phases=["diffusion", "progressive", "consistency"],
    )
    # 1 diffusion epoch (2 steps) + 1 halving x 1 epoch (2) + 1 consistency (2)
    assert int(state.step) == 6
    run_dir = cfg.get_run_dir()
    assert os.path.isdir(os.path.join(run_dir, "checkpoint_phase1"))
    assert os.path.isdir(os.path.join(run_dir, "checkpoint_phase2"))
    assert os.path.isdir(os.path.join(run_dir, "edge_model_final"))
    assert os.path.isfile(os.path.join(run_dir, "metrics.jsonl"))


def test_lr_consistency_wired(tmp_path):
    """Distillation phases step at cfg.lr_consistency (reference
    train.py:224-225 drops the optimizer LR before the progressive loop).
    With lr_consistency=0.0 the progressive phase must leave the decoder
    untouched; with a real LR it must move it."""
    from edge_diffusion_tts_tpu.training import train

    loader = [
        {
            "wav": 0.1
            * np.random.RandomState(0).randn(2, 32000).astype(np.float32)[:, :960]
        }
    ]

    def run(lr_c, phases, sub):
        cfg = tiny_cfg(
            diff_steps=8, max_timestep=7, out_dir=str(tmp_path / sub),
            ckpt_every_steps=0, val_batches=0, plot_every_steps=0,
            lr_consistency=lr_c,
        )
        batch = [{"wav": loader[0]["wav"][:, : cfg.segment_len]}]
        return train(cfg, train_loader=batch, val_loader=None,
                     hubert_cfg=HubertConfig.tiny(), phases=phases)

    init_state = run(0.0, [], "init")
    frozen = run(0.0, ["progressive"], "frozen")
    for a, b in zip(
        jax.tree.leaves(init_state.params["decoder"]),
        jax.tree.leaves(frozen.params["decoder"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    moved = run(1e-3, ["progressive"], "moved")
    deltas = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(init_state.params["decoder"]),
            jax.tree.leaves(moved.params["decoder"]),
        )
    ]
    assert max(deltas) > 0.0, "progressive phase at lr_consistency>0 must train"


def test_param_dtype_bf16():
    """cfg.param_dtype='bfloat16' stores and optimizes the param tree in bf16
    (flax promotes to compute_dtype at apply time) and a train step runs."""
    cfg = tiny_cfg(param_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    for leaf in jax.tree.leaves(params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16, leaf.dtype
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=10)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)
    state = create_train_state(cfg, params, vq_state, tx)
    batch = {
        "wav": jnp.asarray(
            np.random.RandomState(0)
            .randn(cfg.batch_size, cfg.segment_len)
            .astype(np.float32)
            * 0.1
        )
    }
    step = trainer.make_diffusion_step()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params remain bf16 after the update
    dec_leaf = jax.tree.leaves(state.params["decoder"])[0]
    assert dec_leaf.dtype == jnp.bfloat16


def test_token_align_trains_token_emb():
    """Phase 1 conditions through sem_features, but inference/serving use
    sem_idx/token_emb — the token-alignment aux loss must give token_emb a
    gradient during phase 1 (and weight 0 must restore the pure v2 loss)."""
    def run(weight):
        cfg = tiny_cfg(token_align_weight=weight)
        rng = jax.random.PRNGKey(0)
        encoder, decoder, params, vq_state = init_models(
            cfg, rng, hubert_cfg=HubertConfig.tiny()
        )
        schedule = DiffusionSchedule.create(cfg.diff_steps)
        tx = make_optimizer(cfg, total_steps=10)
        trainer = Trainer(cfg, encoder, decoder, schedule, tx)
        state = create_train_state(cfg, params, vq_state, tx)
        step = trainer.make_diffusion_step()
        batch = {
            "wav": jnp.asarray(
                np.random.RandomState(0)
                .randn(cfg.batch_size, cfg.segment_len)
                .astype(np.float32) * 0.1
            )
        }
        tok0 = np.asarray(params["decoder"]["token_emb"]["embedding"]).copy()
        for i in range(3):  # warmup LR is 0 at the very first update
            state, metrics = step(state, batch, jax.random.PRNGKey(1 + i))
        tok1 = np.asarray(state.params["decoder"]["token_emb"]["embedding"])
        # exclude AdamW weight decay as the only mover: decay shrinks norms
        # multiplicatively; compare against the decayed-only trajectory by
        # checking the DIRECTION of movement is not purely radial.
        moved = float(np.abs(tok1 - tok0).max())
        return moved, float(metrics["align_loss"])

    moved_on, align_on = run(0.1)
    moved_off, align_off = run(0.0)
    assert align_on > 0.0
    assert align_off == 0.0
    # With the aux loss, token_emb moves substantially more than the pure
    # weight-decay drift of the disabled run.
    assert moved_on > 3.0 * max(moved_off, 1e-9), (moved_on, moved_off)


def test_teacher_ema_only_on_optimizer_updates():
    """Under grad accumulation the teacher must EMA once per OPTIMIZER update
    (reference: teacher update after optimizer.step), not once per data step
    — decay 0.999 applied 8x per update would weaken the teacher."""
    cfg = tiny_cfg(grad_accumulation=2)
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=10, base_lr=0.0)  # freeze student
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)
    state = create_train_state(cfg, params, vq_state, tx).with_teacher()
    # Make the teacher differ from the student so EMA movement is visible.
    import jax as _jax
    state = state.replace(
        teacher=_jax.tree.map(lambda t: t + 1.0, state.teacher)
    )
    step = trainer.make_progressive_step(num_steps=4, ema_decay=0.9)
    batch = {
        "wav": jnp.asarray(
            np.random.RandomState(0)
            .randn(cfg.batch_size, cfg.segment_len)
            .astype(np.float32) * 0.1
        )
    }
    t0 = np.asarray(jax.tree.leaves(state.teacher)[0]).copy()
    # Data step 1: accumulation only (mini_step 0 -> 1): teacher frozen.
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    t1 = np.asarray(jax.tree.leaves(state.teacher)[0])
    np.testing.assert_array_equal(t1, t0)
    # Data step 2: optimizer update applied: teacher EMAs once.
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    t2 = np.asarray(jax.tree.leaves(state.teacher)[0])
    assert np.abs(t2 - t0).max() > 1e-6


def test_lr_horizon_counts_optimizer_updates(tmp_path):
    """train() sizes the warmup/cosine horizon in OPTIMIZER updates: with
    grad_accumulation=k the schedule must reach its end after N/k updates,
    not stall at 1/k progress (MultiSteps advances once per k data steps)."""
    from edge_diffusion_tts_tpu.training import train

    cfg = tiny_cfg(
        diff_steps=8, max_timestep=7, out_dir=str(tmp_path),
        grad_accumulation=2, batch_size=2, val_batches=0,
        plot_every_steps=0, ckpt_every_steps=0, diffusion_epochs=2,
    )
    loader = [
        {"wav": np.random.RandomState(i)
         .randn(cfg.batch_size, cfg.segment_len).astype(np.float32) * 0.1}
        for i in range(2)
    ]
    state = train(cfg, train_loader=loader, val_loader=None,
                  hubert_cfg=HubertConfig.tiny(), phases=["diffusion"])
    # 2 epochs x 2 steps = 4 data steps -> 2 optimizer updates
    opt = state.opt_state
    assert int(opt.gradient_step) == 2
    # The optimizer was built with a 2-update horizon (4 data steps / k=2):
    # reconstruct the schedule and check it decayed to ~end_value by then.
    from edge_diffusion_tts_tpu.training.state import make_lr_schedule
    sched = make_lr_schedule(cfg, 2)
    assert float(sched(2)) < float(sched(1)) or float(sched(2)) <= 1e-6


def test_resume_skips_completed_phases(tmp_path):
    """resume='auto' from a phase-3 periodic checkpoint must NOT replay
    phases 1-2 (that would put the distilled student back through
    full-schedule diffusion training); it restarts phase 3 only."""
    from edge_diffusion_tts_tpu.training import train

    common = dict(
        diff_steps=8, max_timestep=7, progressive_target_steps=4,
        val_batches=0, plot_every_steps=0, ckpt_every_steps=1,
        log_every_steps=1,
    )
    cfg = tiny_cfg(out_dir=str(tmp_path), **common)
    loader = [
        {"wav": np.zeros((cfg.batch_size, cfg.segment_len), np.float32)}
        for _ in range(2)
    ]
    tags1 = []
    state1 = train(cfg, train_loader=loader, val_loader=None,
                   hubert_cfg=HubertConfig.tiny(),
                   phases=["diffusion", "progressive", "consistency"],
                   phase_end_hook=lambda tag, st: tags1.append(tag))
    # 1 diffusion epoch (2) + 1 halving (2) + 1 consistency epoch (2)
    assert int(state1.step) == 6
    assert tags1[0] == "init" and "diffusion" in tags1

    tags2 = []
    cfg2 = tiny_cfg(out_dir=str(tmp_path), **common)
    state2 = train(cfg2, train_loader=loader, val_loader=None,
                   hubert_cfg=HubertConfig.tiny(),
                   phases=["diffusion", "progressive", "consistency"],
                   resume="auto",
                   phase_end_hook=lambda tag, st: tags2.append(tag))
    # The last periodic checkpoint was written during phase 3 (step 6):
    # phases 1-2 skip, phase 3 replays from its start -> exactly +2 steps.
    assert int(state2.step) == 8
    # A resumed run must not score restored params under the "init" tag
    # (it is the random-init baseline row in soak artifacts), and skipped
    # phases must not fire.
    assert "init" not in tags2 and "diffusion" not in tags2
    assert "consistency" in tags2


def test_final_model_carries_vq_codebook(tmp_path):
    """use_fsq=False checkpoints must carry the trained VQ codebook (the
    flax vq_state collection) — audio->token encoding through a fresh
    random-init codebook would be meaningless — and encoder_variables must
    assemble the apply dict that uses it."""
    from edge_diffusion_tts_tpu.training.checkpoint import (
        encoder_variables,
        restore_final_model,
        save_final_model,
    )

    cfg = tiny_cfg(use_fsq=False, codebook_size=16)
    rng = jax.random.PRNGKey(0)
    encoder, decoder, params, vq_state = init_models(
        cfg, rng, hubert_cfg=HubertConfig.tiny()
    )
    # Make the codebook distinguishable from a fresh init.
    vq_state = jax.tree.map(lambda x: x, vq_state)
    cb = vq_state["encoder"]["vq"]["codebook"] + 7.0
    vq_state["encoder"]["vq"]["codebook"] = cb

    path = str(tmp_path / "final_vq")
    save_final_model(path, params, cfg, vq_state=vq_state)
    params2, cfg2 = restore_final_model(path)
    variables = encoder_variables(params2)
    assert "vq_state" in variables
    np.testing.assert_allclose(
        np.asarray(variables["vq_state"]["vq"]["codebook"]), np.asarray(cb)
    )
    wav = jnp.asarray(
        np.random.RandomState(0).randn(1, cfg.segment_len).astype(np.float32)
        * 0.1
    )
    toks = encoder.apply(variables, wav, method=encoder.encode)
    assert toks.shape[0] == 1 and int(toks.max()) < 16

    # FSQ checkpoints carry no vq_state and the helper stays params-only.
    cfg_f = tiny_cfg(use_fsq=True)
    enc_f, _, params_f, _ = init_models(
        cfg_f, rng, hubert_cfg=HubertConfig.tiny()
    )
    path2 = str(tmp_path / "final_fsq")
    save_final_model(path2, params_f, cfg_f)
    params3, _ = restore_final_model(path2)
    assert "vq_state" not in encoder_variables(params3)


def test_checkpoint_records_hubert_architecture(setup, tmp_path):
    """Checkpoints record the encoder's HuBERT architecture (hubert.json) so
    consumers that rebuild the SemanticEncoder (serve --longform, longform,
    demo) restore the right module instead of assuming full-size; artifacts
    predating the file fall back to the full-size default."""
    from edge_diffusion_tts_tpu.training.checkpoint import (
        restore_hubert_config,
        save_checkpoint,
        save_final_model,
    )

    cfg, trainer, state, batch = setup
    hc = HubertConfig.tiny()

    fpath = str(tmp_path / "final")
    save_final_model(fpath, {"decoder": {}, "encoder": {}}, cfg, hubert_cfg=hc)
    assert restore_hubert_config(fpath) == hc

    cpath = str(tmp_path / "ckpt")
    save_checkpoint(cpath, jax.tree.map(jnp.copy, state), cfg, hubert_cfg=hc)
    assert restore_hubert_config(cpath) == hc

    # Legacy artifact without hubert.json -> full-size default.
    legacy = str(tmp_path / "legacy")
    save_final_model(legacy, {"decoder": {}, "encoder": {}}, cfg)
    assert restore_hubert_config(legacy) == HubertConfig()


def test_checkpoint_atomic_save_stale_fallback(setup, tmp_path):
    """Periodic saves swap atomically; a crash between the two renames
    leaves only <path>.stale complete, and restore/auto-resume must resolve
    it instead of dying on a missing or half-written checkpoint."""
    from edge_diffusion_tts_tpu.training.checkpoint import (
        resolve_checkpoint_dir,
    )

    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state)
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, state, cfg, {"step": 7, "phase": "diffusion"})
    assert resolve_checkpoint_dir(path) == path

    # Crash window: old checkpoint already moved aside, new one not yet in
    # place (only .stale is complete). Also leave a half-written .tmp.
    os.rename(path, path + ".stale")
    os.makedirs(os.path.join(path + ".tmp", "state"), exist_ok=True)
    assert resolve_checkpoint_dir(path) == path + ".stale"
    restored, _, meta = restore_checkpoint(path, state)
    assert int(restored.step) == int(state.step)
    assert meta["step"] == 7 and meta["phase"] == "diffusion"

    # A fresh save over the crash debris swaps cleanly.
    save_checkpoint(path, state, cfg, {"step": 8})
    assert resolve_checkpoint_dir(path) == path
    assert not os.path.exists(path + ".stale")
    _, _, meta2 = restore_checkpoint(path, state)
    assert meta2["step"] == 8


# -- chained multi-step dispatch (Trainer.make_chained_step) ------------------


def test_chained_step_matches_single_steps(setup):
    """K chained steps (one program, on-device gathering) must land on the
    same state as K single-step dispatches given the same per-step rngs and
    the same gathered batches."""
    cfg, trainer, state, batch = setup
    n_rows = 6
    wavs = (
        np.random.RandomState(7)
        .randn(n_rows, cfg.segment_len)
        .astype(np.float32)
        * 0.1
    )
    corpus = {"wav": jnp.asarray(wavs)}
    K = 4
    idx = np.random.RandomState(8).randint(
        0, n_rows, size=(K, cfg.batch_size)
    ).astype(np.int32)
    rng = jax.random.PRNGKey(11)
    rngs = jax.random.split(rng, K)

    chained = trainer.make_chained_step(kind="diffusion")
    st_c, stacked = chained(
        jax.tree.map(jnp.copy, state), corpus, jnp.asarray(idx), rng
    )

    single = trainer.make_diffusion_step()
    st_s = jax.tree.map(jnp.copy, state)
    singles = []
    for k in range(K):
        st_s, m = single(st_s, {"wav": corpus["wav"][idx[k]]}, rngs[k])
        singles.append(m)

    assert int(st_c.step) == int(st_s.step) == K
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(st_c.params)[0],
        jax.tree_util.tree_flatten_with_path(st_s.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
    # Stacked metrics row k == single-step metrics of step k.
    for k in range(K):
        np.testing.assert_allclose(
            float(np.asarray(stacked["loss"])[k]),
            float(singles[k]["loss"]),
            rtol=1e-5,
        )


def test_chained_progressive_and_consistency(setup):
    """The distillation kinds chain too: teacher EMA advances inside the scan
    (progressive), and a stale teacher rides through consistency untouched."""
    cfg, trainer, state, batch = setup
    corpus = {"wav": jnp.tile(batch["wav"], (2, 1))}
    idx = jnp.zeros((3, cfg.batch_size), jnp.int32)
    rng = jax.random.PRNGKey(12)

    st = jax.tree.map(jnp.copy, state).with_teacher()
    # At re-init teacher == student, the reference same-t objective is 0 and
    # warmup LR ~ 0, so nothing would move; open a gap so the EMA lerp
    # (0.001 * gap per step) is observable.
    st = st.replace(teacher=jax.tree.map(lambda p: p + 0.01, st.teacher))
    teacher0 = jax.tree.map(np.asarray, st.teacher)
    prog = trainer.make_chained_step(kind="progressive", num_steps=4)
    st, stacked = prog(st, corpus, idx, rng)
    assert int(st.step) == 3
    assert np.isfinite(np.asarray(stacked["loss"])).all()
    moved = any(
        np.max(np.abs(np.asarray(a) - b)) > 1e-6
        for a, b in zip(jax.tree.leaves(st.teacher), jax.tree.leaves(teacher0))
    )
    assert moved, "progressive chaining must EMA-update the teacher"

    teacher_pre = jax.tree.map(np.asarray, st.teacher)
    cons = trainer.make_chained_step(kind="consistency")
    st, stacked = cons(st, corpus, idx, jax.random.PRNGKey(13))
    assert int(st.step) == 6
    assert np.isfinite(np.asarray(stacked["loss"])).all()
    for a, b in zip(jax.tree.leaves(st.teacher), jax.tree.leaves(teacher_pre)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_train_driver_chained_smoke(tmp_path):
    """train() with cfg.steps_per_dispatch > 1: same phase structure and step
    counts as the per-step driver, driven by chained dispatches."""
    from edge_diffusion_tts_tpu.training import train

    cfg = tiny_cfg(
        diff_steps=8,
        max_timestep=7,
        progressive_target_steps=4,
        out_dir=str(tmp_path),
        val_batches=1,
        log_every_steps=1,
        diffusion_epochs=2,
        steps_per_dispatch=3,
    )

    n_rows = 2 * cfg.batch_size
    wavs = (
        np.random.RandomState(0).randn(n_rows, cfg.segment_len)
        .astype(np.float32) * 0.1
    )

    class FixedCorpusLoader:
        def __init__(self, w):
            self.wavs = w

        def __len__(self):
            return len(self.wavs) // cfg.batch_size

        def __iter__(self):
            for b in range(len(self)):
                yield {"wav": self.wavs[b * cfg.batch_size:(b + 1) * cfg.batch_size]}

    loader = FixedCorpusLoader(wavs)
    state = train(
        cfg,
        train_loader=loader,
        val_loader=[{"wav": wavs[: cfg.batch_size]}],
        hubert_cfg=HubertConfig.tiny(),
        phases=["diffusion", "progressive", "consistency"],
    )
    # 2 diffusion epochs (4 steps) + 1 halving x 1 epoch (2) + 1 consistency
    # epoch (2) = 8 steps, chained 3-3-wrap across phase totals.
    assert int(state.step) == 8
    run_dir = cfg.get_run_dir()
    assert os.path.isdir(os.path.join(run_dir, "checkpoint_phase1"))
    assert os.path.isdir(os.path.join(run_dir, "edge_model_final"))
    # Metrics were logged at true per-step granularity.
    import json

    steps_logged = set()
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if any(k.startswith("train/") for k in rec):
                steps_logged.add(rec["step"])
    assert steps_logged == {1, 2, 3, 4}


def test_checkpoint_dedup_frozen_roundtrip(setup, tmp_path):
    """dedup_frozen=True writes the frozen HuBERT subtree ONCE to a sibling
    dir; subsequent saves skip it and restores re-inject it bit-exactly
    (with and without a state template)."""
    import glob

    cfg, trainer, state, batch = setup
    state = jax.tree.map(jnp.copy, state)
    frozen_host = jax.device_get(state.params["encoder"]["hubert"])
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, state, cfg, {"step": 1},
                    frozen_host=frozen_host, dedup_frozen=True)
    shared = os.path.join(str(tmp_path), "frozen_hubert", "params")
    assert os.path.isdir(shared)
    stamps = {f: os.path.getmtime(f)
              for f in glob.glob(shared + "/**", recursive=True)}

    # A second save must not rewrite the shared subtree.
    state2 = state.replace(step=state.step + 1)
    save_checkpoint(path, state2, cfg, {"step": 2},
                    frozen_host=frozen_host, dedup_frozen=True)
    for f, m in stamps.items():
        assert os.path.getmtime(f) == m, f"shared subtree rewritten: {f}"

    expect_step = int(state.step) + 1
    for template in (state, None):
        restored, _, meta = restore_checkpoint(path, template)
        assert meta["frozen_external"] == "frozen_hubert"
        assert int(restored.step) == expect_step
        for (p_a, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                restored.params["encoder"]["hubert"])[0],
            jax.tree_util.tree_flatten_with_path(frozen_host)[0],
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # non-frozen params intact too
        a0 = jax.tree.leaves(restored.params["decoder"])[0]
        b0 = jax.tree.leaves(state.params["decoder"])[0]
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))
