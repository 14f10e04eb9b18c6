"""Three-phase training driver: diffusion -> progressive -> consistency.

Functional equivalent of the reference's packaged ``train()``
(reference: edge_diffusion_tts/train.py:25-307) and the improved v2 recipe
(train_v2.py:209-349), re-designed for TPU:

  - the jitted phase steps (training/steps.py) each compile once and are
    driven by a plain python epoch loop;
  - the mel frontend runs on device inside the step;
  - the full TrainState (incl. optimizer + teacher) checkpoints via orbax;
  - metrics go to JSONL + TensorBoard (utils/logging.py).

Phase structure (reference train.py):
  1. diffusion objective for ``diffusion_epochs`` (v-prediction by default —
     the v2 semantics; set cfg.use_v_prediction=False for the v1 epsilon
     objective);
  2. progressive distillation halving diff_steps -> 4, EMA teacher re-init at
     every halving (train.py:216-253);
  3. consistency training for ``consistency_epochs`` (train.py:264-284).
"""

from __future__ import annotations

import os
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CFG
from ..models import (
    EdgeDiffusionDecoder,
    HubertConfig,
    SemanticEncoder,
)
from ..models.decoder import init_decoder_params
from ..schedule import DiffusionSchedule
from ..utils.logging import MetricWriter
from .checkpoint import restore_checkpoint, save_checkpoint, save_final_model
from .state import TrainState, create_train_state, make_optimizer
from .steps import Trainer


def progressive_step_schedule(diff_steps: int, target: int = 4) -> List[int]:
    """Halving schedule diff_steps -> ... -> target (reference: train.py:218-222)."""
    steps, cur = [], diff_steps
    while cur > target:
        cur = max(cur // 2, target)
        steps.append(cur)
    return steps


def init_models(
    cfg: CFG,
    rng: jax.Array,
    hubert_cfg: Optional[HubertConfig] = None,
    hubert_params: Optional[dict] = None,
):
    """Build encoder+decoder modules and their initial params/vq_state.

    ``hubert_params`` (from models.hubert.load_hubert_params_from_torch)
    replaces the randomly-initialized frozen HuBERT subtree when given.
    """
    import jax.numpy as jnp

    hubert_cfg = hubert_cfg or HubertConfig()
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    encoder = SemanticEncoder(cfg, hubert_cfg, dtype=dtype)
    decoder = EdgeDiffusionDecoder(cfg, dtype=dtype)

    k_enc, k_dec, k_drop, k_vq = jax.random.split(rng, 4)
    wav = jnp.zeros((1, min(cfg.segment_len, 4000)), jnp.float32)
    enc_vars = encoder.init(
        {"params": k_enc, "dropout": k_drop, "vq": k_vq}, wav, train=False
    )
    enc_params = dict(enc_vars["params"])
    if hubert_params is not None:
        enc_params["hubert"] = hubert_params["params"]
    dec_vars = init_decoder_params(decoder, k_dec, cfg)

    params = {"encoder": enc_params, "decoder": dec_vars["params"]}
    # cfg.param_dtype governs the dtype the parameter tree is STORED and
    # optimized in (flax modules promote to compute_dtype at apply time, so
    # bf16 params + f32 compute is valid).  bf16 halves checkpoint size and
    # optimizer-moment memory at reduced update precision.
    if cfg.param_dtype == "bfloat16":
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating)
            else p,
            params,
        )
    vq_state = (
        {"encoder": enc_vars["vq_state"]} if "vq_state" in enc_vars else {}
    )
    return encoder, decoder, params, vq_state


def _run_epoch(
    step_fn: Callable,
    state: TrainState,
    loader,
    rng: jax.Array,
    writer: Optional[MetricWriter],
    log_every: int,
    hooks: Optional[List[Callable]] = None,
    prefix: str = "",
    nan_guard: Optional[Callable] = None,
    put_batch: Optional[Callable] = None,
):
    """Drive one epoch of a jitted step over a loader; returns (state, last_metrics)."""
    metrics = {}
    if put_batch is None:
        put_batch = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    # Track the step on host: reading int(state.step) every iteration would
    # force a device sync per step and serialize the pipeline.
    step = int(state.step)
    for batch in loader:
        rng, sub = jax.random.split(rng)
        device_batch = put_batch(batch)
        state, metrics = step_fn(state, device_batch, sub)
        step += 1
        if step % log_every == 0:
            if writer is not None:
                writer.write(step, metrics, prefix=prefix)
            if nan_guard is not None and "loss" in metrics:
                nan_guard(step, float(metrics["loss"]))
        for hook in hooks or []:
            hook(step, state)
    return state, metrics


def make_visualization_hook(
    cfg: CFG, trainer: Trainer, val_batch, run_dir: str
) -> Callable:
    """Periodic GT-vs-N-step-generation PNG grids during training.

    Reference: train.py:184-186 calling visualize_generation every
    plot_every_steps with steps [4, 8, 16].
    """
    import jax.numpy as jnp

    from ..schedule import ddim_sample
    from ..utils.visualization import visualize_generation

    batch1 = {k: jnp.asarray(v[:1]) for k, v in val_batch.items()}
    prediction = "v" if cfg.use_v_prediction else "eps"

    # One compiled program per ladder rung: the hook fires every
    # plot_every_steps, and an eager 4/8/16-step DDIM ladder would dispatch
    # hundreds of individual ops through the device runtime each time
    # (per-op dispatch dominates on a tunneled TPU).  Params are arguments,
    # not captures (CLAUDE.md: captures become HLO constants).
    def _make_gen(num_steps: int):
        @jax.jit
        def gen_jit(params, vq_state, wav, rng):
            k_enc, k_x = jax.random.split(rng)
            mel_n = trainer._mel_normalized(wav)
            (_, sem_idx, _, _, _), _ = trainer._encode(
                params, vq_state, {"wav": wav}, k_enc, train=False
            )
            x_T = jax.random.normal(k_x, mel_n.shape)

            def model_fn(x, t, si):
                return trainer._decode(
                    params["decoder"], x, t, sem_idx=sem_idx, step_idx=si
                )

            return ddim_sample(
                trainer.schedule, model_fn, x_T, num_steps,
                prediction=prediction,
            )[0]

        return gen_jit

    steps_list = (4, 8, 16)
    gens = {n: _make_gen(n) for n in steps_list}

    def hook(step: int, state):
        if cfg.plot_every_steps <= 0 or step % cfg.plot_every_steps:
            return
        rng = jax.random.PRNGKey(step)
        mel_n = trainer._mel_normalized(batch1["wav"])

        def gen(num_steps, rng):
            return gens[num_steps](
                state.params, state.vq_state, batch1["wav"], rng
            )

        visualize_generation(gen, mel_n[0], step, run_dir, steps_list=steps_list)

    # Cadence metadata for the chained-dispatch driver: steps advance K at a
    # time there, so crossing detection replaces the per-step modulo.
    hook.every = cfg.plot_every_steps
    return hook


def train(
    cfg: CFG,
    train_loader=None,
    val_loader=None,
    resume: Optional[str] = None,
    hubert_params: Optional[dict] = None,
    hubert_cfg: Optional[HubertConfig] = None,
    phases: Optional[List[str]] = None,
    hooks: Optional[List[Callable]] = None,
    phase_end_hook: Optional[Callable] = None,
    export: bool = False,
) -> TrainState:
    """Full training run.  Returns the final TrainState.

    ``phases`` subsets {"diffusion", "progressive", "consistency"} (default
    all three, the reference recipe).  ``train_loader``/``val_loader`` may be
    any iterable of {"wav": [B, segment_len]} dicts; when None, LJSpeech
    loaders are built from cfg (requires the dataset on disk).

    ``phase_end_hook(tag, state)`` fires once per completed training stage
    with tags "init", "diffusion", "prog{N}" per halving, "consistency" —
    the per-phase measurement point for e.g. raw-DDIM few-step quality
    (tools/soak_train.py).  Skipped (resumed) phases do not fire, and the
    "init" tag fires only on fresh runs (a restored state is not a baseline).
    """
    rng = cfg.setup_environment()
    cfg.print_config()
    run_dir = cfg.get_run_dir()
    writer = MetricWriter(run_dir)
    phases = phases or ["diffusion", "progressive", "consistency"]

    if train_loader is None:
        from ..data import Collate, DataLoader, LJSpeechDataset
        from ..data.dataset import resolve_ljspeech_dir

        lj_dir = resolve_ljspeech_dir(cfg.ljspeech_dir, cfg.data_root)
        # pin_memory (reference train.py:63): eager H2D in the prefetch
        # thread — only useful when batches land on one device as-is, so
        # skip it when a mesh will reshard them.
        pin = cfg.pin_memory and not cfg.mesh_shape
        train_loader = DataLoader(
            LJSpeechDataset(lj_dir, "train"),
            cfg.batch_size,
            Collate(cfg, seed=cfg.seed),
            seed=cfg.seed,
            pin_memory=pin,
            workers=cfg.num_workers,
        )
        val_loader = DataLoader(
            LJSpeechDataset(lj_dir, "val"),
            cfg.batch_size,
            Collate(cfg, deterministic=True),
            shuffle=False,
            pin_memory=pin,
            workers=cfg.num_workers,
        )

    rng, k_init = jax.random.split(rng)
    hubert_cfg = hubert_cfg or HubertConfig()
    encoder, decoder, params, vq_state = init_models(
        cfg, k_init, hubert_cfg, hubert_params
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps, cfg.beta_start, cfg.beta_end)

    # Generators / one-shot iterables: every epoch (and validation pass)
    # re-iterates the loaders, and steps_per_epoch needs len() — materialize
    # anything that can't be re-iterated.
    if train_loader is not None and not hasattr(train_loader, "__len__"):
        train_loader = list(train_loader)
    if val_loader is not None and not hasattr(val_loader, "__len__"):
        val_loader = list(val_loader)

    steps_per_epoch = max(len(train_loader), 1)
    total_steps = steps_per_epoch * max(
        cfg.diffusion_epochs
        + cfg.progressive_epochs_per_halving
        * len(progressive_step_schedule(cfg.diff_steps, cfg.progressive_target_steps))
        + cfg.consistency_epochs,
        1,
    )
    # The warmup/cosine schedule advances once per OPTIMIZER UPDATE, and
    # under optax.MultiSteps that is once per grad_accumulation data steps —
    # size the horizon in updates or warmup stretches accumulation-x longer
    # (and the cosine only traverses 1/accumulation of its decay).
    total_updates = -(-total_steps // max(cfg.grad_accumulation, 1))
    tx = make_optimizer(cfg, total_updates)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)
    state = create_train_state(cfg, params, vq_state, tx)

    def _enter_distillation():
        """Drop the LR to cfg.lr_consistency for the distillation phases.

        Reference: train.py:224-225 mutates optimizer.param_groups to
        cfg.lr_consistency right before the progressive loop; the same LR then
        carries through consistency training.  We swap trainer.tx for a
        constant-LR optimizer BEFORE the phase-2/3 step functions are traced
        (they read trainer.tx at build time, incl. the shard_map variants).
        The optimizer STATE carries over unchanged, like the reference (same
        optimizer object there): optax schedules are pure functions of the
        update count, so the opt_state trees are structurally identical
        across the swap and Adam moments / MultiSteps accumulators survive.
        """
        import optax

        trainer.tx = make_optimizer(
            cfg,
            total_updates,
            learning_rate=optax.constant_schedule(cfg.lr_consistency),
        )

    # -- optional data-parallel mesh (cfg.mesh_shape) ------------------------
    # When a mesh is configured with >1 devices, every phase step runs as a
    # shard_map data-parallel program: batches shard over the "data" axis,
    # state replicates, gradients/metrics/VQ-statistics pmean over ICI.
    mesh = None
    if cfg.mesh_shape:
        n_mesh = int(np.prod(cfg.mesh_shape))
        if n_mesh > 1:
            if len(jax.devices()) < n_mesh:
                raise ValueError(
                    f"cfg.mesh_shape={cfg.mesh_shape} needs {n_mesh} devices, "
                    f"have {len(jax.devices())}"
                )
            if cfg.batch_size % cfg.mesh_shape[0]:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must divide over the data "
                    f"axis ({cfg.mesh_shape[0]} shards)"
                )
            from ..parallel import make_mesh, replicate, shard_batch
            from ..parallel.data_parallel import (
                make_dp_consistency_step,
                make_dp_diffusion_step,
                make_dp_progressive_step,
            )

            mesh = make_mesh(cfg.mesh_shape, tuple(cfg.mesh_axis_names))
            print(f"Data-parallel mesh: {dict(mesh.shape)}")

    # -- optional pipeline parallelism (cfg.pipeline_stages) ------------------
    # >1 stages the decoder backbone over a "pipe" axis: the trainer is
    # lifted to a PPTrainer (same loss/step factories, pipelined _decode) and
    # the state's decoder subtree is packed into the stage-sharded layout.
    # Checkpoints written by a pipeline run carry the packed tree and resume
    # into pipeline runs; the final model is saved in canonical layout.
    pp_packed = False
    if cfg.pipeline_stages > 1:
        if mesh is not None:
            raise ValueError(
                "pipeline_stages and mesh_shape are mutually exclusive in "
                "train(); compose DP x PP via PPTrainer(data_axis=...) "
                "directly"
            )
        n_stages = cfg.pipeline_stages
        if cfg.layers % n_stages:
            raise ValueError(
                f"layers={cfg.layers} must divide by "
                f"pipeline_stages={n_stages}"
            )
        if len(jax.devices()) < n_stages:
            raise ValueError(
                f"pipeline_stages={n_stages} needs {n_stages} devices, "
                f"have {len(jax.devices())}"
            )
        n_mb = cfg.pipeline_microbatches or n_stages
        if cfg.batch_size % n_mb:
            raise ValueError(
                f"batch_size={cfg.batch_size} must divide by "
                f"pipeline_microbatches={n_mb}"
            )
        from jax.sharding import Mesh as _Mesh

        from ..parallel.pipeline_parallel import (
            PIPE_AXIS,
            create_pp_state,
            make_pp_trainer,
        )

        pipe_mesh = _Mesh(
            np.array(jax.devices()[:n_stages]).reshape(n_stages), (PIPE_AXIS,)
        )
        trainer = make_pp_trainer(trainer, pipe_mesh, n_mb)
        state = create_pp_state(cfg, state.params, state.vq_state, tx, pipe_mesh)
        pp_packed = True
        print(f"Pipeline-parallel: {n_stages} stages, {n_mb} microbatches")

    # -- optional chained dispatch (cfg.steps_per_dispatch) -------------------
    # K optimizer steps per device launch (Trainer.make_chained_step): the
    # tunnel charges ~30 ms per dispatch whatever the program, so the
    # one-dispatch-per-step loop realizes ~3% of the benched step rate.
    chain = max(int(cfg.steps_per_dispatch), 1)
    corpus_dev = None
    if chain > 1:
        if mesh is not None or pp_packed:
            raise ValueError(
                "steps_per_dispatch > 1 is a single-device fast path; "
                "combine with mesh/pipeline via the Trainer factories directly"
            )
        wavs = getattr(train_loader, "wavs", None)
        if wavs is None:
            raise ValueError(
                "steps_per_dispatch > 1 needs an in-memory fixed-segment "
                "corpus loader exposing .wavs (e.g. tools/soak_train."
                "CorpusLoader); streaming/random-crop loaders must run "
                "one step per dispatch"
            )
        corpus_dev = {"wav": jnp.asarray(np.asarray(wavs))}
        print(f"Chained dispatch: {chain} steps/launch, "
              f"corpus {corpus_dev['wav'].shape} in HBM")

    put_batch = None
    if mesh is not None:
        put_batch = lambda b: shard_batch(
            {k: jnp.asarray(v) for k, v in b.items()}, mesh
        )

    def build_diffusion_step():
        if mesh is not None:
            return make_dp_diffusion_step(trainer, mesh)
        return trainer.make_diffusion_step()

    def build_progressive_step(target_steps: int):
        _enter_distillation()
        if mesh is not None:
            return make_dp_progressive_step(
                trainer, mesh, target_steps, exact=cfg.progressive_exact
            )
        return trainer.make_progressive_step(
            target_steps, exact=cfg.progressive_exact
        )

    def build_consistency_step():
        _enter_distillation()
        if mesh is not None:
            return make_dp_consistency_step(
                trainer, mesh, exact=cfg.consistency_exact,
                consistency_weight=cfg.consistency_weight,
            )
        return trainer.make_consistency_step(
            exact=cfg.consistency_exact,
            consistency_weight=cfg.consistency_weight,
        )

    if resume == "auto":
        # Elastic restart: pick up the newest complete periodic checkpoint
        # (crash = rerun with resume='auto'; improves on the reference's
        # manual --resume that also loses optimizer state).  A crash during
        # the atomic save swap may leave only the .stale sibling complete —
        # resolve_checkpoint_dir handles both.
        from .checkpoint import resolve_checkpoint_dir

        resume = resolve_checkpoint_dir(cfg.ckpt_path)
    resume_meta = {}
    if resume:
        state, _, meta = restore_checkpoint(resume, state)
        resume_meta = meta or {}
        print(
            f"Resumed from {resume} at step {int(state.step)}"
            + (f" (phase {resume_meta['phase']})"
               if resume_meta.get("phase") else "")
        )

    # Phase skipping on resume: periodic checkpoints record the in-progress
    # phase (+ halving), phase-end checkpoints record phase_complete.
    # Completed phases are skipped entirely; the in-progress phase (or
    # halving) restarts from its beginning with the restored weights and
    # optimizer — without this, resume='auto' after a phase-3 crash would
    # put the distilled student back through full-schedule diffusion
    # training, destroying the few-step behavior.  Metas without phase info
    # (pre-existing checkpoints) replay everything, as before.
    _ORDER = ["diffusion", "progressive", "consistency"]

    def _phase_done(name: str) -> bool:
        comp = resume_meta.get("phase_complete")
        if comp in _ORDER and _ORDER.index(name) <= _ORDER.index(comp):
            return True
        inprog = resume_meta.get("phase")
        if inprog in _ORDER and _ORDER.index(name) < _ORDER.index(inprog):
            return True
        return False

    resume_halving = (
        resume_meta.get("halving")
        if resume_meta.get("phase") == "progressive"
        else None
    )
    # Written into periodic-checkpoint metas by the hook below.
    progress = {"phase": "diffusion", "halving": None}

    if mesh is not None:
        state = replicate(state, mesh)

    # Frozen-HuBERT host cache for checkpointing: the subtree never trains
    # (make_optimizer masks it), so every save would fetch the same ~380 MB
    # device->host.  Fetch it once — lazily, from the state being saved at
    # the FIRST save (the jitted steps donate their input state, so earlier
    # buffers are deleted) — and substitute the host copy into every save
    # (see checkpoint.save_checkpoint).
    _frozen_cache: List = []

    def _frozen_host(st: TrainState):
        if not _frozen_cache:
            enc = st.params.get("encoder", {})
            _frozen_cache.append(
                jax.device_get(enc["hubert"]) if "hubert" in enc else None
            )
        return _frozen_cache[0]

    from ..utils.reliability import make_nan_guard

    # Each phase is validated through the conditioning path it trains:
    # phase 1 through sem_features (v2 recipe), distillation through
    # sem_idx/token_emb (the v1 inference path phases 2/3 condition on).
    validate_fns = {
        "features": trainer.make_validate_fn(num_steps=cfg.inference_steps),
        "tokens": trainer.make_validate_fn(
            num_steps=cfg.inference_steps, conditioning="tokens"
        ),
    }
    nan_guard = make_nan_guard(patience=3)
    best_val_cos = -float("inf")

    if hooks is None and val_loader is not None and cfg.plot_every_steps > 0:
        try:
            first_val = next(iter(val_loader))
            hooks = [make_visualization_hook(cfg, trainer, first_val, run_dir)]
        except StopIteration:
            hooks = []

    if cfg.ckpt_every_steps > 0:
        def _periodic_ckpt(step: int, st: TrainState):
            if step % cfg.ckpt_every_steps == 0:
                save_checkpoint(cfg.ckpt_path, st, cfg,
                                {"step": step, **progress},
                                frozen_host=_frozen_host(st),
                                hubert_cfg=hubert_cfg, dedup_frozen=True)

        _periodic_ckpt.every = cfg.ckpt_every_steps
        hooks = (hooks or []) + [_periodic_ckpt]

    # Mid-epoch eval cadence: every val_every_steps, epsilon-MSE on up to
    # val_batches validation batches; best checkpoint on that eval loss.
    # Diffusion phase ONLY, like the reference (train.py:190-199 ->
    # best_diffusion.pt): later phases optimize different objectives and
    # must not overwrite the best pure-diffusion checkpoint.
    # val_batches=0 means "no validation" (same convention as
    # _maybe_validate), so the hook is disabled too.
    diffusion_hooks = hooks
    if (
        cfg.val_every_steps > 0
        and cfg.val_batches > 0
        and val_loader is not None
    ):
        eval_eps = trainer.make_eval_eps_fn()
        eval_batches = []
        for i, b in enumerate(val_loader):
            if i >= cfg.val_batches:
                break
            eval_batches.append({k: jnp.asarray(v) for k, v in b.items()})
        best_eval = [float("inf")]

        def _mid_epoch_eval(step: int, st: TrainState):
            if step % cfg.val_every_steps or not eval_batches:
                return
            vals = [
                float(
                    eval_eps(
                        st.params, st.vq_state, b, jax.random.PRNGKey(step + i)
                    )["val_eps_mse"]
                )
                for i, b in enumerate(eval_batches)
            ]
            mean = float(np.mean(vals))
            writer.write(step, {"val_eps_mse": mean}, prefix="eval/")
            if mean < best_eval[0]:
                best_eval[0] = mean
                save_checkpoint(
                    os.path.join(run_dir, "best_diffusion"), st, cfg,
                    {"val_eps_mse": mean, "step": step},
                    frozen_host=_frozen_host(st), hubert_cfg=hubert_cfg,
                    dedup_frozen=True,
                )

        _mid_epoch_eval.every = cfg.val_every_steps
        diffusion_hooks = (hooks or []) + [_mid_epoch_eval]

    def _maybe_validate(state: TrainState, tag: str):
        nonlocal best_val_cos, rng
        if val_loader is None:
            return
        validate = validate_fns[
            "features" if tag == "diffusion" else "tokens"
        ]
        rng, sub = jax.random.split(rng)
        vals = []
        for i, batch in enumerate(val_loader):
            if i >= cfg.val_batches:
                break
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            vals.append(
                validate(state.params, state.vq_state, device_batch, sub)
            )
        if not vals:
            return
        agg = {
            k: float(np.mean([float(v[k]) for v in vals])) for k in vals[0]
        }
        writer.write(int(state.step), agg, prefix=f"{tag}/")
        if agg.get("val_cos", -1e9) > best_val_cos + cfg.best_min_delta:
            best_val_cos = agg["val_cos"]
            # v2 semantics: best_model.pt on val_cos (train_v2.py:331-341);
            # the mid-epoch eval hook owns best_diffusion (v1 semantics).
            save_checkpoint(
                os.path.join(run_dir, "best_model"), state, cfg,
                {"val_cos": best_val_cos, "phase": tag},
                frozen_host=_frozen_host(state), hubert_cfg=hubert_cfg,
                dedup_frozen=True,
            )

    def _run_phase_chained(step_fn, state, epochs, prefix, tag, phase_hooks):
        """Drive a phase in chains of ``chain`` steps per dispatch.

        Epoch semantics are preserved (shuffled passes over the corpus, the
        same number of optimizer steps); what changes is granularity: metrics
        arrive as a [K]-stacked tree fetched once per dispatch, periodic
        hooks fire on cadence-boundary CROSSINGS (at the snapped step, with
        the end-of-chain state), and validation runs on epoch crossings — at
        most once per dispatch.
        """
        nonlocal rng
        B = cfg.batch_size
        n_rows = int(corpus_dev["wav"].shape[0])
        spe = max(n_rows // B, 1)  # steps per epoch
        total = spe * epochs
        rs = np.random.RandomState(cfg.seed + 1013)
        idx_buf: List[np.ndarray] = []
        step = int(state.step)
        start = step
        metrics = {}
        t0 = time.time()
        while step - start < total:
            k = min(chain, total - (step - start))
            while len(idx_buf) < k:
                perm = rs.permutation(n_rows)[: spe * B].reshape(spe, B)
                idx_buf.extend(perm)
            idx = np.stack(idx_buf[:k]).astype(np.int32)
            del idx_buf[:k]
            rng, sub = jax.random.split(rng)
            prev = step
            state, stacked = step_fn(state, corpus_dev, jnp.asarray(idx), sub)
            step += k
            host = jax.device_get(stacked)  # ONE fetch per dispatch
            for j in range(k):
                s_j = prev + j + 1
                if s_j % cfg.log_every_steps == 0:
                    row = {kk: float(np.asarray(vv)[j])
                           for kk, vv in host.items()}
                    writer.write(s_j, row, prefix=prefix)
                    if nan_guard is not None and "loss" in row:
                        nan_guard(s_j, row["loss"])
            metrics = {kk: float(np.asarray(vv)[-1]) for kk, vv in host.items()}
            for hook in phase_hooks or []:
                every = int(getattr(hook, "every", 0) or 0)
                if every > 0:
                    if step // every > prev // every:
                        hook(step - step % every, state)
                else:
                    hook(step, state)
            every = max(int(cfg.validate_every_epochs), 1) * spe
            if step // every > prev // every:
                done = step - start
                print(
                    f"  [{tag}] epoch {done // spe}/{epochs} step {step} "
                    f"loss={metrics.get('loss', float('nan')):.4f} "
                    f"({done * B / max(time.time() - t0, 1e-9):.0f} utt/s)"
                )
                _maybe_validate(state, tag)
        return state, metrics

    def _phase_end(tag: str, st: TrainState):
        if phase_end_hook is not None:
            phase_end_hook(tag, st)

    # The "init" row is the random-init baseline: on a resumed run the
    # restored (partially trained) state must NOT be scored under that tag —
    # soak artifacts would present trained params as the baseline.
    if not resume:
        _phase_end("init", state)

    # ---- Phase 1: diffusion ------------------------------------------------
    if "diffusion" in phases and _phase_done("diffusion"):
        print("Phase 1: diffusion — already complete in checkpoint, skipping")
    elif "diffusion" in phases:
        progress["phase"] = "diffusion"
        print(f"Phase 1: diffusion ({cfg.diffusion_epochs} epochs)")
        if chain > 1:
            state, metrics = _run_phase_chained(
                trainer.make_chained_step(kind="diffusion"), state,
                cfg.diffusion_epochs, "train/", "diffusion", diffusion_hooks,
            )
        else:
            step_fn = build_diffusion_step()
            for epoch in range(cfg.diffusion_epochs):
                rng, sub = jax.random.split(rng)
                t0 = time.time()
                state, metrics = _run_epoch(
                    step_fn, state, train_loader, sub, writer,
                    cfg.log_every_steps, diffusion_hooks, prefix="train/",
                    nan_guard=nan_guard, put_batch=put_batch,
                )
                print(
                    f"  epoch {epoch + 1}/{cfg.diffusion_epochs} "
                    f"loss={float(metrics.get('loss', float('nan'))):.4f} "
                    f"({time.time() - t0:.1f}s)"
                )
                _maybe_validate(state, "diffusion")
        save_checkpoint(os.path.join(run_dir, "checkpoint_phase1"), state, cfg,
                        {"phase_complete": "diffusion"},
                        frozen_host=_frozen_host(state), hubert_cfg=hubert_cfg)
        _phase_end("diffusion", state)

    # ---- Phase 2: progressive distillation ---------------------------------
    if "progressive" in phases and _phase_done("progressive"):
        print("Phase 2: progressive — already complete in checkpoint, skipping")
    elif "progressive" in phases:
        progress["phase"] = "progressive"
        halvings = progressive_step_schedule(
            cfg.diff_steps, cfg.progressive_target_steps
        )
        if resume_halving in halvings:
            skipped = halvings[: halvings.index(resume_halving)]
            halvings = halvings[halvings.index(resume_halving):]
            if skipped:
                print(f"  resume: skipping completed halvings {skipped}")
        print(f"Phase 2: progressive distillation {cfg.diff_steps} -> {halvings}")
        for target_steps in halvings:
            progress["halving"] = target_steps
            state = state.with_teacher()  # re-init at each halving
            if chain > 1:
                _enter_distillation()
                state, metrics = _run_phase_chained(
                    trainer.make_chained_step(
                        kind="progressive", num_steps=target_steps,
                        exact=cfg.progressive_exact,
                    ),
                    state, cfg.progressive_epochs_per_halving,
                    f"prog{target_steps}/", f"prog{target_steps}", hooks,
                )
            else:
                step_fn = build_progressive_step(target_steps)
                for epoch in range(cfg.progressive_epochs_per_halving):
                    rng, sub = jax.random.split(rng)
                    state, metrics = _run_epoch(
                        step_fn, state, train_loader, sub, writer,
                        cfg.log_every_steps, hooks,
                        prefix=f"prog{target_steps}/",
                        nan_guard=nan_guard, put_batch=put_batch,
                    )
            print(
                f"  target={target_steps} "
                f"loss={float(metrics.get('loss', float('nan'))):.4f}"
            )
            _maybe_validate(state, f"prog{target_steps}")
            _phase_end(f"prog{target_steps}", state)
        save_checkpoint(os.path.join(run_dir, "checkpoint_phase2"), state, cfg,
                        {"phase_complete": "progressive"},
                        frozen_host=_frozen_host(state), hubert_cfg=hubert_cfg)

    # ---- Phase 3: consistency ----------------------------------------------
    if "consistency" in phases and _phase_done("consistency"):
        print("Phase 3: consistency — already complete in checkpoint, skipping")
    elif "consistency" in phases:
        progress["phase"] = "consistency"
        progress["halving"] = None
        print(f"Phase 3: consistency ({cfg.consistency_epochs} epochs)")
        if cfg.consistency_exact and state.teacher is None:
            state = state.with_teacher()
        if chain > 1:
            _enter_distillation()
            state, metrics = _run_phase_chained(
                trainer.make_chained_step(
                    kind="consistency", exact=cfg.consistency_exact,
                    consistency_weight=cfg.consistency_weight,
                ),
                state, cfg.consistency_epochs, "consistency/", "consistency",
                hooks,
            )
        else:
            step_fn = build_consistency_step()
            for epoch in range(cfg.consistency_epochs):
                rng, sub = jax.random.split(rng)
                state, metrics = _run_epoch(
                    step_fn, state, train_loader, sub, writer,
                    cfg.log_every_steps, hooks, prefix="consistency/",
                    nan_guard=nan_guard, put_batch=put_batch,
                )
                print(
                    f"  epoch {epoch + 1}/{cfg.consistency_epochs} "
                    f"loss={float(metrics.get('loss', float('nan'))):.4f}"
                )
                _maybe_validate(state, "consistency")
        _phase_end("consistency", state)

    final_params = state.params
    if pp_packed:
        # Canonical layout for the final model (EdgeInference / export /
        # non-pipeline consumers); checkpoint_final stays packed for
        # pipeline resume.
        from ..parallel.pipeline_parallel import pp_unpack_params

        final_params = pp_unpack_params(jax.device_get(state.params))
    save_final_model(os.path.join(run_dir, "edge_model_final"), final_params,
                     cfg, frozen_host=_frozen_host(state),
                     vq_state=jax.device_get(state.vq_state) or None,
                     hubert_cfg=hubert_cfg)
    save_checkpoint(os.path.join(run_dir, "checkpoint_final"), state, cfg,
                    {"phase_complete": "consistency"},
                    frozen_host=_frozen_host(state), hubert_cfg=hubert_cfg)
    if export:
        from ..utils.export import export_for_edge

        export_for_edge(
            cfg, decoder, final_params["decoder"],
            os.path.join(run_dir, "edge_model.stablehlo"),
        )
    writer.close()
    return state


def train_v2(cfg: CFG, **kw) -> TrainState:
    """The improved single-phase recipe (reference: train_v2.py:209-349):
    v-prediction + FSQ + CFG dropout + cosine LR, validated by 4-step
    DPM-Solver++ cosine similarity with best-checkpoint tracking."""
    cfg.use_v_prediction = True
    cfg.use_fsq = True
    return train(cfg, phases=["diffusion"], **kw)
