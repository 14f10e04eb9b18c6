"""Full-scale 3-phase training soak on the real TPU -> TRAIN_r{N}.json.

Runs the COMPLETE reference recipe (diffusion -> 8 progressive halvings ->
consistency; reference: edge_diffusion_tts/train.py:25-307) at the scales
the benchmarks measure:

  - flagship decoder (hidden=160, 4 layers, 4 heads -> 2,270,160 params)
  - full-size random-init HuBERT-base (~95M params, frozen; pretrained
    weights and LJSpeech are unavailable in this environment — no egress)
  - FSQ semantic bottleneck, batch 32, f32 compute

on a deterministic synthetic harmonic-speech corpus.  Produces every
reference artifact (best/phase/final checkpoints, metrics JSONL + TB,
sample grids) and writes the TRAIN artifact: per-phase loss / val_cos
trajectories with wall-clock and throughput, plus the end-of-run 1-step vs
4-step DPM++ cosine comparison (the "1-step ends best" consistency-training
property, scored exactly like tests/test_training.py::
test_training_dynamics_regression).

Round 4: ``--chain K`` drives the whole run through chained dispatch
(cfg.steps_per_dispatch -> Trainer.make_chained_step, K optimizer steps per
device launch with on-device corpus gathering) — the fix for TRAIN_r03's
38 utt/s wall vs 1,283 utt/s device gap (~30 ms tunnel dispatch per step).

Usage:  python tools/soak_train.py [--scale 1.0] [--chain 64]
                                   [--out runs/soak_r04]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(n_utts: int, segment_len: int, sample_rate: int, seed: int):
    """Deterministic harmonic pseudo-speech: per-utterance f0 with drift and
    vibrato, 4 harmonics with random decay, a 2-6 Hz amplitude envelope and a
    small noise floor."""
    rs = np.random.RandomState(seed)
    t = np.arange(segment_len) / sample_rate
    wavs = np.empty((n_utts, segment_len), np.float32)
    for i in range(n_utts):
        f0 = float(np.exp(rs.uniform(np.log(80.0), np.log(400.0))))
        drift = rs.uniform(-0.15, 0.15)          # relative f0 drift over 2 s
        vib = rs.uniform(0.0, 0.01)              # vibrato depth
        phase = 2 * np.pi * f0 * (
            t + drift * t * t / (2 * t[-1])
        ) + vib * np.sin(2 * np.pi * rs.uniform(4.0, 7.0) * t)
        decay = rs.uniform(0.3, 0.7)
        sig = sum(
            (decay ** k) * np.sin((k + 1) * phase + rs.rand())
            for k in range(4)
        )
        env = 0.5 + 0.5 * np.sin(2 * np.pi * rs.uniform(2.0, 6.0) * t + rs.rand())
        noise = 0.01 * rs.randn(segment_len)
        wavs[i] = (0.2 * env * sig + noise).astype(np.float32)
    return wavs


def make_corpus_units(
    n_utts: int, segment_len: int, sample_rate: int, seed: int,
    n_units: int = 24, unit_secs: float = 0.16, bank_seed: int = 7,
):
    """Encoder-separable pseudo-speech: each utterance is a random SEQUENCE
    of units from a shared bank of ``n_units`` stationary harmonic timbres
    (unit-specific f0 + harmonic amplitude profile, 10 ms raised-cosine
    joins).  Train and val share the BANK but not the sequences, so a
    conditioning path that can classify the active unit per frame supports
    near-perfect held-out reconstruction — unlike ``make_corpus``'s
    continuously-varying f0/drift/vibrato, where a random-init frozen
    HuBERT + 8-dim FSQ bottleneck caps achievable val_cos (measured by
    tools/ceiling_oracle.py)."""
    bank = np.random.RandomState(bank_seed)
    f0s = np.exp(np.linspace(np.log(100.0), np.log(360.0), n_units))
    amps = bank.uniform(0.2, 1.0, size=(n_units, 6))
    rs = np.random.RandomState(seed)
    t = np.arange(segment_len) / sample_rate
    upl = max(int(unit_secs * sample_rate), 1)
    n_per = segment_len // upl + 1
    ramp = int(0.01 * sample_rate)
    wavs = np.empty((n_utts, segment_len), np.float32)
    for i in range(n_utts):
        seq = rs.randint(0, n_units, size=n_per)
        sig = np.zeros(segment_len)
        for j, u in enumerate(seq):
            s0, s1 = j * upl, min((j + 1) * upl, segment_len)
            if s1 <= s0:
                break
            tt = t[s0:s1]
            seg = sum(
                amps[u, k] * np.sin(2 * np.pi * (k + 1) * f0s[u] * tt)
                for k in range(6)
            )
            w = np.ones(s1 - s0)
            r = min(ramp, (s1 - s0) // 2)
            if r > 0:
                w[:r] = 0.5 * (1 - np.cos(np.pi * np.arange(r) / r))
                w[-r:] = w[:r][::-1]
            sig[s0:s1] = seg * w
        wavs[i] = (0.15 * sig + 0.005 * rs.randn(segment_len)).astype(
            np.float32
        )
    return wavs


CORPORA = {"harmonic": make_corpus, "units": make_corpus_units}


class CorpusLoader:
    """Batched loader over a fixed corpus; reshuffles every epoch."""

    def __init__(self, wavs: np.ndarray, batch_size: int, seed: int,
                 shuffle: bool = True):
        self.wavs = wavs
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rs = np.random.RandomState(seed)
        self._n_batches = len(wavs) // batch_size

    def __len__(self):
        return self._n_batches

    def __iter__(self):
        idx = np.arange(len(self.wavs))
        if self.shuffle:
            self._rs.shuffle(idx)
        for b in range(self._n_batches):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            yield {"wav": self.wavs[sel]}


def phase_trajectories(metrics_path: str, max_points: int = 200):
    """Collapse metrics.jsonl into per-prefix (step, value, time) series,
    subsampled to at most max_points each."""
    series: dict = {}
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            for k, v in rec.items():
                if k in ("step", "time"):
                    continue
                series.setdefault(k, []).append(
                    (rec["step"], v, rec["time"])
                )
    out = {}
    for k, pts in series.items():
        stride = max(1, len(pts) // max_points)
        sub = pts[::stride]
        if sub[-1] != pts[-1]:
            sub.append(pts[-1])
        out[k] = {
            "step": [p[0] for p in sub],
            "value": [round(p[1], 5) for p in sub],
            "wall_s": round(pts[-1][2] - pts[0][2], 1),
            "n_logged": len(pts),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="multiply all phase epoch counts")
    ap.add_argument("--out", default="runs/soak_r04")
    ap.add_argument("--artifact", default="TRAIN_r04.json")
    ap.add_argument("--chain", type=int, default=40,
                    help="optimizer steps per device dispatch (1 = the old "
                         "one-dispatch-per-step driver)")
    ap.add_argument("--diffusion-epochs", type=int, default=None)
    ap.add_argument("--progressive-epochs", type=int, default=None)
    ap.add_argument("--consistency-epochs", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--lr-consistency", type=float, default=None)
    ap.add_argument("--consistency-weight", type=float, default=None)
    ap.add_argument("--hubert-layer", type=int, default=None,
                    help="override cfg.hubert_layer (see ceiling_oracle)")
    ap.add_argument("--n-train", type=int, default=256,
                    help="training corpus size (synthetic => free; larger "
                         "closes the train/val generalization gap the "
                         "ceiling oracle measures)")
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--corpus", choices=sorted(CORPORA), default="harmonic",
                    help="synthetic corpus family (units = encoder-separable"
                         " unit sequences; see make_corpus_units)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU plumbing check (not the real soak)")
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir or 'auto' — completed phases are "
                         "skipped (train.py phase-skip meta); totals are "
                         "then computed from metrics.jsonl run segments so "
                         "a resumed soak reports full-run throughput")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent compilation cache (works through the axon tunnel,
        # measured 1.8 s -> 0.47 s across processes): a prior warmup run
        # makes the artifact run's ~12 phase programs compile ~instantly,
        # so utt_per_sec measures the trainer, not XLA.
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models.hubert import HubertConfig
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
    from edge_diffusion_tts_tpu.training import (
        Trainer, make_optimizer, train,
    )
    from edge_diffusion_tts_tpu.training.train import init_models

    s = args.scale
    cfg = CFG(
        seed=0,
        out_dir=args.out,
        run_name="soak",
        batch_size=32,
        grad_accumulation=1,
        lr=4e-4,                      # b32: scaled up from the b4 reference 2e-4
        diffusion_epochs=int(500 * s),
        progressive_epochs_per_halving=int(25 * s),
        consistency_epochs=int(150 * s),
        log_every_steps=50,
        val_every_steps=200,
        val_batches=1,
        plot_every_steps=4000,
        ckpt_every_steps=4000,
        dropout=0.1,                  # small synthetic corpus: light reg
        cfg_dropout=0.1,
        steps_per_dispatch=max(args.chain, 1),
        # Throughput: every best_model save writes the full state incl. the
        # 380 MB frozen HuBERT (~10 s); validate once per 5 epochs and only
        # re-save on a >= 0.01 val_cos improvement.
        best_min_delta=0.01,
        validate_every_epochs=5,
    )
    for name, val in (
        ("diffusion_epochs", args.diffusion_epochs),
        ("progressive_epochs_per_halving", args.progressive_epochs),
        ("consistency_epochs", args.consistency_epochs),
        ("lr", args.lr),
        ("lr_consistency", args.lr_consistency),
        ("consistency_weight", args.consistency_weight),
        ("hubert_layer", args.hubert_layer),
    ):
        if val is not None:
            setattr(cfg, name, val)
    cfg.ckpt_path = os.path.join(args.out, "checkpoint_latest")
    hubert_cfg = HubertConfig()       # full-size ~95M (random init, frozen)
    n_train, n_val = args.n_train, args.n_val
    if args.smoke:
        hubert_cfg = HubertConfig.tiny()
        cfg.hidden, cfg.layers, cfg.heads = 16, 1, 2
        cfg.segment_len, cfg.batch_size = 960, 2
        cfg.diff_steps, cfg.max_timestep = 8, 7
        cfg.diffusion_epochs = 2
        cfg.progressive_epochs_per_halving = 1
        cfg.consistency_epochs = 1
        cfg.log_every_steps = 1
        cfg.val_every_steps = 2
        cfg.plot_every_steps = 0
        cfg.ckpt_every_steps = 0
        n_train, n_val = 4, 2

    corpus_fn = CORPORA[args.corpus]
    train_wavs = corpus_fn(n_train, cfg.segment_len, cfg.sample_rate,
                           seed=100)
    val_wavs = corpus_fn(n_val, cfg.segment_len, cfg.sample_rate, seed=200)
    train_loader = CorpusLoader(train_wavs, cfg.batch_size, seed=1)
    val_loader = CorpusLoader(val_wavs, cfg.batch_size, seed=2, shuffle=False)

    t0 = time.time()
    state = train(
        cfg, train_loader=train_loader, val_loader=val_loader,
        hubert_cfg=hubert_cfg, resume=args.resume,
        phases=["diffusion", "progressive", "consistency"],
    )
    wall = time.time() - t0
    total_steps = int(state.step)

    # Active wall-clock across run segments: a resumed soak (crash ->
    # --resume) must not count the dead time between runs, nor divide the
    # full step count by only the last segment's wall.  metrics.jsonl
    # timestamps are ground truth; a >300 s gap between consecutive records
    # marks a run break.
    times = []
    metrics_path = os.path.join(cfg.get_run_dir(), "metrics.jsonl")
    with open(metrics_path) as f:
        for line in f:
            times.append(json.loads(line)["time"])
    active_wall, seg_start = 0.0, times[0]
    for prev, cur in zip(times, times[1:]):
        if cur - prev > 300.0:
            active_wall += prev - seg_start
            seg_start = cur
    active_wall += times[-1] - seg_start
    wall = active_wall if args.resume else wall

    # ---- end-of-run scoring: the consistency-training property --------------
    # Same scoring path as tests/test_training.py::
    # test_training_dynamics_regression: DPM++ val cosine at 4 and 1 steps on
    # the held-out batch, vs a fresh init.
    encoder, decoder, params0, vq0 = init_models(
        CFG.from_dict(cfg.to_dict()), jax.random.PRNGKey(0),
        hubert_cfg=hubert_cfg,
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    trainer = Trainer(cfg, encoder, decoder, schedule, make_optimizer(cfg, 10))
    import jax.numpy as jnp

    dev_batch = {"wav": jnp.asarray(val_wavs[: cfg.batch_size])}
    rng = jax.random.PRNGKey(42)
    val4 = trainer.make_validate_fn(num_steps=4)
    val1 = trainer.make_validate_fn(num_steps=1)
    cos_init = float(val4(params0, vq0, dev_batch, rng)["val_cos"])
    cos4 = float(val4(state.params, state.vq_state, dev_batch, rng)["val_cos"])
    cos1 = float(val1(state.params, state.vq_state, dev_batch, rng)["val_cos"])

    n_dec = sum(
        int(np.prod(p.shape))
        for p in jax.tree.leaves(state.params["decoder"])
    )
    n_enc = sum(
        int(np.prod(p.shape))
        for p in jax.tree.leaves(state.params["encoder"])
    )
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
    except Exception:
        commit = "unknown"

    artifact = {
        "meta": {
            "what": "full-scale 3-phase training soak (tools/soak_train.py)",
            "device": jax.devices()[0].device_kind,
            "commit": commit,
            "resumed_from": args.resume,
            "date": time.strftime("%Y-%m-%d"),
            "recipe": "diffusion -> progressive halvings 1000->4 -> consistency "
                      "(reference train.py:25-307)",
            "scales": {
                "decoder_params": n_dec,
                "encoder_params": n_enc,
                "hubert": "full-size HuBERT-base (random init, frozen; "
                          "no pretrained weights / LJSpeech in this env)",
                "batch_size": cfg.batch_size,
                "corpus": f"{n_train} train / {n_val} val synthetic {args.corpus} "
                          f"utterances, 2 s @ 16 kHz (CORPORA[{args.corpus!r}])",
            },
            "config": {
                "lr": cfg.lr, "lr_consistency": cfg.lr_consistency,
                "diffusion_epochs": cfg.diffusion_epochs,
                "progressive_epochs_per_halving":
                    cfg.progressive_epochs_per_halving,
                "consistency_epochs": cfg.consistency_epochs,
                "dropout": cfg.dropout, "cfg_dropout": cfg.cfg_dropout,
                "steps_per_dispatch": cfg.steps_per_dispatch,
                "consistency_weight": cfg.consistency_weight,
            },
        },
        "totals": {
            "steps": total_steps,
            "wall_s": round(wall, 1),
            "utt_per_sec": round(total_steps * cfg.batch_size / wall, 1),
        },
        "final_scores": {
            "val_cos_init_4step": round(cos_init, 4),
            "val_cos_4step": round(cos4, 4),
            "val_cos_1step": round(cos1, 4),
            "one_step_ends_best": bool(cos1 >= cos4),
        },
        "trajectories": phase_trajectories(
            os.path.join(cfg.get_run_dir(), "metrics.jsonl")
        ),
    }
    with open(args.artifact, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["final_scores"]))
    print(json.dumps(artifact["totals"]))
    print(f"wrote {args.artifact}")


if __name__ == "__main__":
    main()
