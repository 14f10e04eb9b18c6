"""Conditioning-information ceiling for the training soak -> CEILING_r04.json.

TRAIN_r03's open question (VERDICT r3): diffusion val_cos plateaus ~0.10 on
the synthetic corpus — is that a recipe bug or all the conditioning permits?
This tool measures the ceiling directly: train a DIRECT REGRESSION oracle
(semantic features -> normalized mel, no diffusion) on the same corpus/split
with the same encoder stack (random-init frozen HuBERT -> trainable proj ->
FSQ) and the same decoder trunk (x_t = 0, t = 0, output head reads the mel
prediction).  Its held-out val_cos is (an estimate of) the best cosine ANY
deterministic function of the conditioning can reach — the diffusion model,
which must also synthesize from noise, cannot beat it.

Runs chained (K steps per dispatch, same pattern as
Trainer.make_chained_step) so a few thousand steps take minutes through the
tunnel.

Usage:  python tools/ceiling_oracle.py [--steps 4000] [--chain 64]
        python tools/ceiling_oracle.py --smoke     # CPU plumbing check
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from soak_train import CORPORA, corpus_cached  # noqa: E402  (tools/ sibling)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--artifact", default="CEILING_r04.json")
    ap.add_argument("--corpus", choices=sorted(CORPORA), default="harmonic")
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--hubert-layer", type=int, default=None,
                    help="override cfg.hubert_layer (default 9; a RANDOM-"
                         "init frozen HuBERT mixes away local spectral "
                         "detail by layer 9 — shallower layers carry more "
                         "conditioning signal)")
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent compile cache (see tools/soak_train.py).
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )

    import jax.numpy as jnp
    import optax

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models.hubert import HubertConfig
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
    from edge_diffusion_tts_tpu.training import Trainer, init_models

    cfg = CFG(seed=0, out_dir="runs/ceiling_r04", batch_size=args.batch,
              grad_accumulation=1, dropout=0.1, cfg_dropout=0.0,
              token_align_weight=0.0)
    if args.hubert_layer is not None:
        cfg.hubert_layer = args.hubert_layer
    hubert_cfg = HubertConfig()
    n_train, n_val = args.n_train, args.n_val
    if args.smoke:
        hubert_cfg = HubertConfig.tiny()
        cfg.hidden, cfg.layers, cfg.heads = 16, 1, 2
        cfg.segment_len, cfg.batch_size = 960, 2
        args.steps, args.chain = 6, 3
        n_train, n_val = 4, 2

    train_wavs = corpus_cached(args.corpus, n_train, cfg.segment_len,
                               cfg.sample_rate, seed=100)
    val_wavs = corpus_cached(args.corpus, n_val, cfg.segment_len,
                             cfg.sample_rate, seed=200)

    rng = jax.random.PRNGKey(0)
    rng, k_init = jax.random.split(rng)
    encoder, decoder, params, vq_state = init_models(cfg, k_init, hubert_cfg)
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, max(args.steps // 20, 1), args.steps
            ),
            weight_decay=cfg.weight_decay,
        ),
    )
    # Freeze HuBERT exactly like training/state.make_optimizer.
    from edge_diffusion_tts_tpu.training.state import _is_frozen

    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        lambda p: jax.tree_util.tree_map_with_path(
            lambda path, _: "freeze" if _is_frozen(path) else "train", p
        ),
    )
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)

    def predict(params, batch, rng, train):
        """features -> decoder trunk at (x_t=0, t=0) -> mel prediction."""
        mel_n = trainer._mel_normalized(batch["wav"])
        k_enc, k_dec = jax.random.split(rng)
        (z_q, _, vq_loss, _, _), _ = trainer._encode(
            params, {}, batch, k_enc, train=train
        )
        B = mel_n.shape[0]
        pred = trainer._decode(
            params["decoder"],
            jnp.zeros_like(mel_n),
            jnp.zeros((B,), jnp.int32),
            rng=k_dec if train else None,
            deterministic=not train,
            sem_features=z_q,
            step_idx=jnp.zeros((B,), jnp.int32),
        )
        return pred, mel_n, vq_loss

    def cos(a, b):
        a = a.reshape(a.shape[0], -1)
        b = b.reshape(b.shape[0], -1)
        num = jnp.sum(a * b, axis=1)
        den = jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1) + 1e-8
        return jnp.mean(num / den)

    def loss_fn(params, batch, rng):
        pred, mel_n, vq_loss = predict(params, batch, rng, train=True)
        loss = jnp.mean(jnp.square(pred - mel_n)) + cfg.vq_commit * vq_loss
        return loss, {"loss": loss, "cos": cos(pred, mel_n)}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chained(params, opt_state, corpus, idx, rng):
        rngs = jax.random.split(rng, idx.shape[0])

        def body(carry, xs):
            p, o = carry
            row_idx, sub = xs
            batch = {"wav": jnp.take(corpus, row_idx, axis=0)}
            grads, metrics = jax.grad(loss_fn, has_aux=True)(p, batch, sub)
            updates, o = tx.update(grads, o, p)
            p = jax.tree.map(lambda a, u: a + u.astype(a.dtype), p, updates)
            return (p, o), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), (idx, rngs)
        )
        return params, opt_state, metrics

    @jax.jit
    def evaluate(params, batch, rng):
        pred, mel_n, _ = predict(params, batch, rng, train=False)
        return {"val_cos": cos(pred, mel_n),
                "val_mse": jnp.mean(jnp.square(pred - mel_n))}

    corpus = jnp.asarray(train_wavs)
    val_batch = {"wav": jnp.asarray(val_wavs[: cfg.batch_size])}
    opt_state = tx.init(params)
    rs = np.random.RandomState(1)
    n_rows, B = len(train_wavs), cfg.batch_size
    spe = n_rows // B

    t0 = time.time()
    done, traj = 0, []
    while done < args.steps:
        k = min(args.chain, args.steps - done)
        idx = np.stack([
            rs.permutation(n_rows)[:B] for _ in range(k)
        ]).astype(np.int32)
        rng, sub = jax.random.split(rng)
        params, opt_state, metrics = chained(
            params, opt_state, corpus, jnp.asarray(idx), sub
        )
        done += k
        rng, ev = jax.random.split(rng)
        m = evaluate(params, val_batch, ev)
        row = {
            "step": done,
            "train_cos": round(float(np.asarray(metrics["cos"])[-1]), 4),
            "train_loss": round(float(np.asarray(metrics["loss"])[-1]), 4),
            "val_cos": round(float(m["val_cos"]), 4),
            "val_mse": round(float(m["val_mse"]), 4),
        }
        traj.append(row)
        print(json.dumps(row), flush=True)
    wall = time.time() - t0

    best_val = max(r["val_cos"] for r in traj)
    artifact = {
        "meta": {
            "what": "direct-regression conditioning ceiling "
                    "(tools/ceiling_oracle.py): semantic features -> mel, "
                    "no diffusion; same encoder/decoder/corpus/split as the "
                    "soak",
            "device": jax.devices()[0].device_kind,
            "date": time.strftime("%Y-%m-%d"),
            "steps": args.steps, "chain": args.chain, "lr": args.lr,
            "batch": cfg.batch_size, "hubert_layer": cfg.hubert_layer,
            "corpus": f"{n_train} train / {n_val} val synthetic {args.corpus} "
                      f"utterances (soak_train.CORPORA)",
        },
        "ceiling": {
            "val_cos_best": best_val,
            "val_cos_final": traj[-1]["val_cos"],
            "train_cos_final": traj[-1]["train_cos"],
            "utt_per_sec": round(args.steps * cfg.batch_size / wall, 1),
            "wall_s": round(wall, 1),
        },
        "trajectory": traj[:: max(1, len(traj) // 100)],
    }
    with open(args.artifact, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["ceiling"]))
    print(f"wrote {args.artifact}")


if __name__ == "__main__":
    main()
