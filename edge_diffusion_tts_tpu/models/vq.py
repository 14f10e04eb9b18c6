"""Vector quantizer with EMA codebook updates and dead-code resets.

The torch reference mutates registered buffers in place
(reference: edge_diffusion_tts/models/vq.py:10-163); here all statistics
(codebook, EMA cluster sizes, EMA weights, update counter) live in a mutable
flax variable collection ``"vq_state"`` that is threaded functionally:
``apply(..., mutable=["vq_state"])`` returns the updated state.  Dead-code
resets draw replacement vectors with an explicit PRNG key (rng stream "vq").
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fsq import count_code_usage, usage_metrics


class VectorQuantizer(nn.Module):
    """Classic VQ-VAE quantizer: L2-nearest lookup + straight-through.

    Losses: codebook MSE + ``commit`` * commitment MSE.  With ``decay`` > 0 the
    codebook is maintained by EMA; every ``reset_unused_every`` updates, codes
    with EMA cluster size < 1 are replaced by random batch vectors.
    """

    dim: int
    codebook_size: int
    commit: float = 0.25
    decay: float = 0.99
    epsilon: float = 1e-5
    reset_unused_every: int = 100
    # Mesh axis the batch is sharded over (shard_map data parallelism).
    # When set, the EMA statistics are psum'd so the update equals the
    # single-device big-batch update (a pmean of per-shard EMA results would
    # dilute cluster counts by the shard count and falsely kill live codes),
    # and dead-code resets draw identical replacements on every shard from
    # the all-gathered batch.
    axis_name: "str | None" = None

    def setup(self):
        init_key = jax.random.PRNGKey(0)

        def _codebook_init():
            return jax.random.normal(
                init_key, (self.codebook_size, self.dim), jnp.float32
            )

        self.codebook = self.variable("vq_state", "codebook", _codebook_init)
        self.ema_cluster_size = self.variable(
            "vq_state", "ema_cluster_size", lambda: jnp.ones(self.codebook_size)
        )
        self.ema_w = self.variable("vq_state", "ema_w", _codebook_init)
        self.update_count = self.variable(
            "vq_state", "update_count", lambda: jnp.zeros((), jnp.int32)
        )

    def _nearest(self, flat: jnp.ndarray) -> jnp.ndarray:
        cb = self.codebook.value
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ cb.T
            + jnp.sum(cb**2, axis=1)[None, :]
        )
        return jnp.argmin(dist, axis=1)

    def __call__(
        self, z: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, T, D = z.shape
        flat = z.reshape(-1, D).astype(jnp.float32)
        idx = self._nearest(jax.lax.stop_gradient(flat))
        z_q = jnp.take(self.codebook.value, idx, axis=0).reshape(B, T, D)

        if train:
            # Codebook gradient is irrelevant under EMA (the reference
            # overwrites the embedding weight every step, vq.py:124); keep the
            # loss value for parity, route gradient only through commitment.
            codebook_loss = jnp.mean(
                (jax.lax.stop_gradient(z) - z_q) ** 2
            )
            commit_loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
            vq_loss = codebook_loss + self.commit * commit_loss
            if self.decay > 0:
                self._ema_update(jax.lax.stop_gradient(flat), idx)
        else:
            vq_loss = jnp.asarray(0.0, jnp.float32)

        # Straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q - z)

        counts = jax.lax.stop_gradient(count_code_usage(idx, self.codebook_size))
        perplexity, used = usage_metrics(counts)
        return z_q, idx.reshape(B, T), vq_loss, perplexity, used

    def _ema_update(self, flat: jnp.ndarray, idx: jnp.ndarray):
        """EMA cluster/weight update + periodic dead-code reset.

        Functional re-statement of the reference in-place update
        (vq.py:109-145); the reset branch is selected with jnp.where so the
        step stays trace-once under jit.
        """
        one_hot = jax.nn.one_hot(idx, self.codebook_size, dtype=jnp.float32)
        n = jnp.sum(one_hot, axis=0)
        dw = one_hot.T @ flat
        if self.axis_name is not None:
            # Global-batch statistics: n/dw are SUMS over batch rows, so the
            # big-batch-equivalent reduction is psum, applied to the raw
            # stats BEFORE the EMA blend (see axis_name docstring).
            n = jax.lax.psum(n, self.axis_name)
            dw = jax.lax.psum(dw, self.axis_name)
        ema_n = self.ema_cluster_size.value * self.decay + n * (1.0 - self.decay)
        ema_w = self.ema_w.value * self.decay + dw * (1.0 - self.decay)
        codebook = ema_w / jnp.clip(ema_n, self.epsilon)[:, None]

        count = self.update_count.value + 1

        if self.reset_unused_every > 0:
            do_reset = (count % self.reset_unused_every) == 0
            dead = ema_n < 1.0
            # Random batch vectors as replacements: permute batch rows, then
            # for each dead code pick a (deterministically scattered) row.
            key = self.make_rng("vq")
            cand = flat
            if self.axis_name is not None:
                # Every shard must overwrite dead codes with IDENTICAL
                # vectors (the codebook is replicated state).  The candidate
                # pool and key are made shard-invariant via psum-scatter
                # rather than all_gather: psum outputs carry the replicated
                # vma type, so the updated vq_state stays expressible with
                # out_specs P() in the DP step (all_gather results are
                # conservatively typed as varying).
                ax = self.axis_name
                rows = flat.shape[0]
                buf = jnp.zeros(
                    (jax.lax.axis_size(ax) * rows, flat.shape[1]), flat.dtype
                )
                cand = jax.lax.psum(
                    jax.lax.dynamic_update_slice_in_dim(
                        buf, flat, jax.lax.axis_index(ax) * rows, 0
                    ),
                    ax,
                )
                # Raw uint32 key words summed across shards: deterministic
                # and identical everywhere (callers fold the step rng per
                # shard, so the local "vq" stream differs).
                key = jax.lax.psum(key, ax)
            perm = jax.random.permutation(key, cand.shape[0])
            # Rank of each dead code among dead codes -> which batch row it takes
            dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
            row = jnp.take(perm, jnp.clip(dead_rank, 0, cand.shape[0] - 1))
            replacement = jnp.take(cand, row, axis=0)
            replace_mask = (
                dead & (dead_rank < cand.shape[0]) & do_reset
            )[:, None]
            codebook = jnp.where(replace_mask, replacement, codebook)
            ema_w = jnp.where(replace_mask, replacement, ema_w)
            ema_n = jnp.where(replace_mask[:, 0], 1.0, ema_n)

        self.ema_cluster_size.value = ema_n
        self.ema_w.value = ema_w
        self.codebook.value = codebook
        self.update_count.value = count

    def encode(self, z: jnp.ndarray) -> jnp.ndarray:
        B, T, D = z.shape
        return self._nearest(z.reshape(-1, D)).reshape(B, T)

    def decode(self, idx: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.codebook.value, idx, axis=0)
