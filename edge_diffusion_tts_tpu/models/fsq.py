"""Finite Scalar Quantization (FSQ) — fully jittable, STE via stop_gradient.

FSQ bounds each latent dimension with tanh, rounds to a fixed number of
levels, and maps codes <-> flat indices through a mixed-radix basis.  No
codebook, no EMA, no commitment loss.

Reference behavior: edge_diffusion_tts/models/fsq.py (FSQ 19-132,
FSQEncoder 135-222); default levels [4,4,3,3,2,2,2,2] -> 2304 codes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FSQ(nn.Module):
    """Quantize each of len(levels) dims to its own number of levels."""

    levels: Sequence[int]

    @property
    def dim(self) -> int:
        return len(self.levels)

    @property
    def codebook_size(self) -> int:
        n = 1
        for l in self.levels:
            n *= l
        return n

    num_codes = codebook_size

    def _levels_arr(self) -> jnp.ndarray:
        return jnp.asarray(list(self.levels), dtype=jnp.float32)

    def _basis(self) -> jnp.ndarray:
        return jnp.asarray(
            np.cumprod([1] + list(self.levels)[:-1]), dtype=jnp.int32
        )

    def bound(self, z: jnp.ndarray) -> jnp.ndarray:
        return jnp.tanh(z)

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """Round bounded z in [-1, 1] to per-dim levels, back to [-1, 1]."""
        half = (self._levels_arr() - 1.0) / 2.0
        z_scaled = (z + 1.0) * half
        z_q = jnp.round(z_scaled)
        z_q = jnp.clip(z_q, 0.0, self._levels_arr() - 1.0)
        return z_q / half - 1.0

    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (quantized with straight-through gradient, flat indices)."""
        z_b = self.bound(z)
        z_q = self.quantize(z_b)
        z_q_ste = z_b + jax.lax.stop_gradient(z_q - z_b)
        indices = self.codes_to_indices(z_q)
        return z_q_ste, indices

    def codes_to_indices(self, z_q: jnp.ndarray) -> jnp.ndarray:
        half = (self._levels_arr() - 1.0) / 2.0
        codes = jnp.round((z_q + 1.0) * half).astype(jnp.int32)
        return jnp.sum(codes * self._basis(), axis=-1)

    def indices_to_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        # Mixed-radix decode, inverse of codes_to_indices: with basis
        # cumprod([1, L0, L0*L1, ...]), dim 0 is the LEAST significant digit.
        levels = jnp.asarray(list(self.levels), dtype=jnp.int32)
        rem = indices
        codes = []
        for i in range(self.dim):
            codes.append(rem % levels[i])
            rem = rem // levels[i]
        codes = jnp.stack(codes, axis=-1).astype(jnp.float32)
        half = (self._levels_arr() - 1.0) / 2.0
        return codes / half - 1.0


def count_code_usage(indices: jnp.ndarray, num_codes: int) -> jnp.ndarray:
    """Device-resident histogram of code usage (segment-sum, no host sync).

    TPU equivalent of the reference's scatter_add_ counting
    (fsq.py:200-209).
    """
    flat = indices.reshape(-1)
    ones = jnp.ones_like(flat, dtype=jnp.float32)
    return jax.ops.segment_sum(ones, flat, num_segments=num_codes)


def usage_metrics(counts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(perplexity, number of used codes) from a usage histogram."""
    probs = counts / jnp.clip(jnp.sum(counts), 1.0)
    perplexity = jnp.exp(-jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12))))
    used = jnp.sum(counts > 0)
    return perplexity, used


class FSQEncoder(nn.Module):
    """proj_down(input_dim -> len(levels)) -> FSQ -> proj_up, VQ-compatible.

    Returns the 5-tuple (z_q, indices, loss(=0), perplexity, used) so it is a
    drop-in replacement for VectorQuantizer (reference: fsq.py:159-198).
    """

    input_dim: int
    levels: Sequence[int] = (8, 6, 5, 5, 5)
    dtype: jnp.dtype = jnp.float32

    @property
    def codebook_size(self) -> int:
        n = 1
        for l in self.levels:
            n *= l
        return n

    def setup(self):
        fsq_dim = len(self.levels)
        self.fsq = FSQ(self.levels)
        self.proj_down = nn.Dense(fsq_dim, dtype=self.dtype, name="proj_down")
        self.proj_up = nn.Dense(self.input_dim, dtype=self.dtype, name="proj_up")

    def __call__(self, z: jnp.ndarray):
        z_low = self.proj_down(z)
        z_q_low, indices = self.fsq(z_low)
        z_q = self.proj_up(z_q_low)

        counts = jax.lax.stop_gradient(
            count_code_usage(indices, self.codebook_size)
        )
        perplexity, used = usage_metrics(counts)
        loss = jnp.asarray(0.0, dtype=jnp.float32)
        return z_q, indices, loss, perplexity, used

    def encode(self, z: jnp.ndarray) -> jnp.ndarray:
        z_low = self.proj_down(z)
        _, indices = self.fsq(z_low)
        return indices

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        z_q_low = self.fsq.indices_to_codes(indices)
        return self.proj_up(z_q_low)
