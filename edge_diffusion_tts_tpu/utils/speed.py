"""Performance utilities: timing, benchmarking, profiling, checkpointed scans.

TPU-native equivalents of the reference's speed toolkit (reference:
edge_diffusion_tts/utils/speed_utils.py):

  torch.compile            -> jax.jit (applied throughout the framework)
  AMP/GradScaler           -> bf16 compute dtype (no loss scaling on TPU)
  fused AdamW              -> optax.adamw (fused under XLA)
  gradient checkpointing   -> jax.checkpoint / nn.remat (``remat_decoder``)
  TimingContext            -> TimingContext (block_until_ready, not cudaSync)
  benchmark_model          -> benchmark (warmup + timed runs, full stats)
  profiler                 -> jax.profiler trace helpers
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable, Dict, Optional

import jax


class TimingContext:
    """Wall-clock timing that synchronizes on device completion.

    Reference: speed_utils.py:161-182 (CUDA-sync timing context).
    """

    def __init__(self, name: str = "block", verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed_ms: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        # Synchronize: a 4-byte D2H fetch, NOT block_until_ready — through
        # the remote TPU tunnel block_until_ready returns before small
        # programs actually finish (measured: 0.03 ms reported vs 69 ms
        # real; see CLAUDE.md).  The fetched scalar depends on fresh device
        # work dispatched behind everything timed, so its arrival bounds
        # completion.  For per-iteration device time prefer fit_device_ms.
        float(jax.device_put(0.0) + 0.0)
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        if self.verbose:
            print(f"[{self.name}] {self.elapsed_ms:.2f} ms")
        return False


def benchmark(
    fn: Callable,
    *args,
    warmup: int = 5,
    runs: int = 20,
    **kwargs,
) -> Dict[str, float]:
    """Warmup + timed runs; returns stats in ms.

    Reference: speed_utils.py:185-226 (benchmark_model).  The completion
    barrier is a scalar D2H fetch of the result's first element —
    block_until_ready is NOT a reliable barrier through the remote TPU
    tunnel (CLAUDE.md).  For tunnel-robust per-iteration device time use
    fit_device_ms instead; this is the quick wall-clock utility.
    """
    def _sync(result):
        leaf = jax.tree.leaves(result)
        if leaf and hasattr(leaf[0], "ravel"):
            float(leaf[0].ravel()[0])
        else:
            jax.block_until_ready(result)

    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _sync(fn(*args, **kwargs))
        times.append((time.perf_counter() - t0) * 1e3)
    return {
        "mean_ms": statistics.mean(times),
        "median_ms": statistics.median(times),
        "min_ms": min(times),
        "max_ms": max(times),
        "std_ms": statistics.stdev(times) if len(times) > 1 else 0.0,
        "runs": float(runs),
    }


def scan_chain_builder(body: Callable, args: tuple = (), carry=None):
    """Build the ``chain_builder`` for :func:`fit_device_ms` from one body.

    The measurement pattern shared by every bench script: ``reps``
    sequentially-dependent iterations inside ONE jitted program (so the
    tunnel's fixed dispatch cost amortizes), each iteration keyed by a
    fresh PRNG split (so XLA cannot hoist the work as loop-invariant), all
    ``args`` passed as jit ARGUMENTS (large param trees must not become
    HLO constants), and the per-iteration scalars summed so the final
    fetch — the completion barrier — is 4 bytes.

    Two body shapes:
      ``body(key, *args) -> scalar``                       (carry=None)
      ``body(carry, key, *args) -> (carry, scalar)``       (explicit data
        carry, e.g. feeding an op's output back as its next input when the
        body itself draws no randomness)
    """
    import jax.numpy as jnp

    def build(reps: int):
        @jax.jit
        def run(rng, c0, *a):
            def step(st, _):
                key, c = st
                k_next, k_body = jax.random.split(key)
                if carry is None:
                    s = body(k_body, *a)
                    c_next = c
                else:
                    c_next, s = body(c, k_body, *a)
                return (k_next, c_next), jnp.asarray(s, jnp.float32)

            _, outs = jax.lax.scan(step, (rng, c0), None, length=reps)
            return outs.sum()

        c0 = carry if carry is not None else jnp.zeros(())
        return lambda: run(jax.random.PRNGKey(3), c0, *args)

    return build


def fit_device_ms(
    chain_builder: Callable,
    args: tuple = (),
    reps: tuple = (25, 200),
    runs: int = 5,
    min_spread_ms: float = 300.0,
    max_reps: int = 200_000,
) -> Dict[str, float]:
    """Per-iteration device time of a chained program via two-point fit.

    Through a high-latency dispatch path (e.g. a tunneled TPU) a single
    measurement conflates device time with a fixed per-dispatch overhead —
    and completion is observed by POLLING (~30 ms quantum here), so wall
    times snap to poll boundaries.  Model ``wall(reps) = overhead +
    reps * device_ms`` and fit the slope between chains of two lengths,
    AUTO-GROWING the long chain until the wall-time spread is at least
    ``min_spread_ms`` so the +-1-quantum snap error stays small.

    ``chain_builder(reps)`` must return a callable whose result is a SCALAR
    that is fetched (``float``) — through the tunnel, ``block_until_ready``
    does not reliably await small programs; only a D2H fetch is a
    trustworthy completion barrier.

    Returns {"device_ms", "overhead_ms", "wall_lo_ms", "wall_hi_ms",
    "reps_hi"}.
    """

    def median_wall(r):
        fn = chain_builder(r)
        float(fn(*args))  # compile + warmup, fetched
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    lo, hi = reps
    wall_lo = median_wall(lo)
    # Pilot estimate bounds device_ms from above (includes the overhead),
    # giving a first guess for a long-enough chain; then escalate as needed.
    d_ub = wall_lo / lo
    hi = max(hi, lo + int(min_spread_ms / max(d_ub, 1e-9)))
    hi = min(hi, max_reps)
    wall_hi = median_wall(hi)
    while wall_hi - wall_lo < min_spread_ms and hi < max_reps:
        hi = min(hi * 4, max_reps)
        wall_hi = median_wall(hi)

    d = max((wall_hi - wall_lo) / (hi - lo), 0.0)
    return {
        "device_ms": d,
        "overhead_ms": max(wall_lo - lo * d, 0.0),
        "wall_lo_ms": wall_lo,
        "wall_hi_ms": wall_hi,
        "reps_hi": float(hi),
    }


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (view with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def remat_decoder(decoder_cls, *args, **kwargs):
    """Gradient-checkpointed decoder: recompute block activations in backward.

    TPU equivalent of the reference's checkpointing monkey-patch
    (speed_utils.py:19-48) — trades FLOPs for HBM.  Usage:
    ``RematDecoder = remat_decoder(EdgeDiffusionDecoder); RematDecoder(cfg)``.
    """
    import flax.linen as nn

    return nn.remat(decoder_cls, *args, **kwargs)


def memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Device memory stats in MB (replaces speed_utils.memory_cleanup's role:
    on XLA, buffers free when their python references drop)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {k: v / 1e6 for k, v in stats.items() if isinstance(v, (int, float))}
