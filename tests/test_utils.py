"""Utility coverage: MetricWriter JSONL, TimingContext, benchmark stats,
memory stats, remat wrapper."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_diffusion_tts_tpu.utils import (
    MetricWriter,
    TimingContext,
    benchmark,
    memory_stats,
)


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    w.write(1, {"loss": jnp.asarray(0.5), "n": 3}, prefix="train/")
    w.write(2, {"loss": 0.25})
    w.close()
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["step"] == 1 and abs(recs[0]["train/loss"] - 0.5) < 1e-6
    assert recs[1]["loss"] == 0.25


def test_metric_writer_skips_non_numeric(tmp_path):
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    w.write(1, {"ok": 1.0, "bad": "string", "arr": np.ones(3)})
    w.close()
    rec = json.loads(open(tmp_path / "metrics.jsonl").read())
    assert "ok" in rec and "bad" not in rec


def test_timing_context():
    with TimingContext("t", verbose=False) as tc:
        jnp.ones((8, 8)).sum()
    assert tc.elapsed_ms > 0


def test_benchmark_stats():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((16, 16))
    stats = benchmark(f, x, warmup=1, runs=3)
    assert stats["runs"] == 3
    assert stats["min_ms"] <= stats["median_ms"] <= stats["max_ms"]


def test_memory_stats_shape():
    stats = memory_stats()
    assert isinstance(stats, dict)


@pytest.mark.slow
def test_remat_decoder_wraps():
    import flax.linen as nn

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.utils import remat_decoder

    Remat = remat_decoder(EdgeDiffusionDecoder)
    cfg = CFG(hidden=32, layers=1, heads=2, dropout=0.0)
    dec = Remat(cfg)
    x = jnp.zeros((1, 8, cfg.n_mels))
    params = dec.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
        sem_idx=jnp.zeros((1, 4), jnp.int32),
    )
    y = dec.apply(params, x, jnp.zeros((1,), jnp.int32),
                  sem_idx=jnp.zeros((1, 4), jnp.int32))
    assert y.shape == (1, 8, cfg.n_mels)


def test_fit_device_ms_recovers_slope():
    """fit_device_ms must recover per-iteration time from walls that include
    a fixed overhead and snap to a completion-poll quantum (the tunnel's
    observed behavior: wall = quantize(overhead + reps * d))."""
    import math

    from edge_diffusion_tts_tpu.utils.speed import fit_device_ms

    d_true = 0.05  # ms per iteration
    overhead = 5.0  # ms fixed dispatch cost
    quantum = 6.0  # ms completion-poll interval

    def chain_builder(reps):
        def run():
            import time as _t

            wall = overhead + reps * d_true
            wall = math.ceil(wall / quantum) * quantum
            _t.sleep(wall / 1e3)
            return 0.0

        return run

    fit = fit_device_ms(
        chain_builder, reps=(10, 100), runs=3, min_spread_ms=50.0,
        max_reps=5000,
    )
    # Spread >= 50 ms guarantees the +-1-quantum snap error stays < ~25%.
    assert abs(fit["device_ms"] - d_true) / d_true < 0.3, fit
    assert fit["wall_hi_ms"] - fit["wall_lo_ms"] >= 50.0


def test_scan_chain_builder_modes():
    """scan_chain_builder: keyed mode runs reps bodies with distinct keys;
    carry mode threads data through and sums the per-iteration scalars."""
    import jax
    import jax.numpy as jnp

    from edge_diffusion_tts_tpu.utils.speed import scan_chain_builder

    # Keyed mode: distinct keys per iteration -> sum of reps draws; a
    # single draw repeated would give reps * draw(key0) instead.
    seen = scan_chain_builder(lambda key: jax.random.normal(key, ()))
    r4 = float(seen(4)())
    r1 = float(seen(1)())
    assert r4 != pytest.approx(4 * r1)

    # Carry mode: body(c, key) = (c+1, c) -> sum(0..reps-1), exactly.
    def body(c, key):
        return c + 1.0, c

    chain = scan_chain_builder(body, carry=jnp.zeros(()))
    assert float(chain(5)()) == pytest.approx(10.0)

    # Args are threaded through as jit arguments.
    def body2(key, scale):
        return scale * 2.0

    chain2 = scan_chain_builder(body2, (jnp.float32(3.0),))
    assert float(chain2(4)()) == pytest.approx(24.0)
