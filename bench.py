"""Benchmark: 4-step mel generation latency for a 5 s utterance, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): < 50 ms on one TPU v5e chip for 4-step
generation of a 5 s LJSpeech utterance.  vs_baseline = baseline_ms / measured
(>1.0 means faster than the target).  Details go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MS = 50.0
AUDIO_SECS = 5.0
WARMUP = 3
RUNS = 20


def main():
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.inference import EdgeInference
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule

    cfg = CFG()
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)

    # 5 s @ 16 kHz -> HuBERT 50 Hz tokens -> mel at 100 Hz (T_out = 2 * S).
    n_tokens = int(AUDIO_SECS * 50)
    sem_idx = jax.random.randint(
        jax.random.PRNGKey(1), (1, n_tokens), 0, cfg.effective_codebook_size()
    )

    inf = EdgeInference(
        cfg,
        schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params,
    )

    rng = jax.random.PRNGKey(2)
    for _ in range(WARMUP):
        jax.block_until_ready(inf.generate_mel(sem_idx, num_steps=4, rng=rng))

    times = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        out = inf.generate_mel(sem_idx, num_steps=4, rng=rng)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)

    times.sort()
    median_ms = times[len(times) // 2]
    print(
        f"backend={jax.default_backend()} device={jax.devices()[0]} "
        f"median={median_ms:.2f}ms min={times[0]:.2f}ms max={times[-1]:.2f}ms "
        f"rtf={AUDIO_SECS / (median_ms / 1e3):.1f}x realtime",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "4step_melgen_latency_5s",
                "value": round(median_ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / median_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
