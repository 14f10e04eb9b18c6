"""Benchmark: 4-step mel generation latency for a 5 s utterance, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): < 50 ms on one TPU v5e chip for 4-step
generation of a 5 s LJSpeech utterance.  vs_baseline = baseline_ms / measured
(>1.0 means faster than the target).

Methodology: the headline number is device latency measured by timing a chain
of REPS sequentially-dependent generations inside ONE jitted program and
dividing — this isolates device time from the host->TPU tunnel's ~30 ms
completion-polling quantum, which would otherwise dominate (a single
dispatch measures ~28 ms wall clock of which <2 ms is device time; on
locally-attached TPU hardware dispatch overhead is sub-0.1 ms).  The
single-dispatch wall-clock number is reported on stderr alongside.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MS = 50.0
AUDIO_SECS = 5.0
WARMUP = 2
RUNS = 8
REPS = 25  # chained generations per timed program


def main():
    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.inference import EdgeInference
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule, ddim_sample

    cfg = CFG()
    decoder = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(decoder, jax.random.PRNGKey(0), cfg)["params"]
    schedule = DiffusionSchedule.create(cfg.diff_steps)

    # 5 s @ 16 kHz -> 50 Hz HuBERT tokens -> 100 Hz mel frames (T = 2 * S).
    n_tokens = int(AUDIO_SECS * 50)
    sem_idx = jax.random.randint(
        jax.random.PRNGKey(1), (1, n_tokens), 0, cfg.effective_codebook_size()
    )

    # --- amortized device latency: REPS dependent generations, one program ---
    @jax.jit
    def chained(params, sem_idx, rng):
        def body(key, _):
            k_next, k_noise = jax.random.split(key)
            x_T = jax.random.normal(k_noise, (1, n_tokens * 2, cfg.n_mels))

            def model_fn(x, t, si):
                return decoder.apply(
                    {"params": params}, x, t, sem_idx=sem_idx, step_idx=si
                )

            x0 = ddim_sample(schedule, model_fn, x_T, 4, prediction="eps")
            return k_next, x0[0, 0, 0]

        _, outs = jax.lax.scan(body, rng, None, length=REPS)
        return outs.sum()

    for _ in range(WARMUP):
        jax.block_until_ready(chained(params, sem_idx, jax.random.PRNGKey(2)))
    totals = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(params, sem_idx, jax.random.PRNGKey(3 + i)))
        totals.append((time.perf_counter() - t0) * 1e3)
    totals.sort()
    amortized_ms = totals[len(totals) // 2] / REPS

    # --- single-dispatch wall clock (includes host/tunnel overhead) ---
    inf = EdgeInference(
        cfg,
        schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params,
    )
    rng = jax.random.PRNGKey(9)
    jax.block_until_ready(inf.generate_mel(sem_idx, num_steps=4, rng=rng))
    singles = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        jax.block_until_ready(inf.generate_mel(sem_idx, num_steps=4, rng=rng))
        singles.append((time.perf_counter() - t0) * 1e3)
    singles.sort()
    single_ms = singles[len(singles) // 2]

    print(
        f"backend={jax.default_backend()} device={jax.devices()[0]} "
        f"amortized={amortized_ms:.3f}ms/gen (chain of {REPS}) "
        f"single_dispatch={single_ms:.2f}ms "
        f"rtf={AUDIO_SECS / (amortized_ms / 1e3):.0f}x realtime",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "4step_melgen_latency_5s",
                "value": round(amortized_ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / amortized_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
