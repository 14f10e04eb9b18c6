"""Benchmark: 4-step mel generation latency for a 5 s utterance, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): < 50 ms on one TPU v5e chip for 4-step
generation of a 5 s LJSpeech utterance.  vs_baseline = baseline_ms / measured
(>1.0 means faster than the target).

Methodology: the headline number is per-generation DEVICE latency obtained
by a two-point amortization fit (utils/speed.py::fit_device_ms): chains of
REPS_LO and REPS_HI sequentially-dependent generations run inside single
jitted programs; wall(reps) = overhead + reps * device_ms isolates device
time from the host->TPU tunnel's fixed dispatch + completion-poll cost
(~30 ms here; sub-0.1 ms on locally-attached hardware).  The chain's scalar
result is FETCHED inside the timing loop: through the tunnel,
``block_until_ready`` does not reliably await completion of small programs;
a 4-byte D2H fetch is the trustworthy completion barrier.  The
single-dispatch wall-clock number is reported on stderr alongside.

The headline is measured on three backends — the XLA lax.scan denoise loop
(f32 and bf16 module compute) and the fused single-launch Pallas kernel
(ops/fused_denoise.py) — and the fastest is reported (stderr names which).
Each non-default backend is guarded: any failure falls back to XLA f32.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MS = 50.0
AUDIO_SECS = 5.0
RUNS = 8
REPS_LO, REPS_HI = 25, 200  # chain lengths for the two-point fit


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

    # --- device latency via two-point amortization fit ---
    from edge_diffusion_tts_tpu.utils.speed import (
        fit_device_ms,
        scan_chain_builder,
    )

    def ddim_body(dec):
        def body(key, params, sem_idx):
            x_T = jax.random.normal(key, (1, n_tokens * 2, cfg.n_mels))

            def model_fn(x, t, si):
                return dec.apply(
                    {"params": params}, x, t, sem_idx=sem_idx, step_idx=si
                )

            x0 = ddim_sample(schedule, model_fn, x_T, 4, prediction="eps")
            return x0[0, 0, 0]

        return body

    fit = fit_device_ms(
        scan_chain_builder(ddim_body(decoder), (params, sem_idx)),
        reps=(REPS_LO, REPS_HI), runs=RUNS,
    )
    amortized_ms = fit["device_ms"]
    backend_used = "xla"

    # --- bf16 module compute (params f32, matmuls bf16): measured fastest
    # at the flagship shape on v5e (0.207 vs 0.242 ms).  Guarded fallback.
    try:
        dec16 = EdgeDiffusionDecoder(cfg, dtype=jnp.bfloat16)
        fit16 = fit_device_ms(
            scan_chain_builder(ddim_body(dec16), (params, sem_idx)),
            reps=(REPS_LO, REPS_HI), runs=RUNS,
        )
        if 0.0 < fit16["device_ms"] < amortized_ms:
            fit, amortized_ms = fit16, fit16["device_ms"]
            backend_used = "xla_bf16"
    except Exception as e:  # pragma: no cover - TPU-only path
        print(f"# bf16 backend skipped: {e!r}", file=sys.stderr)

    # --- fused-Pallas single-launch backend (0.237 ms at this shape on
    # v5e — ties XLA f32, trails xla_bf16).  Guarded: falls back on failure.
    try:
        from edge_diffusion_tts_tpu.ops.fused_denoise import fused_generate_mel

        def fused_body(key, params, sem_idx):
            x_T = jax.random.normal(key, (1, n_tokens * 2, cfg.n_mels))
            x0 = fused_generate_mel(
                cfg, schedule, params, sem_idx, x_T, 4, "eps"
            )
            return x0[0, 0, 0]

        fused_fit = fit_device_ms(
            scan_chain_builder(fused_body, (params, sem_idx)),
            reps=(10, 80), runs=4,
        )
        if 0.0 < fused_fit["device_ms"] < amortized_ms:
            fit, amortized_ms = fused_fit, fused_fit["device_ms"]
            backend_used = "fused_pallas"
    except Exception as e:  # pragma: no cover - TPU-only path
        print(f"# fused backend skipped: {e!r}", file=sys.stderr)

    # --- single-dispatch wall clock (includes host/tunnel overhead) ---
    inf = EdgeInference(
        cfg,
        schedule,
        lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
        params,
    )
    rng = jax.random.PRNGKey(9)
    float(inf.generate_mel(sem_idx, num_steps=4, rng=rng)[0, 0, 0])
    singles = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        float(inf.generate_mel(sem_idx, num_steps=4, rng=rng)[0, 0, 0])
        singles.append((time.perf_counter() - t0) * 1e3)
    singles.sort()
    single_ms = singles[len(singles) // 2]

    print(
        f"backend={jax.default_backend()} device={jax.devices()[0]} "
        f"path={backend_used} device={amortized_ms:.3f}ms/gen (two-point fit, "
        f"dispatch overhead {fit['overhead_ms']:.1f}ms) "
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


def wait_for_backend(max_wait_s: float = 900.0, probe_timeout_s: float = 300.0):
    """Block until the TPU backend initializes (tunnel outages self-heal).

    The tunneled single-chip backend intermittently reports
    ``UNAVAILABLE: TPU backend setup/compile error`` for minutes at a time
    (observed wedges of 5-10 min after a killed compile).  Probing in a
    subprocess keeps this process's jax backend state clean: a failed init
    in-process would be cached for the lifetime of the interpreter.
    """
    import subprocess

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        # SIGTERM + grace instead of subprocess.run's timeout SIGKILL: a
        # hard-killed in-flight backend init can itself wedge the tunnel
        # for minutes (see CLAUDE.md), prolonging the outage being waited
        # out.
        p = subprocess.Popen(
            [sys.executable, "-c", "import jax; jax.devices()"],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        try:
            if p.wait(timeout=probe_timeout_s) == 0:
                return
        except subprocess.TimeoutExpired:
            p.terminate()
            try:
                p.wait(timeout=10.0)
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
        if time.time() >= deadline:
            print(
                f"bench: backend still unavailable after {attempt} probes / "
                f"{max_wait_s:.0f}s — proceeding anyway",
                file=sys.stderr,
            )
            return
        print(
            f"bench: TPU backend unavailable (probe {attempt}), retrying...",
            file=sys.stderr,
        )
        time.sleep(30.0)


if __name__ == "__main__":
    wait_for_backend()
    main()
