"""Two-process multi-host smoke: prove parallel/multihost.py works for real.

VERDICT r4 item 5: the multi-host scaffolding (init_multihost /
make_pod_mesh / host_local_batch) had only ever run inside ONE process on a
virtual mesh.  This tool drives it across two OS processes with a local
coordinator — ``jax.distributed.initialize`` + Gloo-backed CPU collectives —
and asserts the cross-process DP step computes EXACTLY the single-process
loss:

  - launcher (default): spawns 2 worker processes (2 local CPU devices
    each -> 4 global), then 1 single-process worker (4 local devices),
    compares losses, writes MULTIHOST_r05.json;
  - worker (--proc-id): init_multihost(coordinator, n, i) ->
    make_pod_mesh((2,), ("data",), dcn_data_parallelism=2) -> 4-device
    hybrid DCNxICI data mesh -> host_local_batch with THIS process's half
    of the batch -> one make_dp_diffusion_step (grad psum crosses the
    process boundary) -> prints the loss.

The torch reference is single-device (SURVEY §2.3); this extends the
framework's scaling story beyond parity.

Usage:  python tools/multihost_smoke.py [--artifact MULTIHOST_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 8


def worker(proc_id: int, procs: int, port: int, out: str):
    import jax

    # CPU only — the env var alone is ignored once the axon plugin
    # registered (CLAUDE.md); never touch the single-client TPU tunnel.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4 // procs)

    import jax.numpy as jnp
    import numpy as np

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models.hubert import HubertConfig
    from edge_diffusion_tts_tpu.parallel import (
        host_local_batch,
        init_multihost,
        make_pod_mesh,
        replicate,
    )
    from edge_diffusion_tts_tpu.parallel.data_parallel import (
        make_dp_diffusion_step,
    )
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
    from edge_diffusion_tts_tpu.training import (
        Trainer,
        create_train_state,
        init_models,
        make_optimizer,
    )

    if procs > 1:
        pid, cnt = init_multihost(f"localhost:{port}", procs, proc_id)
        assert (pid, cnt) == (proc_id, procs), (pid, cnt)
    else:
        assert init_multihost() == (0, 1)
    assert jax.device_count() == 4, jax.device_count()

    cfg = CFG(
        hidden=32, layers=1, heads=2, segment_secs=0.1, batch_size=BATCH,
        grad_accumulation=1, diff_steps=50, max_timestep=48, dropout=0.0,
    )
    encoder, decoder, params, vq_state = init_models(
        cfg, jax.random.PRNGKey(0), hubert_cfg=HubertConfig.tiny()
    )
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    tx = make_optimizer(cfg, total_steps=100)
    trainer = Trainer(cfg, encoder, decoder, schedule, tx)

    # Every process holds the same global corpus and feeds ONLY its slice.
    wav = np.random.RandomState(0).randn(BATCH, cfg.segment_len).astype(
        np.float32
    ) * 0.1
    rows = BATCH // procs
    local = wav[proc_id * rows:(proc_id + 1) * rows]

    mesh = make_pod_mesh(
        (4 // procs,), ("data",),
        dcn_data_parallelism=procs,
    )
    step = make_dp_diffusion_step(trainer, mesh)
    with mesh:
        state = replicate(
            create_train_state(
                cfg, jax.tree.map(jnp.array, params),
                jax.tree.map(jnp.array, vq_state), tx,
            ),
            mesh,
        )
        batch = host_local_batch({"wav": local}, mesh)
        assert batch["wav"].shape == (BATCH, cfg.segment_len)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
        grad_norm = float(metrics.get("grad_norm", float("nan")))
    if proc_id == 0:
        with open(out, "w") as f:
            json.dump({"loss": loss, "grad_norm": grad_norm,
                       "procs": procs, "devices": jax.device_count()}, f)
    print(f"proc {proc_id}/{procs}: loss={loss:.6f}", flush=True)


def free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def launch(artifact: str, timeout_s: float = 900.0) -> dict:
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    me = os.path.abspath(__file__)
    out2 = f"/tmp/mh_smoke_2p_{os.getpid()}.json"
    out1 = f"/tmp/mh_smoke_1p_{os.getpid()}.json"

    port = free_port()
    t0 = time.time()
    # Workers are Gloo-coupled: drain both stdouts via files (a sequential
    # communicate() can deadlock if the second worker fills its pipe while
    # the first blocks in the collective), and kill BOTH on any timeout so
    # the pre-commit gate never leaks a process.
    log_files = [
        open(f"/tmp/mh_smoke_w{i}_{os.getpid()}.log", "w+") for i in range(2)
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, me, "--proc-id", str(i), "--procs", "2",
             "--port", str(port), "--out", out2],
            env=env, cwd=REPO,
            stdout=log_files[i], stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    try:
        deadline = t0 + timeout_s
        for p in procs:
            p.wait(timeout=max(deadline - time.time(), 1.0))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    logs = []
    for f in log_files:
        f.seek(0)
        logs.append(f.read())
        f.close()
    rcs = [p.returncode for p in procs]
    wall2 = time.time() - t0
    if any(rcs):
        for i, log in enumerate(logs):
            print(f"--- worker {i} (rc={rcs[i]}) ---\n{log[-2000:]}")
        raise SystemExit(f"multi-process workers failed: rcs={rcs}")

    t0 = time.time()
    one = subprocess.run(
        [sys.executable, me, "--proc-id", "0", "--procs", "1",
         "--port", "0", "--out", out1],
        env=env, cwd=REPO, capture_output=True, text=True,
        timeout=timeout_s,
    )
    if one.returncode:
        print(one.stdout[-2000:], one.stderr[-2000:])
        raise SystemExit("single-process reference worker failed")
    wall1 = time.time() - t0

    with open(out2) as f:
        r2 = json.load(f)
    with open(out1) as f:
        r1 = json.load(f)
    delta = abs(r2["loss"] - r1["loss"])
    report = {
        "meta": {
            "what": "two-process multi-host smoke (tools/multihost_smoke.py)"
                    ": jax.distributed.initialize + local coordinator, 2 CPU"
                    " processes x 2 devices, make_pod_mesh DCNxICI hybrid, "
                    "host_local_batch per-process feed, one DP diffusion "
                    "step with the gradient psum crossing the process "
                    "boundary (Gloo)",
            "date": time.strftime("%Y-%m-%d"),
        },
        "two_process": {**r2, "wall_s": round(wall2, 1)},
        "single_process": {**r1, "wall_s": round(wall1, 1)},
        "loss_delta": delta,
        "ok": bool(delta < 1e-6),
    }
    if artifact:
        with open(artifact, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {artifact}")
    print(json.dumps({k: report[k] for k in ("loss_delta", "ok")}))
    for p in (out1, out2):
        try:
            os.remove(p)
        except OSError:
            pass
    if not report["ok"]:
        raise SystemExit("loss mismatch across process topologies")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc-id", type=int, default=None)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out", default="/tmp/mh_smoke.json")
    ap.add_argument("--artifact", default="MULTIHOST_r05.json")
    args = ap.parse_args()
    if args.proc_id is not None:
        worker(args.proc_id, args.procs, args.port, args.out)
    else:
        launch(args.artifact)


if __name__ == "__main__":
    main()
