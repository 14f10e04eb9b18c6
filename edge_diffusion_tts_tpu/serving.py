"""Micro-batched serving for EdgeInference: exact variable-length batching.

TPU serving constraint: everything under ``jit`` is compiled per static
shape, so a naive server would recompile for every new (batch, token-length)
pair.  This front-end makes the device see only a handful of program
signatures while callers get per-request semantics:

- requests are gathered into micro-batches (bounded by ``max_batch`` and
  ``max_wait_ms``),
- token sequences are padded to the next **bucket** length and the batch is
  padded to exactly ``max_batch`` rows -> ONE compiled program per bucket,
- a boolean ``sem_mask`` rides along; the decoder excludes padded keys from
  attention (models/decoder.py ``sem_mask``/``mel_mask``), so padding and
  batch neighbors contribute NOTHING to a row's denoising dynamics — given
  the same initial noise, a row's valid frames equal its unpadded
  single-request generation (tests/test_serving.py asserts this at
  temperature=0, where x_T is deterministic).  At temperature>0 the noise
  draw itself depends on the program shape (batch row, bucket), so a
  batched sample is a different — identically distributed — instance than
  a single-request sample, exactly as two different seeds are.

The reference has no serving story (its inference.py:56 is a single-request
CLI/notebook path); this subsystem exists because padding + masking is the
idiomatic way to batch ragged requests under XLA's static-shape model.

``MicroBatcher`` is transport-agnostic (submit() returns a waitable ticket);
``serve_tcp`` wraps it in a newline-delimited-JSON TCP loop; the CLI exposes
``edge-diffusion-tts-tpu serve``.
"""

from __future__ import annotations

import collections
import json
import queue
import socket
import socketserver
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; raises for oversize requests."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"request of {n} tokens exceeds the largest bucket {max(buckets)}"
    )


class Overloaded(RuntimeError):
    """Raised by MicroBatcher.submit when the predicted queueing delay
    exceeds ``max_queue_delay_ms`` (load shedding: fail fast instead of
    joining an unbounded tail — SERVE_LOAD_r03 measured p99 2.5x p95 at
    saturation with no bound)."""


@dataclass
class _Ticket:
    """One queued request; ``wait()`` blocks until the batch it joined ran."""

    tokens: np.ndarray
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[Exception] = None
    cancelled: bool = False
    enqueued_at: float = 0.0  # time.monotonic at submit
    queue_delay_ms: float = 0.0  # set when its batch dispatches

    def wait(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self.done.wait(timeout):
            # Nobody will read the result: mark the ticket so the worker
            # drops it instead of spending a batch row + device time on it
            # (best-effort — a ticket already inside a running batch still
            # completes).
            self.cancelled = True
            raise TimeoutError("generation did not complete in time")
        if self.error is not None:
            raise self.error
        return self.result


class MicroBatcher:
    """Gathers requests into shape-bucketed, fixed-size padded batches.

    ``generate_fn(sem_idx, sem_mask) -> mel`` is called with
    ``sem_idx: int32 [max_batch, bucket]`` and ``sem_mask: bool`` of the same
    shape; it returns ``[max_batch, 2 * bucket, n_mels]`` (EdgeInference
    .generate_mel with ``sem_mask=...`` has exactly this contract).  Rows
    beyond the live requests are padding; row i of the result is cropped to
    ``2 * len(tokens_i)`` frames before being handed back.
    """

    def __init__(
        self,
        generate_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
        buckets: Sequence[int] = (128, 256, 512, 1024),
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        pad_token: int = 0,
        max_queue_delay_ms: Optional[float] = None,
    ):
        self.generate_fn = generate_fn
        self.buckets = tuple(sorted(buckets))
        self.max_batch = int(max_batch)
        self.max_wait_ms = float(max_wait_ms)
        self.pad_token = int(pad_token)
        # SLO knob: bound the queueing-delay tail.  When set, (a) submit()
        # sheds load (raises Overloaded) once the PREDICTED delay —
        # queue depth ahead of the request, in batches, times the running
        # mean batch time — exceeds the bound, and (b) dispatch order is
        # oldest-ticket-first across bucket groups so a big-bucket straggler
        # is not starved behind a stream of small-bucket batches.  Batching
        # cannot create device capacity; bounding p99 at saturation means
        # refusing work that would miss the SLO anyway (the client sees a
        # clean Overloaded instead of a late result).
        self.max_queue_delay_ms = (
            float(max_queue_delay_ms) if max_queue_delay_ms else None
        )
        self._queue: "queue.Queue[_Ticket]" = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()  # orders submit() against close()
        self.batches_run = 0  # observability; tests assert batching happened
        self.requests_served = 0  # == live rows summed over batches
        self.device_ms_total = 0.0  # wall time inside generate_fn
        self.shed_count = 0  # submits refused by the SLO bound
        # per-bucket {bucket: [batches, rows]} — starvation/fairness
        # visibility under mixed-length traffic (tools/mixed_loadtest.py)
        self.bucket_counts: Dict[int, list] = {}
        self._delays = collections.deque(maxlen=1024)  # recent queue delays
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def reset_stats(self):
        """Zero the serving counters (e.g. after warmup compiles)."""
        self.batches_run = 0
        self.requests_served = 0
        self.device_ms_total = 0.0
        self.shed_count = 0
        self.bucket_counts = {}
        self._delays.clear()

    def predicted_delay_ms(self) -> float:
        """Expected queueing delay for a request submitted NOW: batches
        ahead of it (current depth, in program-sized groups, plus the one
        in flight) times the running mean batch time."""
        if self.batches_run == 0:
            return 0.0  # no signal until the first batch ran (post-warmup)
        mean_batch = self.device_ms_total / self.batches_run
        batches_ahead = self._queue.qsize() / self.max_batch + 1
        return batches_ahead * mean_batch

    def stats(self) -> dict:
        """Serving counters: batch occupancy is the throughput lever."""
        b = max(self.batches_run, 1)
        out = {
            "requests_served": self.requests_served,
            "batches_run": self.batches_run,
            "mean_batch_occupancy": round(
                self.requests_served / (b * self.max_batch), 3
            ),
            "mean_batch_ms": round(self.device_ms_total / b, 3),
            "queue_depth": self._queue.qsize(),
            "shed_count": self.shed_count,
            "per_bucket": {
                str(k): {
                    "batches": v[0],
                    "rows": v[1],
                    "occupancy": round(v[1] / (v[0] * self.max_batch), 3),
                }
                for k, v in sorted(self.bucket_counts.items())
            },
        }
        if self._delays:
            d = np.sort(np.asarray(self._delays))
            out["queue_delay_ms"] = {
                "p50": round(float(np.percentile(d, 50)), 1),
                "p95": round(float(np.percentile(d, 95)), 1),
                "p99": round(float(np.percentile(d, 99)), 1),
                "max": round(float(d[-1]), 1),
            }
        return out

    # -- client side ------------------------------------------------------

    def submit(self, tokens: np.ndarray) -> _Ticket:
        """Enqueue one request (1-D int token array); returns its ticket.

        With ``max_queue_delay_ms`` set, raises :class:`Overloaded` when the
        predicted queueing delay already exceeds the bound — fail fast at
        admission instead of serving a result the client stopped waiting
        for."""
        tokens = np.asarray(tokens, np.int32)
        if tokens.ndim != 1 or tokens.size == 0:
            raise ValueError("tokens must be a non-empty 1-D int array")
        pick_bucket(tokens.size, self.buckets)  # validate size up front
        if (
            self.max_queue_delay_ms is not None
            and self.predicted_delay_ms() > self.max_queue_delay_ms
        ):
            self.shed_count += 1
            raise Overloaded(
                f"predicted queue delay {self.predicted_delay_ms():.0f} ms "
                f"exceeds max_queue_delay_ms={self.max_queue_delay_ms:.0f}"
            )
        t = _Ticket(tokens, enqueued_at=time.monotonic())
        # Check-and-put under the lock: a submit racing close() must either
        # raise here or have its ticket visible to close()'s drain — never
        # land in a dead queue after the drain already ran.
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.put(t)
        return t

    def generate(self, tokens: np.ndarray, timeout: float = 300.0) -> np.ndarray:
        """Blocking convenience wrapper: submit + wait."""
        return self.submit(tokens).wait(timeout)

    def close(self):
        with self._lock:
            self._closed = True
            self._queue.put(None)  # wake the worker
        self._worker.join(timeout=10.0)
        # Fail anything still queued so no client blocks until its timeout.
        while True:
            try:
                t = self._queue.get_nowait()
            except queue.Empty:
                break
            if t is not None:
                t.error = RuntimeError("MicroBatcher closed")
                t.done.set()

    # -- worker side ------------------------------------------------------

    def _gather(self) -> list:
        """Block for the first request, then drain more until the batching
        window closes or enough tickets arrived to fill every bucket's
        program.  The limit is max_batch PER BUCKET, not overall: mixed-
        bucket traffic split by _loop would otherwise run systematically
        half-empty programs while same-bucket requests sat in the queue."""
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_ms / 1e3
        limit = self.max_batch * len(self.buckets)
        while len(batch) < limit:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                t = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if t is None:
                self._queue.put(None)  # re-signal shutdown after this batch
                break
            batch.append(t)
        return batch

    def _run_bucket(self, tickets: list, bucket: int):
        B = self.max_batch
        sem_idx = np.full((B, bucket), self.pad_token, np.int32)
        sem_mask = np.zeros((B, bucket), bool)
        now = time.monotonic()
        for i, t in enumerate(tickets):
            sem_idx[i, : t.tokens.size] = t.tokens
            sem_mask[i, : t.tokens.size] = True
            t.queue_delay_ms = (now - t.enqueued_at) * 1e3
            self._delays.append(t.queue_delay_ms)
        try:
            t0 = time.monotonic()
            mel = np.asarray(self.generate_fn(sem_idx, sem_mask))
            self.device_ms_total += (time.monotonic() - t0) * 1e3
            self.batches_run += 1
            self.requests_served += len(tickets)
            bc = self.bucket_counts.setdefault(bucket, [0, 0])
            bc[0] += 1
            bc[1] += len(tickets)
            for i, t in enumerate(tickets):
                # copy(): a view would pin the whole padded batch array in
                # memory until every client released its crop
                t.result = mel[i, : 2 * t.tokens.size].copy()
                t.done.set()
        except Exception as e:  # surface the failure on every ticket
            for t in tickets:
                t.error = e
                t.done.set()

    def _loop(self):
        while not self._closed:
            batch = self._gather()
            if not batch:
                continue
            try:
                by_bucket: dict = {}
                for t in batch:
                    if t.cancelled:
                        # The client's wait() already timed out: don't spend
                        # a batch row + device time on a result nobody reads.
                        continue
                    by_bucket.setdefault(
                        pick_bucket(t.tokens.size, self.buckets), []
                    ).append(t)
                # Oldest-first across bucket groups: a straggler in one
                # bucket must not wait behind every other bucket's program
                # just because its bucket sorts last (tail bound).
                order = sorted(
                    by_bucket,
                    key=lambda b: min(t.enqueued_at for t in by_bucket[b]),
                )
                for bucket in order:
                    group = by_bucket[bucket]
                    # max_batch rows per program: split oversized groups
                    for i in range(0, len(group), self.max_batch):
                        self._run_bucket(group[i : i + self.max_batch], bucket)
            except Exception as e:  # defensive: a worker crash must not
                for t in batch:     # leave clients blocked until timeout
                    if not t.done.is_set():
                        t.error = e
                        t.done.set()


# -- streaming long-form ----------------------------------------------------


@dataclass
class _LFStream:
    """One live long-form stream inside the scheduler."""

    chunk: object  # pipeline.ChunkStream
    group: tuple  # (steps, strength, cfg_scale) -> refine program signature
    out: queue.Queue = field(default_factory=lambda: queue.Queue(maxsize=256))
    cancelled: bool = False
    error: Optional[Exception] = None

    def emit(self, item) -> None:
        """Hand an increment to the consumer WITHOUT blocking the scheduler:
        a consumer that stopped draining (but kept the stream open) fills
        its queue and gets cancelled instead of stalling every other
        stream's tick."""
        try:
            self.out.put_nowait(item)
        except queue.Full:
            self.cancelled = True
            self.error = RuntimeError(
                "long-form consumer stopped draining increments"
            )

    def finish(self, err: Optional[Exception]) -> None:
        if err is not None:
            self.error = err
        try:
            self.out.put_nowait(None)
        except queue.Full:  # consumer gone; drain() checks error anyway
            self.cancelled = True


class LongFormScheduler:
    """Continuous batching for concurrent long-form streams.

    A long-form request arrives as a whole utterance but is generated chunk
    by chunk (``pipeline.ChunkStream``).  Rather than serializing whole
    streams on the device, the scheduler interleaves them at CHUNK
    granularity: each tick gathers the next chunk job from up to
    ``max_streams`` live streams sharing a refine signature
    (steps, strength, cfg_scale), pads the batch to a power-of-two row
    count (one compiled program per signature x row count), and runs ONE
    batched refine.  Streams join and leave between ticks — a new request
    starts denoising at the next tick instead of waiting behind running
    streams (continuous batching), and N concurrent streams cost ~one
    stream's wall-clock per chunk instead of N.

    Rows of the batched refine are computed independently — per-row PRNG
    keys and per-row inpaint flags (``pipeline._build_refine``) — so a
    stream's mel is a function of its own seed alone, regardless of batch
    composition: batched output == solo output
    (tests/test_serving.py::test_longform_scheduler_matches_solo).
    """

    def __init__(self, pipe, max_streams: int = 4):
        self.pipe = pipe
        self.max_streams = int(max_streams)
        # Under a mesh the refine shards rows over the data axis; every
        # batch row count must be a multiple of that axis size.
        self.row_quantum = int(getattr(pipe, "row_quantum", 1))
        if self.max_streams % self.row_quantum:
            raise ValueError(
                f"max_streams={max_streams} must be a multiple of the "
                f"pipeline's row_quantum={self.row_quantum} (the mesh "
                f"data-axis size)"
            )
        self._inbox: "queue.Queue[Optional[_LFStream]]" = queue.Queue()
        self._active: list = []
        self._closed = False
        self.batches_run = 0
        self.chunks_run = 0  # live rows summed over batches
        self.rows_padded = 0  # total rows incl. padding (occupancy denom)
        self.device_ms_total = 0.0
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def stats(self) -> dict:
        b = max(self.batches_run, 1)
        return {
            "streams_active": len(self._active),
            "batches_run": self.batches_run,
            "chunks_run": self.chunks_run,
            "mean_row_occupancy": round(
                self.chunks_run / max(self.rows_padded, 1), 3
            ),
            "mean_batch_ms": round(self.device_ms_total / b, 3),
        }

    def warmup(
        self,
        steps: int = 50,
        strength: float = 0.6,
        cfg_scale: float = 2.0,
    ) -> None:
        """Compile the batched refine for EVERY row count the scheduler can
        emit for this signature (row_quantum x powers of two up to
        max_streams, plus the max_streams cap itself).

        Tick row counts depend on traffic timing, so without this a row
        count first formed mid-traffic pays its multi-second XLA compile
        inside a tick — stalling every live stream (measured: a lazily
        compiled 4-row program turned an 85 ms tick into 4.5 s).  Chunk
        geometry is fixed per server, so these shapes are static; only a
        request with a non-default (steps, strength, cfg_scale) signature
        still compiles lazily.
        """
        pipe = self.pipe
        T = pipe.chunk_frames
        M = pipe.cfg.n_mels
        S = pipe.chunk_samples // pipe.sem_stride
        D = pipe.cfg.semantic_dim
        key = np.zeros((2,), np.uint32)  # any valid PRNG key data
        B = self.row_quantum
        while True:
            pipe.refine_chunk_batch_keys(
                np.tile(key[None], (B, 1)),
                np.zeros((B, S, D), np.float32),
                np.zeros((B, T, M), np.float32),
                np.zeros((B,), bool),
                np.tile(key[None], (B, 1)),
                strength=float(strength), steps=int(steps),
                cfg_scale=float(cfg_scale),
            )
            if B >= self.max_streams:
                return
            B = min(B * 2, self.max_streams)

    # -- client side --------------------------------------------------------

    def submit(
        self,
        wav: np.ndarray,
        *,
        steps: int = 50,
        strength: float = 0.6,
        cfg_scale: float = 2.0,
        seed: int = 0,
    ):
        """Enqueue one stream; returns an iterator of (mel_seg, frame_offset).

        The semantic encode runs here, in the caller's thread, so it
        overlaps the worker's refine ticks.  Abandoning the iterator
        (close/GC/transport error) cancels the stream: its remaining chunks
        are never scheduled.
        """
        import jax

        from .pipeline import ChunkStream

        if self._closed:
            raise RuntimeError("LongFormScheduler is closed")
        chunk = ChunkStream(
            self.pipe, wav, strength=float(strength), steps=int(steps),
            cfg_scale=float(cfg_scale), rng=jax.random.PRNGKey(int(seed)),
        )
        s = _LFStream(
            chunk, group=(int(steps), float(strength), float(cfg_scale))
        )
        self._inbox.put(s)

        def drain():
            try:
                while True:
                    try:
                        item = s.out.get(timeout=1.0)
                    except queue.Empty:
                        # A stream cancelled while its queue was full never
                        # gets a sentinel enqueued — surface the error here
                        # instead of blocking forever.
                        if s.cancelled:
                            raise s.error or RuntimeError("stream cancelled")
                        continue
                    if item is None:
                        if s.error is not None:
                            raise s.error
                        return
                    yield item
            finally:
                s.cancelled = True  # stop scheduling if abandoned mid-stream

        return drain()

    def close(self):
        self._closed = True
        self._inbox.put(None)  # wake the worker
        self._worker.join(timeout=10.0)
        err = RuntimeError("LongFormScheduler closed")
        for s in self._active:
            s.finish(err)
        self._active = []
        while True:
            try:
                s = self._inbox.get_nowait()
            except queue.Empty:
                break
            if s is not None:
                s.finish(err)

    # -- worker side --------------------------------------------------------

    def _absorb(self, block: bool):
        if block:
            try:
                # Short idle poll: this timeout is pure additive latency on a
                # fresh stream's first chunk (time-to-first-increment).
                s = self._inbox.get(timeout=0.01)
            except queue.Empty:
                return
            if s is not None:
                self._active.append(s)
        while True:
            try:
                s = self._inbox.get_nowait()
            except queue.Empty:
                return
            if s is not None:
                self._active.append(s)

    def _tick(self):
        self._absorb(block=not self._active)
        self._active = [s for s in self._active if not s.cancelled]
        if not self._active:
            return
        group = self._active[0].group
        batch = [s for s in self._active if s.group == group]
        # First-chunk rows first (stable sort): when the group has more
        # streams than max_streams, a fresh stream's chunk 0 must not wait
        # behind established streams' later chunks — first-increment latency
        # is the long-form product metric.
        batch.sort(key=lambda s: s.chunk.i > 0)
        batch = batch[: self.max_streams]
        try:
            self._run_batch(batch, group)
        except Exception as e:  # fail the batch's streams, keep serving
            for s in batch:
                s.finish(e)
                s.cancelled = True
        finished = {
            id(s) for s in batch if s.chunk.done or s.cancelled
        }
        for s in batch:
            if s.chunk.done and not s.cancelled:
                s.finish(None)
        served = {id(s) for s in batch}
        remaining = [s for s in self._active if id(s) not in finished]
        # Rotate served streams to the back so other signature groups
        # (and late joiners) get the next tick — round-robin fairness.
        self._active = [s for s in remaining if id(s) not in served] + [
            s for s in remaining if id(s) in served
        ]

    def _run_batch(self, batch: list, group: tuple):
        steps, strength, cfg_scale = group
        jobs = [s.chunk.next_job() for s in batch]
        n = len(jobs)
        B = self.row_quantum
        while B < n:
            B *= 2
        B = min(B, self.max_streams)
        pad = B - n
        # Jobs are host numpy (ChunkStream prefetches all device-derived
        # state at submit), so assembling the batch is pure numpy and the
        # whole tick is ONE device program + one D2H.
        k_noise = np.stack(
            [j[0] for j in jobs] + [jobs[0][0]] * pad
        )
        z = np.concatenate(
            [j[1] for j in jobs] + [np.zeros_like(jobs[0][1])] * pad, axis=0
        )
        kn = np.concatenate(
            [j[2] for j in jobs] + [np.zeros_like(jobs[0][2])] * pad, axis=0
        )
        hv = np.asarray([j[3] for j in jobs] + [False] * pad)
        # Padding rows reuse row 0's keys: their output is discarded, they
        # only exist to hold the program shape.
        rngs = np.stack([j[4] for j in jobs] + [jobs[0][4]] * pad)
        t0 = time.monotonic()
        x_ref = np.asarray(
            self.pipe.refine_chunk_batch_keys(
                k_noise, z, kn, hv, rngs,
                strength=strength, steps=steps, cfg_scale=cfg_scale,
            )
        )
        self.device_ms_total += (time.monotonic() - t0) * 1e3
        self.batches_run += 1
        self.chunks_run += n
        self.rows_padded += B
        for i, s in enumerate(batch):
            for seg, off in s.chunk.complete(x_ref[i : i + 1]):
                s.emit((seg, off))

    def _loop(self):
        while not self._closed:
            try:
                self._tick()
            except Exception:
                # _tick already routed batch errors to their streams; an
                # error HERE is a scheduler bug — don't let it kill the
                # worker and strand every future stream.
                time.sleep(0.01)


def make_longform_fn(pipe, max_streams: int = 4) -> Callable:
    """Adapt a ``LongFormPipeline`` to the server's long-form contract,
    continuously batching concurrent streams via ``LongFormScheduler``.

    Returns ``fn(wav: np.ndarray [T], opts: dict) -> iterator of
    (increment, offset)``: mel increments (``[n_mels, F]`` linear mel,
    frame offsets) by default, waveform increments (1-D f32, sample
    offsets) when ``opts["audio"]`` is set.  ``opts["seed"]`` pins the
    stream's PRNG; scheduler rows are batch-composition-independent, so the
    result is reproducible AND identical to an unbatched run with the same
    seed.  The scheduler is exposed as ``fn.scheduler`` (stats / close).
    """
    import jax

    sched = LongFormScheduler(pipe, max_streams=max_streams)

    def fn(wav: np.ndarray, opts: dict):
        seed = int(opts.get("seed", 0))
        mel_iter = sched.submit(
            wav,
            steps=int(opts.get("steps", 50)),
            strength=float(opts.get("strength", 0.6)),
            cfg_scale=float(opts.get("cfg_scale", 2.0)),
            seed=seed,
        )
        if opts.get("audio"):
            # The vocoder half runs in the CALLER's thread (per stream),
            # overlapping other streams' refine ticks; mel content and GL
            # keys match generate_streaming_audio's RNG contract exactly.
            return pipe.stream_audio(
                mel_iter,
                total=int(np.asarray(wav).size),
                rng=jax.random.PRNGKey(seed),
                griffin_lim_iters=int(opts.get("griffin_lim_iters", 50)),
            )
        return mel_iter

    fn.scheduler = sched
    return fn


# -- TCP transport ---------------------------------------------------------


class _Handler(socketserver.StreamRequestHandler):
    def _send(self, resp: dict):
        self.wfile.write((json.dumps(resp) + "\n").encode())
        self.wfile.flush()

    def _handle_longform(self, req: dict):
        import base64

        fn = self.server.longform_fn
        if fn is None:
            raise RuntimeError(
                "server was not started with long-form support "
                "(serve --longform)"
            )
        if "wav_b64" in req:
            wav = np.frombuffer(base64.b64decode(req["wav_b64"]), "<f4")
        else:
            wav = np.asarray(req["wav"], np.float32)
        if wav.size == 0:
            raise ValueError("longform request carries no audio")
        n = 0
        # Concurrent long-form streams batch at chunk granularity through
        # the LongFormScheduler (one batched refine program serves them
        # all), so no device lock is needed — each handler thread just
        # drains its own stream's increments as they finalize.
        for seg, offset in fn(wav, req):
            seg = np.ascontiguousarray(np.asarray(seg, "<f4"))
            self._send({
                "seg_b64": base64.b64encode(seg.tobytes()).decode("ascii"),
                "shape": list(seg.shape),
                "offset": int(offset),
            })
            n += 1
        self._send({"done": True, "segments": n})

    def handle(self):
        for line in self.rfile:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
                if req.get("stats"):
                    resp = {"stats": self.server.batcher.stats()}
                    sched = getattr(self.server.longform_fn, "scheduler", None)
                    if sched is not None:
                        resp["longform"] = sched.stats()
                    self.wfile.write((json.dumps(resp) + "\n").encode())
                    self.wfile.flush()
                    continue
                if "longform" in req:
                    # Streamed response: one line per finalized increment,
                    # then a {"done": true} terminator (protocol in the
                    # TTSServer docstring).  Mid-stream failures fall
                    # through to the shared error line below, which the
                    # client treats as the stream terminator.
                    self._handle_longform(req["longform"])
                    continue
                mel = self.server.batcher.generate(
                    np.asarray(req["tokens"], np.int32),
                    timeout=float(req.get("timeout", 300.0)),
                )
                mel = np.asarray(mel, np.float32)
                if req.get("binary"):
                    # ~7x smaller and no float->decimal->float loss: raw
                    # little-endian f32 frames, base64 on the JSON line.
                    import base64

                    resp = {
                        "mel_b64": base64.b64encode(
                            np.ascontiguousarray(mel, "<f4").tobytes()
                        ).decode("ascii"),
                        "shape": list(mel.shape),
                    }
                else:
                    resp = {"mel": mel.tolist()}
            except Exception as e:
                resp = {"error": f"{type(e).__name__}: {e}"}
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()


class TTSServer(socketserver.ThreadingTCPServer):
    """Newline-delimited-JSON TCP front-end over a MicroBatcher.

    Protocol: one request per line
    ``{"tokens": [...], "timeout": s?, "binary": bool?}`` -> one response
    line ``{"mel": [[...], ...]}`` (frames x n_mels), or with
    ``binary`` ``{"mel_b64": <base64 of raw little-endian f32>,
    "shape": [frames, n_mels]}`` (~7x smaller, bit-exact), or
    ``{"error": "..."}``.  ``{"stats": true}`` returns the serving
    counters.  Concurrent connections share the batcher, so simultaneous
    requests ride the same device program.

    Long-form streaming (when started with a ``longform_fn``):
    ``{"longform": {"wav_b64": <b64 raw f32 @16k>, "audio": bool?,
    "steps": n?, "strength": s?, "cfg_scale": c?, "seed": k?}}`` streams
    one line per finalized increment —
    ``{"seg_b64": ..., "shape": [...], "offset": n}`` (linear mel
    ``[n_mels, F]`` at frame offsets, or 1-D waveform at sample offsets
    with ``audio``) — terminated by ``{"done": true, "segments": k}``.
    A mid-stream failure terminates with ``{"error": ...}`` instead.
    Concurrent long-form requests are continuously batched at chunk
    granularity (``LongFormScheduler``); results are seed-reproducible
    regardless of what shared their batch.
    """

    allow_reuse_address = True
    daemon_threads = True
    # Accept-backlog sized for bursty connection-per-request clients.  The
    # socketserver default (5) overflows the SYN queue under concurrent
    # load and the kernel retransmits after 1 s — measured as a pure
    # transport p99 tail at c=32 (p99 1,315 ms vs p95 352 ms while the
    # batcher's own queue delay maxed at 273 ms, SERVE_LOAD_r04.json).
    request_queue_size = 128

    def __init__(self, addr, batcher: MicroBatcher, longform_fn=None):
        super().__init__(addr, _Handler)
        self.batcher = batcher
        self.longform_fn = longform_fn

    def shutdown(self):
        super().shutdown()
        sched = getattr(self.longform_fn, "scheduler", None)
        if sched is not None:
            sched.close()


def serve_tcp(
    batcher: MicroBatcher,
    host: str = "127.0.0.1",
    port: int = 7455,
    longform_fn=None,
) -> TTSServer:
    """Start serving in a background thread; returns the server (``.shutdown()``
    to stop).  Port 0 picks a free port (``server.server_address``)."""
    server = TTSServer((host, port), batcher, longform_fn=longform_fn)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def run_server(
    checkpoint: str,
    host: str = "127.0.0.1",
    port: int = 7455,
    steps: Optional[int] = None,
    buckets: Sequence[int] = (128, 256, 512, 1024),
    max_batch: int = 8,
    max_wait_ms: float = 5.0,
    max_queue_delay_ms: Optional[float] = None,
    sampler: str = "ddim",
    mesh: int = 0,
    warmup: bool = True,
    verbose: bool = True,
    seed: int = 0,
    longform: bool = False,
    longform_streams: int = 4,
    chunk_seconds: float = 2.0,
    overlap_seconds: float = 0.5,
    longform_prep_buckets: Sequence[float] = (8.0, 16.0, 32.0, 64.0),
):
    """Checkpoint -> warmed MicroBatcher + live TCP server (CLI ``serve``).

    Returns ``(server, batcher)`` so callers own shutdown (``server
    .shutdown(); batcher.close()``); the CLI blocks on top of this.
    Buckets beyond the checkpoint's positional-table capacity (context rows
    cap S, mel rows cap 2S) are dropped up front instead of failing on live
    traffic.  ``mesh=N`` shards each micro-batch over N chips on the data
    axis (``max_batch`` must divide evenly).

    The decoder's output head is interpreted per the CHECKPOINT's training
    objective (``cfg.use_v_prediction``), not per the sampler flag — serving
    a v-trained model as epsilon silently denoises garbage.  Sampling noise
    is a fresh fold of ``PRNGKey(seed)`` per device batch (the batcher's
    worker calls generate_fn serially), so repeated requests draw new
    samples; per-request reproducibility at temperature 1.0 is NOT provided,
    because a row's noise also depends on the batch it rode in (see the
    module docstring).
    """
    import itertools

    import jax
    import jax.numpy as jnp

    from .inference import EdgeInference
    from .models import EdgeDiffusionDecoder
    from .schedule import DiffusionSchedule
    from .training.checkpoint import restore_final_model

    def say(msg):
        if verbose:
            print(msg, flush=True)

    params, cfg = restore_final_model(checkpoint)
    decoder = EdgeDiffusionDecoder(cfg)
    schedule = DiffusionSchedule.create(cfg.diff_steps)
    inf = EdgeInference(
        cfg,
        schedule,
        decoder.apply,
        {"params": params["decoder"]},
        sampler=sampler,
        prediction="v" if cfg.use_v_prediction else "eps",
    )
    steps = steps if steps is not None else cfg.inference_steps
    if steps <= 0:
        raise ValueError(f"steps must be positive, got {steps}")
    base_key = jax.random.PRNGKey(seed)
    batch_counter = itertools.count()

    cap = min(cfg.max_ctx_positions, cfg.max_mel_positions // 2)
    dropped = tuple(b for b in buckets if b > cap)
    buckets = tuple(b for b in buckets if b <= cap)
    if dropped:
        say(
            f"serve: dropping buckets {dropped} beyond this checkpoint's "
            f"positional capacity ({cap} tokens)"
        )
    if not buckets:
        raise ValueError(
            f"no serve bucket fits the checkpoint's positional capacity "
            f"({cap} tokens) — pass smaller buckets"
        )

    if mesh:
        if max_batch % mesh:
            raise ValueError("max_batch must be divisible by mesh")
        from .parallel import make_dp_generate
        from .parallel.mesh import make_mesh

        dev_mesh = make_mesh((mesh, 1))
        prog = make_dp_generate(
            inf._build_generate_mel(steps, masked=True), dev_mesh, masked=True
        )

        def generate_fn(sem_idx, sem_mask):
            rng = jax.random.fold_in(base_key, next(batch_counter))
            with dev_mesh:
                return prog(
                    inf.decoder_params, jnp.asarray(sem_idx), rng,
                    jnp.float32(1.0), jnp.asarray(sem_mask),
                )
    else:
        def generate_fn(sem_idx, sem_mask):
            rng = jax.random.fold_in(base_key, next(batch_counter))
            return inf.generate_mel(
                jnp.asarray(sem_idx), num_steps=steps, rng=rng,
                sem_mask=jnp.asarray(sem_mask),
            )

    longform_fn = None
    if longform:
        # Voice-regeneration streaming: wav -> frozen HuBERT features ->
        # chunked inpaint/crossfade decode, increments streamed as they
        # finalize (pipeline.py).  Up to `longform_streams` concurrent
        # requests are continuously batched at chunk granularity
        # (LongFormScheduler) alongside the micro-batched token path.
        from .models import SemanticEncoder
        from .pipeline import LongFormPipeline
        from .training.checkpoint import (
            encoder_variables,
            restore_hubert_config,
        )

        lf_hubert_cfg = restore_hubert_config(checkpoint)
        encoder = SemanticEncoder(cfg, lf_hubert_cfg)
        lf_mesh = None
        if mesh:
            # Same data-axis mesh as the token path: scheduler ticks shard
            # their stream rows over the chips (longform_streams must be a
            # multiple of the mesh size; LongFormScheduler validates).
            from .parallel.mesh import make_mesh

            lf_mesh = make_mesh((mesh, 1))
        pipe = LongFormPipeline(
            cfg,
            schedule,
            lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
            params["decoder"],
            encoder_apply=lambda variables, w, **kw: encoder.apply(
                variables, w, train=False, **kw
            )[0],
            encoder_params=encoder_variables(params),
            chunk_seconds=chunk_seconds,
            overlap_seconds=overlap_seconds,
            mesh=lf_mesh,
            # Compile-bounded stream prep: one program per length bucket
            # instead of one per distinct wav length (unbounded under real
            # traffic; each lazy compile through the tunnel stalls ~seconds
            # to minutes).  Exact via the masked HuBERT forward.
            prep_buckets=[
                int(s * cfg.sample_rate) for s in longform_prep_buckets
            ] if longform_prep_buckets else None,
            # Chunk->latent slicing follows the checkpoint's actual conv
            # stack (320 for hubert-base; test checkpoints may differ).
            sem_stride=lf_hubert_cfg.total_stride,
        )
        longform_fn = make_longform_fn(pipe, max_streams=longform_streams)

    batcher = MicroBatcher(
        generate_fn, buckets=buckets, max_batch=max_batch,
        max_wait_ms=max_wait_ms, max_queue_delay_ms=max_queue_delay_ms,
    )
    batcher.inference = inf  # observability: sampler/prediction inspection
    if warmup:
        # A length-b request routes to (and therefore compiles) bucket b.
        for b in buckets:
            # First compiles through the remote-compile tunnel can run many
            # minutes (worse during tunnel degradation) — far past the 300 s
            # default ticket timeout; warmup must wait them out.
            batcher.generate([1] * b, timeout=3600.0)
            say(f"serve: bucket {b} compiled")
        batcher.reset_stats()
        if longform:
            # Compile the scheduler's refine for every reachable row count
            # at the protocol-default signature, so no tick pays a compile
            # mid-traffic (non-default signatures still compile lazily).
            longform_fn.scheduler.warmup()
            say("serve: long-form refine programs compiled "
                f"(rows up to {longform_streams})")
            for b in pipe.prep_buckets or ():
                # One stream-prep program per length bucket (the encoder
                # compile dominates; lazily it would stall a live submit).
                pipe.stream_prep(
                    np.zeros((1, b), np.float32), jax.random.PRNGKey(0)
                )
                say(f"serve: long-form prep bucket {b} compiled")
    server = serve_tcp(batcher, host=host, port=port, longform_fn=longform_fn)
    say(
        f"serving on {server.server_address[0]}:{server.server_address[1]} "
        f"(steps={steps}, buckets={buckets}, max_batch={max_batch})"
    )
    return server, batcher


def request_tts(
    tokens: Sequence[int], host: str = "127.0.0.1", port: int = 7455,
    timeout: float = 300.0, binary: bool = True,
) -> np.ndarray:
    """Minimal client for the line-JSON protocol; returns mel [frames, n_mels].

    ``binary`` (default) transports the mel as base64 raw f32 — ~7x smaller
    than decimal float lists and bit-exact; set False for the plain-JSON
    form (e.g. non-numpy consumers).
    """
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall(
            (json.dumps({"tokens": list(map(int, tokens)),
                         "timeout": timeout, "binary": binary}) + "\n").encode()
        )
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(1 << 20)
            if not chunk:
                break
            buf += chunk
    resp = json.loads(buf.decode())
    if "error" in resp:
        raise RuntimeError(resp["error"])
    if "mel_b64" in resp:
        import base64

        # copy(): frombuffer views are read-only; both transports must
        # return equally writable arrays.
        return np.frombuffer(
            base64.b64decode(resp["mel_b64"]), "<f4"
        ).reshape(resp["shape"]).copy()
    return np.asarray(resp["mel"], np.float32)


def request_longform(
    wav: np.ndarray,
    host: str = "127.0.0.1",
    port: int = 7455,
    timeout: float = 3600.0,
    audio: bool = False,
    **opts,
):
    """Stream a long-form generation; yields (increment, offset) live.

    ``wav`` is the source waveform at the model rate (f32, 16 kHz default).
    Yields linear-mel increments ``[n_mels, F]`` at frame offsets, or — with
    ``audio=True`` — playable 1-D waveform increments at sample offsets, as
    each becomes final on the server (TTSServer long-form protocol).  Extra
    ``opts`` pass through: steps, strength, cfg_scale, seed,
    griffin_lim_iters.
    """
    import base64

    wav = np.ascontiguousarray(np.asarray(wav, "<f4").reshape(-1))
    req = {"longform": dict(
        opts, wav_b64=base64.b64encode(wav.tobytes()).decode("ascii"),
        audio=bool(audio),
    )}
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall((json.dumps(req) + "\n").encode())
        buf = b""
        while True:
            nl = buf.find(b"\n")
            if nl < 0:
                chunk = s.recv(1 << 20)
                if not chunk:
                    raise ConnectionError(
                        "server closed the long-form stream mid-way"
                    )
                buf += chunk
                continue
            line, buf = buf[:nl], buf[nl + 1:]
            resp = json.loads(line.decode())
            if "error" in resp:
                raise RuntimeError(resp["error"])
            if resp.get("done"):
                return
            seg = np.frombuffer(
                base64.b64decode(resp["seg_b64"]), "<f4"
            ).reshape(resp["shape"]).copy()
            yield seg, int(resp["offset"])
