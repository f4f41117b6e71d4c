"""Continuous batching for single-image inference requests.

No reference analogue (the reference only has batch eval scripts —
RESULT_TEST.py); this is BASELINE.md's serving requirement. TPU-specific
design points:

- **Bucketed batch shapes.** XLA compiles one executable per input shape, so
  the scheduler pads each flush to the smallest power-of-two bucket ≤
  ``max_batch``. After warmup every flush hits a cached executable — no
  recompiles mid-serving.
- **Flush policy.** A flush happens when ``max_batch`` requests are waiting
  (full MXU tile) or the oldest request has waited ``max_delay_ms``
  (latency bound). One dispatcher thread owns the device; requests resolve
  through per-request futures.
- **Sharded serving.** The forward closure may capture GSPMD-sharded
  weights (artifact.vit.load_vit_int4_artifact with a mesh); the batch
  enters replicated (or data-sharded by the caller's in_sharding) and XLA
  inserts the collectives.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence

import numpy as np


def _buckets_upto(max_batch: int) -> List[int]:
    out = [1]
    while out[-1] < max_batch:
        out.append(min(out[-1] * 2, max_batch))
    return out


class ContinuousBatcher:
    """Batches concurrent single-image requests into bucketed device calls.

    forward_fn: [B, ...] batch -> [B, ...] outputs (jitted outside).
    """

    def __init__(self, forward_fn: Callable, max_batch: int = 8,
                 max_delay_ms: float = 2.0,
                 buckets: Optional[Sequence[int]] = None):
        self.forward_fn = forward_fn
        self.max_batch = int(max_batch)
        self.max_delay_s = max_delay_ms / 1e3
        self.buckets = sorted(buckets) if buckets else _buckets_upto(max_batch)
        if self.buckets[-1] < self.max_batch:
            self.buckets.append(self.max_batch)
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {"requests": 0, "batches": 0, "padded": 0,
                      "batch_hist": {}}

    # ------------------------------------------------------------------

    def start(self):
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        # reject anything that raced past the dispatcher's exit — a Future
        # left on a dead queue would block its caller forever
        while True:
            try:
                _, fut, _ = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("batcher stopped"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one sample (no batch dim). Resolves to its output row.
        Submitting to a stopped batcher resolves the Future with an error
        instead of leaving it pending forever."""
        fut: Future = Future()
        if self._stop.is_set() and self._thread is None:
            fut.set_exception(RuntimeError("batcher stopped"))
            return fut
        self._q.put((image, fut, time.monotonic()))
        self.stats["requests"] += 1
        return fut

    def warmup(self, example: np.ndarray):
        """Pre-compile every bucket shape so serving never hits a compile."""
        for b in self.buckets:
            batch = np.broadcast_to(example[None], (b, *example.shape))
            np.asarray(self.forward_fn(np.ascontiguousarray(batch)))

    # ------------------------------------------------------------------

    def _collect(self) -> List:
        """Block for the first request, then drain until a flush condition.

        Already-queued requests are drained unconditionally (a backlog older
        than max_delay must still form FULL batches — otherwise a burst
        degenerates into size-1 batches the moment the queue ages past the
        deadline); max_delay only bounds the wait for requests that haven't
        arrived yet.
        """
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        pending = [first]
        deadline = first[2] + self.max_delay_s
        while len(pending) < self.max_batch:
            try:
                pending.append(self._q.get_nowait())
                continue
            except queue.Empty:
                pass
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                pending.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return pending

    def _run(self):
        while not self._stop.is_set() or not self._q.empty():
            pending = self._collect()
            if not pending:
                continue
            n = len(pending)
            bucket = next(b for b in self.buckets if b >= n)
            images = np.stack([p[0] for p in pending])
            if bucket != n:
                pad = np.repeat(images[:1], bucket - n, axis=0)
                images = np.concatenate([images, pad], axis=0)
                self.stats["padded"] += bucket - n
            try:
                out = np.asarray(self.forward_fn(images))
                for i, (_, fut, _) in enumerate(pending):
                    fut.set_result(out[i])
            except Exception as e:  # resolve futures so callers don't hang
                for _, fut, _ in pending:
                    if not fut.done():
                        fut.set_exception(e)
            self.stats["batches"] += 1
            self.stats["batch_hist"][bucket] = (
                self.stats["batch_hist"].get(bucket, 0) + 1)
