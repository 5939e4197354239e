"""Batching query service: concurrent queries -> device-sized batches.

The serving-path answer to the reference's concurrent-throughput target
(1k -> 2k QPS, performance_monitor.rs:68) and to dispatch overhead:
individual queries queue up and a collector thread flushes them to the
index as one [B, D] batch (flush on max_batch or max_wait). Per-query
dispatch overhead (tens of ms through a remote transport; ~10us locally)
amortizes across the whole batch — the same reason the index kernels
take query *batches* everywhere. Callers get concurrent futures.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class ServiceStats:
    queries: int = 0
    batches: int = 0
    max_batch_seen: int = 0

    @property
    def avg_batch(self) -> float:
        return self.queries / self.batches if self.batches else 0.0


class QueryService:
    """Wraps any index with search(queries [B, D], k) in a batch collector."""

    def __init__(
        self,
        index,
        k: int = 10,
        max_batch: int = 64,
        max_wait_ms: float = 2.0,
    ):
        self.index = index
        self.k = int(k)
        self.max_batch = int(max_batch)
        self.max_wait_s = max_wait_ms / 1000.0
        self.stats = ServiceStats()
        self._lock = threading.Lock()
        self._pending: List[Tuple[np.ndarray, Future]] = []
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, query: np.ndarray) -> Future:
        """Enqueue one query vector; resolves to (scores [k], rows [k])."""
        fut: Future = Future()
        with self._lock:
            self._pending.append((np.asarray(query, np.float32), fut))
            n = len(self._pending)
        if n >= self.max_batch:
            self._wake.set()
        return fut

    def search(self, query: np.ndarray, timeout: Optional[float] = 30.0):
        """Synchronous convenience wrapper."""
        return self.submit(query).result(timeout=timeout)

    def _loop(self) -> None:
        while not self._stop.is_set():
            self._wake.wait(self.max_wait_s)
            self._wake.clear()
            with self._lock:
                batch = self._pending
                self._pending = []
            if not batch:
                continue
            self._flush(batch)

    def _flush(self, batch: List[Tuple[np.ndarray, Future]]) -> None:
        queries = np.stack([q for q, _ in batch])
        try:
            scores, rows = self.index.search(queries, self.k)
        except Exception as exc:
            for _, fut in batch:
                if not fut.cancelled():
                    fut.set_exception(exc)
            return
        self.stats.queries += len(batch)
        self.stats.batches += 1
        self.stats.max_batch_seen = max(self.stats.max_batch_seen, len(batch))
        for i, (_, fut) in enumerate(batch):
            if not fut.cancelled():
                fut.set_result((scores[i], rows[i]))

    def close(self) -> None:
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=5)
        with self._lock:
            leftover = self._pending
            self._pending = []
        if leftover:
            self._flush(leftover)


__all__ = ["QueryService", "ServiceStats"]
