"""Segmented incremental index: append -> seal -> merge/compact.

Reference: crates/codegraph-vector/src/incremental.rs:402-1021 —
IndexSegment append/seal (:86-150), prioritized UpdateBatch (:69-84),
background merge/compaction, stats (:198). TPU re-design: each segment
is its own device-resident FlatIndex; the active segment absorbs
appends (amortized device updates), sealing freezes it, and compaction
concatenates sealed segments into one big matrix so steady-state search
scans one large [N, D] (best MXU shape) plus a small active tail.
Search fans out over segments and k-way-merges on host — the same merge
as the cross-shard path.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from codegraph_tpu.index.flat import FlatIndex
from codegraph_tpu.ops.topk import NEG_INF


@dataclass
class SegmentInfo:
    segment_id: int
    sealed: bool
    rows: int
    live: int
    created_at: float


class SegmentedIndex:
    """Append-optimized index with stable global rows.

    Global row = segment_base + local row; bases are fixed at segment
    creation (capacity-stride), so sealing/compaction never renumbers.
    """

    SEGMENT_STRIDE = 1 << 22  # max rows per segment id-space

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        dtype: str = "float32",
        seal_threshold: int = 100_000,
        compact_min_segments: int = 4,
    ):
        self.dim = dim
        self.metric = metric
        self.dtype = dtype
        self.seal_threshold = seal_threshold
        self.compact_min_segments = compact_min_segments
        self._segments: List[FlatIndex] = []
        self._sealed: List[bool] = []
        self._created: List[float] = []
        self._new_segment()

    # -- segment lifecycle -------------------------------------------------

    def _new_segment(self) -> int:
        self._segments.append(
            FlatIndex(self.dim, metric=self.metric, dtype=self.dtype)
        )
        self._sealed.append(False)
        self._created.append(time.time())
        return len(self._segments) - 1

    @property
    def _active(self) -> int:
        return len(self._segments) - 1

    def seal_active(self) -> None:
        """Freeze the active segment and open a new one
        (incremental.rs:150 seal)."""
        if len(self._segments[self._active]) > 0:
            self._sealed[self._active] = True
            self._new_segment()

    # -- ingest ------------------------------------------------------------

    def add(self, vectors: np.ndarray) -> np.ndarray:
        seg = self._active
        local = self._segments[seg].add(vectors)
        rows = seg * self.SEGMENT_STRIDE + local
        if self._segments[seg].n_rows >= self.seal_threshold:
            self.seal_active()
        return rows

    def delete(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, np.int64)
        by_seg: Dict[int, List[int]] = {}
        for r in rows:
            by_seg.setdefault(int(r) // self.SEGMENT_STRIDE, []).append(
                int(r) % self.SEGMENT_STRIDE
            )
        for seg, local in by_seg.items():
            if seg < len(self._segments):
                self._segments[seg].delete(np.asarray(local, np.int64))

    # -- query -------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        B = q.shape[0]
        best_s = np.full((B, k), float(NEG_INF), np.float32)
        best_i = np.full((B, k), -1, np.int64)
        for seg, index in enumerate(self._segments):
            if len(index) == 0:
                continue
            s, i = index.search(q, k)
            gi = np.where(i >= 0, i.astype(np.int64) + seg * self.SEGMENT_STRIDE, -1)
            cs = np.concatenate([best_s, s], axis=1)
            ci = np.concatenate([best_i, gi], axis=1)
            order = np.argsort(-cs, axis=1)[:, :k]
            best_s = np.take_along_axis(cs, order, axis=1)
            best_i = np.take_along_axis(ci, order, axis=1)
        return best_s, best_i

    # -- compaction --------------------------------------------------------

    def should_compact(self) -> bool:
        sealed = sum(1 for s in self._sealed if s)
        return sealed >= self.compact_min_segments

    def compact(self) -> Dict[int, int]:
        """Merge all sealed segments into one; returns {old_row: new_row}
        remap for the caller's row bookkeeping (the reference's merge
        phase; dead rows are dropped, reclaiming tombstone space)."""
        sealed_ids = [i for i, s in enumerate(self._sealed) if s]
        if len(sealed_ids) < 2:
            return {}
        vectors, remap_src = [], []
        for seg in sealed_ids:
            index = self._segments[seg]
            x, bias = index.arrays()
            if x is None:
                continue
            x_np = np.asarray(x, np.float32)[: index.n_rows]
            live = np.asarray(bias)[: index.n_rows] > float(NEG_INF) / 2
            for local in np.nonzero(live)[0]:
                vectors.append(x_np[local])
                remap_src.append(seg * self.SEGMENT_STRIDE + int(local))
        # same metric as the rest of the index: queries must be treated
        # identically across segments (re-normalizing already-normalized
        # rows is a no-op)
        merged = FlatIndex(self.dim, metric=self.metric, dtype=self.dtype)
        remap: Dict[int, int] = {}
        if vectors:
            local = merged.add(np.stack(vectors))
        else:
            local = np.zeros((0,), np.int64)
        # rebuild the segment list: merged first, then unsealed tail
        tail = [
            (i, s) for i, s in enumerate(self._segments)
            if not self._sealed[i]
        ]
        new_segments = [merged] + [s for _, s in tail]
        new_sealed = [True] + [False] * len(tail)
        for new_local, old_row in zip(local, remap_src):
            remap[old_row] = int(new_local)  # merged is segment 0
        # tail segments keep their indices shifted: old seg -> new position
        for new_pos, (old_seg, _) in enumerate(tail, start=1):
            for r in range(self._segments[old_seg].n_rows):
                remap[old_seg * self.SEGMENT_STRIDE + r] = (
                    new_pos * self.SEGMENT_STRIDE + r
                )
        self._segments = new_segments
        self._sealed = new_sealed
        self._created = [time.time()] * len(new_segments)
        return remap

    # -- stats -------------------------------------------------------------

    def stats(self) -> List[SegmentInfo]:
        return [
            SegmentInfo(
                segment_id=i, sealed=self._sealed[i],
                rows=self._segments[i].n_rows, live=len(self._segments[i]),
                created_at=self._created[i],
            )
            for i in range(len(self._segments))
        ]

    def __len__(self) -> int:
        return sum(len(s) for s in self._segments)


__all__ = ["SegmentedIndex", "SegmentInfo"]
