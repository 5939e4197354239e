"""IVF (inverted-file) index: k-means partitions + bucketed probe search.

BASELINE config 3: k-means nlist partitions, nprobe sweep for the
recall/QPS curve. TPU-native replacement for the reference's SurrealDB
HNSW approximate index (schema/codegraph.surql:815-823, EFC=150 M=12):
HNSW's pointer-chasing graph walk is hostile to XLA's static shapes, so
approximation comes instead from scanning only `nprobe` of `nlist`
k-means cells. Variable-length inverted lists become a dense
[nlist, list_cap, D] tensor (bucketed padding + capacity factor, see
SURVEY.md section 7 "IVF load imbalance"); overflowing cells trigger a
repad. Search is two stages on the MXU:

  1. coarse: Q @ C^T -> top-nprobe cells per query
  2. probe:  lax.scan over nprobe; each step gathers one [B, list_cap, D]
             block of whole cells (contiguous DMA per cell) and merges
             its scores into the running top-k carry.

Per-query probed rows = nprobe * list_cap ~= nprobe/nlist of the corpus —
that ratio is the QPS multiplier over the flat scan.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codegraph_tpu.core.errors import DimensionMismatch, IndexNotBuilt
from codegraph_tpu.core.padding import round_up
from codegraph_tpu.ops.similarity import l2_normalize
from codegraph_tpu.ops.topk import NEG_INF, merge_topk
from codegraph_tpu.ops.kmeans import assign_clusters, kmeans


# donated scatters: .at[].set() on a multi-GB cell tensor would otherwise
# allocate a full copy next to the original (OOM at 1M x 768 scale)
@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter2(buf, cells, pos, vals):
    return buf.at[cells, pos].set(vals)


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search_kernel(
    q: jax.Array,          # [B, D] f32
    centroids: jax.Array,  # [nlist, D] f32
    x_lists: jax.Array,    # [nlist, list_cap, D]
    id_lists: jax.Array,   # [nlist, list_cap] i32 (-1 pad)
    bias_lists: jax.Array, # [nlist, list_cap] f32 (0 live / NEG_INF dead)
    k: int,
    nprobe: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores [B, k], global row ids [B, k])."""
    B = q.shape[0]
    # stage 1: coarse quantizer on the MXU
    c_scores = jax.lax.dot_general(
        q, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, nlist]
    _, probe_ids = jax.lax.top_k(c_scores, nprobe)  # [B, nprobe]

    # stage 2: probe cells, streaming merge
    def step(carry, p):
        top_s, top_i = carry
        cell = probe_ids[:, p]  # [B]
        xt = jnp.take(x_lists, cell, axis=0)      # [B, list_cap, D]
        it = jnp.take(id_lists, cell, axis=0)     # [B, list_cap]
        bt = jnp.take(bias_lists, cell, axis=0)   # [B, list_cap]
        s = jnp.einsum(
            "bd,bcd->bc", q, xt.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + bt
        return merge_topk(top_s, top_i, s, it, k), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    (top_s, top_i), _ = jax.lax.scan(step, init, jnp.arange(nprobe))
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("k", "tile_u"))
def ivf_batch_search_kernel(
    q: jax.Array,           # [B, D] f32
    probe_ids: jax.Array,   # [B, nprobe] i32
    cells_u: jax.Array,     # [U_pad] i32 union of probed cells (pad = nlist)
    x_lists: jax.Array,     # [nlist, cap, D]
    id_lists: jax.Array,    # [nlist, cap] i32
    bias_lists: jax.Array,  # [nlist, cap] f32
    k: int,
    tile_u: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-shared IVF search: gather each UNIQUE probed cell once and
    score it against the whole query batch on the MXU (a membership mask
    re-imposes each query's own nprobe cells). The per-query kernel
    gathers [B, cap, D] rows per probe step — B redundant copies of any
    cell shared across the batch; here the gather is per-cell and the
    scoring is a plain [B, D] x [D, tile_u*cap] matmul. Identical scores
    to ivf_search_kernel; the win scales with probe overlap (same design
    as index/ivfpq.py ivfpq_batch_search_kernel, minus the decode)."""
    B, D = q.shape
    nlist, cap = id_lists.shape
    U = cells_u.shape[0]
    assert U % tile_u == 0
    n_tiles = U // tile_u

    member = jnp.any(
        probe_ids[:, :, None] == cells_u[None, None, :], axis=1
    )  # [B, U]
    mem_tiles = member.T.reshape(n_tiles, tile_u, B)
    u_tiles = cells_u.reshape(n_tiles, tile_u)

    def step(carry, inp):
        top_s, top_i = carry
        cu, mem_t = inp
        cu_safe = jnp.minimum(cu, nlist - 1)
        xt = jnp.take(x_lists, cu_safe, axis=0)         # [tu, cap, D]
        s = jnp.einsum("bd,ucd->buc", q, xt.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        bt = jnp.take(bias_lists, cu_safe, axis=0)
        s = s + bt[None, :, :]
        s = s + jnp.where(mem_t.T[:, :, None], 0.0, NEG_INF)
        it = jnp.take(id_lists, cu_safe, axis=0)
        s = s.reshape(B, tile_u * cap)
        ids = jnp.broadcast_to(it.reshape(-1)[None, :], (B, tile_u * cap))
        return merge_topk(top_s, top_i, s, ids, k), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    (top_s, top_i), _ = jax.lax.scan(step, init, (u_tiles, mem_tiles))
    return top_s, top_i


class IVFIndex:
    """k-means-partitioned approximate index over HBM-resident cells.

    capacity_factor: list_cap = capacity_factor * N/nlist (padded); cells
    that overflow at add() time trigger a global repad to a larger cap.
    """

    def __init__(
        self,
        dim: int,
        nlist: int = 4096,
        nprobe: int = 64,
        metric: str = "cosine",
        dtype: str = "float32",
        kmeans_iters: int = 10,
        capacity_factor: float = 2.0,
        train_sample: int = 262_144,
        seed: int = 0,
    ):
        if metric not in ("cosine", "dot"):
            raise ValueError(f"unknown metric {metric!r}")
        self.dim = int(dim)
        self.nlist = int(nlist)
        self.nprobe = min(int(nprobe), self.nlist)
        self.metric = metric
        self.dtype = jnp.dtype(dtype)
        self.kmeans_iters = int(kmeans_iters)
        self.capacity_factor = float(capacity_factor)
        self.train_sample = int(train_sample)
        self.seed = int(seed)

        # search_batch() routing threshold. For RAW-vector cells the
        # per-query probe is already matmul-shaped, and measured FASTER
        # than the shared-union kernel on uniform batches (2,715 vs
        # 1,620 QPS at 500k x 768, B=1024) — so plain IVF never
        # auto-routes (inf); IVFPQIndex overrides this (decode
        # amortization measured 3.6-14x there).
        self.batch_share_threshold = float("inf")
        self.list_cap = 0
        self.n_rows = 0  # global rows ever assigned (includes tombstones)
        self.n_live = 0
        self._centroids: Optional[jax.Array] = None  # [nlist, D] f32
        self._x: Optional[jax.Array] = None          # [nlist, cap, D]
        self._ids: Optional[jax.Array] = None        # [nlist, cap] i32
        self._bias: Optional[jax.Array] = None       # [nlist, cap] f32
        # host-side bookkeeping
        self._fill = np.zeros((self.nlist,), np.int64)  # rows used per cell
        self._row_loc: dict[int, tuple[int, int]] = {}  # row -> (cell, pos)

    # -- build -------------------------------------------------------------

    def _prepare(self, vectors: np.ndarray) -> jax.Array:
        v = jnp.asarray(vectors)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, v.shape[1] if v.ndim == 2 else -1)
        v = v.astype(jnp.float32)
        if self.metric == "cosine":
            v = l2_normalize(v)
        return v

    def train(self, vectors: np.ndarray) -> None:
        """k-means on (a sample of) the training vectors — the on-chip
        analogue of the reference's PQ training loop (persistent.rs:155)."""
        v = self._prepare(vectors)
        n = v.shape[0]
        if n < self.nlist:
            raise ValueError(f"need >= nlist={self.nlist} train vectors, got {n}")
        if n > self.train_sample:
            sel = np.random.default_rng(self.seed).choice(
                n, self.train_sample, replace=False
            )
            v = jnp.take(v, jnp.asarray(np.sort(sel)), axis=0)
        tile = min(4096, round_up(v.shape[0], 8))
        self._centroids, _ = kmeans(
            v, self.nlist, n_iters=self.kmeans_iters, metric=self.metric,
            tile_n=tile, seed=self.seed,
        )

    @property
    def is_trained(self) -> bool:
        return self._centroids is not None

    def _alloc(self, list_cap: int) -> None:
        """(Re)allocate cell storage at a new list_cap, preserving data."""
        list_cap = max(8, round_up(list_cap, 8))
        x = jnp.zeros((self.nlist, list_cap, self.dim), self.dtype)
        ids = jnp.full((self.nlist, list_cap), -1, jnp.int32)
        bias = jnp.full((self.nlist, list_cap), NEG_INF, jnp.float32)
        if self._x is not None and self.list_cap > 0:
            old = min(self.list_cap, list_cap)
            x = x.at[:, :old].set(self._x[:, :old].astype(self.dtype))
            ids = ids.at[:, :old].set(self._ids[:, :old])
            bias = bias.at[:, :old].set(self._bias[:, :old])
        self._x, self._ids, self._bias = x, ids, bias
        self.list_cap = list_cap

    def _target_cap(self, n_rows: int) -> int:
        """Cell capacity demanded by n_rows total — ONE formula shared by
        reserve() and add(): if they drift, presizing stops matching
        demand and chunked builds fall back to per-chunk reallocation."""
        return max(
            8, int(np.ceil(self.capacity_factor * n_rows / self.nlist))
        )

    def reserve(self, n_rows: int) -> None:
        """Pre-size cell capacity for an expected corpus size — one
        allocation instead of geometric growth during a chunked build."""
        target_cap = self._target_cap(n_rows)
        if target_cap > self.list_cap:
            self._alloc(target_cap)

    def _store_values(self, v: jax.Array, cells: np.ndarray) -> jax.Array:
        """What a cell stores per row — subclasses reshape this (IVFPQ
        stores residual codes instead of the vectors themselves)."""
        return v.astype(self.dtype)

    def _scatter_payload(
        self, cells_j: jax.Array, pos_j: jax.Array, vals: jax.Array
    ) -> None:
        """Scatter per-row payloads into cell storage — subclasses with a
        different storage layout override (IVFPQ stores codes
        subspace-major [nlist, m, cap] for the lane-gather ADC kernel)."""
        self._x = _scatter2(self._x, cells_j, pos_j, vals)

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Assign to nearest cell (with capacity-bounded spill) and append.

        Cells are capped at capacity_factor * N/nlist rows: k-means cell
        sizes are heavy-tailed (measured 87% padding waste at 1M x 768
        without a cap), so a full cell spills rows to their SECOND
        nearest centroid, and if that is also full, to the least-filled
        cell. Spilled rows are still found whenever their host cell is
        probed; nprobe == nlist remains exact.
        """
        if not self.is_trained:
            raise IndexNotBuilt("IVFIndex.train() must run before add()")
        v = self._prepare(vectors)
        n = v.shape[0]
        if n == 0:
            return np.zeros((0,), np.int64)
        tile = min(4096, round_up(n, 8))
        pad = (-n) % tile
        v_pad = jnp.concatenate([v, jnp.zeros((pad, self.dim), v.dtype)]) if pad else v
        mask = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((pad,), bool)]) if pad else jnp.ones((n,), bool)
        from codegraph_tpu.ops.kmeans import assign_clusters_topk

        top2 = np.asarray(assign_clusters_topk(
            v_pad, self._centroids, mask, tile_n=tile,
            metric="cosine" if self.metric == "cosine" else "dot",
            top=min(2, self.nlist),
        ))[:n]
        if top2.shape[1] == 1:  # nlist == 1: no second choice to spill to
            top2 = np.repeat(top2, 2, axis=1)

        # Growth is geometric (1.5x): _alloc copies the whole cell
        # tensor, so per-chunk linear growth made ingest O(total^2)
        # (measured as per-chunk add time climbing 15 -> 53 s over a
        # 10M build); amortized growth keeps it flat but can overshoot
        # the capacity-factor bound by up to 1.5x — builds near the HBM
        # budget should reserve() upfront, which allocates exactly once
        # at the capacity-factor bound.
        target_cap = self._target_cap(self.n_rows + n)
        if target_cap > self.list_cap:
            grown = max(target_cap, int(self.list_cap * 1.5))
            self._alloc(grown)

        rows = np.arange(self.n_rows, self.n_rows + n, dtype=np.int64)
        # (cell, pos) per row with spill: first choice -> second -> least-
        # filled. Sequential (fill state) -> native cghost when available
        # (~15s interpreted at 500k rows, ~10ms native).
        from codegraph_tpu.native import ivf_spill_fill_native

        fill = self._fill
        cap = self.list_cap
        native = ivf_spill_fill_native(top2, fill, cap)
        if native is not None:
            assign, pos = native
        else:
            assign = np.empty((n,), np.int64)
            pos = np.empty((n,), np.int64)
            for j in range(n):
                c = int(top2[j, 0])
                if fill[c] >= cap:
                    c2 = int(top2[j, 1])
                    c = c2 if fill[c2] < cap else int(np.argmin(fill))
                assign[j] = c
                pos[j] = fill[c]
                fill[c] += 1
        cells_j = jnp.asarray(assign.astype(np.int32))
        pos_j = jnp.asarray(pos.astype(np.int32))
        self._scatter_payload(cells_j, pos_j, self._store_values(v, assign))
        self._ids = _scatter2(
            self._ids, cells_j, pos_j, jnp.asarray(rows.astype(np.int32))
        )
        self._bias = _scatter2(
            self._bias, cells_j, pos_j, jnp.zeros((n,), jnp.float32)
        )
        for r, c, p in zip(rows, assign, pos):
            self._row_loc[int(r)] = (int(c), int(p))
        self.n_rows += n
        self.n_live += n
        return rows

    def delete(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, np.int64)
        if rows.size == 0:
            return
        cells = np.empty((rows.size,), np.int32)
        pos = np.empty((rows.size,), np.int32)
        for j, r in enumerate(rows):
            c, p = self._row_loc[int(r)]
            cells[j], pos[j] = c, p
        self._bias = self._bias.at[jnp.asarray(cells), jnp.asarray(pos)].set(NEG_INF)
        self.n_live -= int(rows.size)

    # -- query -------------------------------------------------------------

    def search(
        self, queries: np.ndarray, k: int, nprobe: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._x is None or self.n_rows == 0:
            B = np.asarray(queries).shape[0]
            return (
                np.full((B, k), float(NEG_INF), np.float32),
                np.full((B, k), -1, np.int32),
            )
        q = jnp.asarray(queries).astype(jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, q.shape[1])
        if q.shape[0] >= self.batch_share_threshold:
            return self.search_batch(queries, k, nprobe=nprobe)
        if self.metric == "cosine":
            q = l2_normalize(q)
        np_eff = min(nprobe or self.nprobe, self.nlist)
        s, i = ivf_search_kernel(
            q, self._centroids, self._x, self._ids, self._bias, k, np_eff
        )
        s_np, i_np = np.asarray(s), np.asarray(i)
        dead = s_np <= float(NEG_INF) / 2
        i_np = np.where(dead, -1, i_np)
        return s_np, i_np

    def search_batch(
        self, queries: np.ndarray, k: int, nprobe: Optional[int] = None,
        tile_u: int = 16,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch-shared search: dedupe the batch's probed cells and score
        the union on the MXU (ivf_batch_search_kernel). Same results as
        search(); faster for large batches with probe overlap."""
        if self._x is None or self.n_rows == 0:
            B = np.asarray(queries).shape[0]
            return (
                np.full((B, k), float(NEG_INF), np.float32),
                np.full((B, k), -1, np.int32),
            )
        q = jnp.asarray(queries).astype(jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, q.shape[1])
        if self.metric == "cosine":
            q = l2_normalize(q)
        np_eff = min(nprobe or self.nprobe, self.nlist)
        c_scores = jax.lax.dot_general(
            q, self._centroids, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        _, probe_ids = jax.lax.top_k(c_scores, np_eff)
        uniq = np.unique(np.asarray(probe_ids))
        u_pad = tile_u
        while u_pad < uniq.size:
            u_pad *= 2
        cells_u = np.full((u_pad,), self.nlist, np.int32)  # pad never matches
        cells_u[: uniq.size] = uniq
        s, i = ivf_batch_search_kernel(
            q, probe_ids, jnp.asarray(cells_u), self._x, self._ids,
            self._bias, k, tile_u=tile_u,
        )
        s_np, i_np = np.asarray(s), np.asarray(i)
        i_np = np.where(s_np <= float(NEG_INF) / 2, -1, i_np)
        return s_np, i_np

    # -- state -------------------------------------------------------------

    def arrays(self):
        return self._centroids, self._x, self._ids, self._bias

    def stats(self) -> dict:
        """Cell fill statistics — padding waste is the IVF tax on TPU
        (SURVEY.md section 7 hard parts)."""
        fill = self._fill
        used = int(fill.sum())
        cap_total = self.nlist * self.list_cap
        return {
            "nlist": self.nlist,
            "list_cap": self.list_cap,
            "rows": self.n_rows,
            "live": self.n_live,
            "max_fill": int(fill.max()) if self.nlist else 0,
            "empty_cells": int((fill == 0).sum()),
            "padding_waste": 1.0 - used / cap_total if cap_total else 0.0,
        }

    def __len__(self) -> int:
        return self.n_live


__all__ = ["IVFIndex", "ivf_search_kernel", "ivf_batch_search_kernel"]
