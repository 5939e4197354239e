"""IVF-PQ: coarse k-means cells + residual product-quantized codes.

The 100M+-rows-per-chip capacity tier. The reference pairs its HNSW
index with a ProductQuantizer for compressed persistence
(crates/codegraph-vector/src/persistent.rs:118-330); here PQ is the
LIVE search representation: each row is stored as m uint8 codes of its
RESIDUAL against its cell centroid, so a 768-d f32 row (3KB) becomes
m bytes (96B at m=96) and ~160M rows fit in one v5e's 16GB HBM
including ids/bias.

Scoring uses the exact dot decomposition

    q . x  =  q . c(x)  +  q . (x - c(x))  ~=  coarse + ADC(residual)

so the coarse matmul (stage 1, already computed for probing) contributes
the first term and an asymmetric-distance table lookup over the probed
cells' codes contributes the second. Both stages keep static shapes:
cells are the same capacity-bounded [nlist, cap, m] buckets as IVFIndex
(second-choice spill, ops/kmeans.py assign_clusters_topk).

Accuracy knobs: m (bytes/row), nbits (ksub = 2^nbits), nprobe. With
nprobe == nlist the only error left is PQ quantization of the residual.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codegraph_tpu.core.errors import DimensionMismatch
from codegraph_tpu.index.ivf import IVFIndex
from codegraph_tpu.ops.kmeans import assign_clusters
from codegraph_tpu.ops.pq import pq_encode, pq_train
from codegraph_tpu.ops.topk import NEG_INF, merge_topk


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivfpq_search_kernel(
    q: jax.Array,           # [B, D] f32
    centroids: jax.Array,   # [nlist, D] f32 coarse
    code_lists: jax.Array,  # [nlist, cap, m] uint8 residual codes
    id_lists: jax.Array,    # [nlist, cap] i32 (-1 pad)
    bias_lists: jax.Array,  # [nlist, cap] f32 (0 live / NEG_INF dead)
    books: jax.Array,       # [m, ksub, dsub] f32 residual codebooks
    k: int,
    nprobe: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (approx scores [B, k], global row ids [B, k])."""
    B, D = q.shape
    m, ksub, dsub = books.shape

    # stage 1: coarse quantizer (MXU); scores reused as the q.c term
    c_scores = jax.lax.dot_general(
        q, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, nlist]
    probe_s, probe_ids = jax.lax.top_k(c_scores, nprobe)  # [B, nprobe]

    # residual ADC table: table[b, j, :] = q_sub[b, j] . books[j]
    table = jnp.einsum("bmd,mkd->bmk", q.reshape(B, m, dsub), books,
                       preferred_element_type=jnp.float32)  # [B, m, ksub]

    # per-query cell gathers are the memory hot spot: [tile_b, cap, m]
    # int32 is ~120MB at tile_b=128, cap=2442, m=96 — tiling B bounds the
    # working set (a flat B=1024 gather peaked ~1GB/step and could crash
    # the worker at high nprobe)
    tile_b = min(B, 128)
    pad_b = (-B) % tile_b

    def step(carry, p):
        top_s, top_i = carry
        cell = probe_ids[:, p]                              # [B]

        def score_tile(args):
            cell_t, table_t = args
            ct = jnp.take(code_lists, cell_t, axis=0).astype(jnp.int32)
            adc = jnp.sum(
                jnp.take_along_axis(
                    table_t[:, None, :, :],   # [tb, 1, m, ksub]
                    ct[:, :, :, None],        # [tb, cap, m, 1]
                    axis=3,
                )[..., 0],
                axis=-1,
            )                                               # [tb, cap]
            return adc

        if pad_b:
            cell_p = jnp.concatenate([cell, jnp.zeros((pad_b,), cell.dtype)])
            table_p = jnp.concatenate(
                [table, jnp.zeros((pad_b, m, ksub), table.dtype)])
        else:
            cell_p, table_p = cell, table
        adc = jax.lax.map(score_tile, (
            cell_p.reshape(-1, tile_b),
            table_p.reshape(-1, tile_b, m, ksub),
        )).reshape(-1, code_lists.shape[1])[:B]             # [B, cap]
        it = jnp.take(id_lists, cell, axis=0)               # [B, cap]
        bt = jnp.take(bias_lists, cell, axis=0)             # [B, cap]
        s = probe_s[:, p][:, None] + adc + bt
        return merge_topk(top_s, top_i, s, it, k), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    (top_s, top_i), _ = jax.lax.scan(step, init, jnp.arange(nprobe))
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("k", "tile_u"))
def ivfpq_batch_search_kernel(
    q: jax.Array,           # [B, D] f32
    probe_ids: jax.Array,   # [B, nprobe] i32 cells each query probes
    cells_u: jax.Array,     # [U_pad] i32 union of probed cells (pad = nlist)
    code_lists: jax.Array,  # [nlist, cap, m] uint8
    id_lists: jax.Array,    # [nlist, cap] i32
    bias_lists: jax.Array,  # [nlist, cap] f32
    centroids: jax.Array,   # [nlist, D] f32
    books: jax.Array,       # [m, ksub, dsub] f32
    k: int,
    tile_u: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-shared IVF-PQ search: decode each UNIQUE probed cell once
    and score it against the whole query batch on the MXU.

    The per-query ADC kernel gathers [B, cap, m] table entries per probe
    step — B*cap*m scattered lookups that the VPU hates. Here the
    batch's probed cells are deduplicated (host side); each unique cell
    is decoded ONCE (codes -> codebook rows -> +centroid, exactly
    q.(c + decode(r)) == coarse + ADC, so scores are identical), and the
    scoring is one [B, D] x [D, tile_u*cap] matmul per tile — decode
    cost amortizes over all B queries and the FLOPs ride the MXU. A
    membership mask re-imposes each query's own nprobe cells. The win
    scales with probe overlap: clustered query batches touch few unique
    cells (this is the batch-IVF query-clustering design).
    """
    B, D = q.shape
    m, ksub, dsub = books.shape
    nlist, cap = id_lists.shape
    U = cells_u.shape[0]
    assert U % tile_u == 0
    n_tiles = U // tile_u

    # member[b, u]: does query b probe cells_u[u]? (pad value nlist never
    # matches, so padded columns score NEG_INF for every query)
    member = jnp.any(
        probe_ids[:, :, None] == cells_u[None, None, :], axis=1
    )  # [B, U]
    mem_tiles = member.T.reshape(n_tiles, tile_u, B)
    u_tiles = cells_u.reshape(n_tiles, tile_u)

    def step(carry, inp):
        top_s, top_i = carry
        cu, mem_t = inp                       # [tu], [tu, B]
        cu_safe = jnp.minimum(cu, nlist - 1)  # clamp the pad value
        codes = jnp.take(code_lists, cu_safe, axis=0)  # [tu, cap, m]
        rec = jnp.take_along_axis(
            books[None, :, :, :],                       # [1, m, ksub, dsub]
            codes.reshape(-1, m).astype(jnp.int32)[:, :, None, None],
            axis=2,
        )[:, :, 0, :]                                   # [tu*cap, m, dsub]
        dec = rec.reshape(tile_u, cap, D) + jnp.take(
            centroids, cu_safe, axis=0)[:, None, :]     # [tu, cap, D]
        s = jnp.einsum("bd,ucd->buc", q, dec,
                       preferred_element_type=jnp.float32)
        bt = jnp.take(bias_lists, cu_safe, axis=0)      # [tu, cap]
        s = s + bt[None, :, :]
        s = s + jnp.where(mem_t.T[:, :, None], 0.0, NEG_INF)
        it = jnp.take(id_lists, cu_safe, axis=0)        # [tu, cap]
        s = s.reshape(B, tile_u * cap)
        ids = jnp.broadcast_to(it.reshape(-1)[None, :], (B, tile_u * cap))
        return merge_topk(top_s, top_i, s, ids, k), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    (top_s, top_i), _ = jax.lax.scan(step, init, (u_tiles, mem_tiles))
    return top_s, top_i


class IVFPQIndex(IVFIndex):
    """IVF cells storing m-byte residual PQ codes instead of vectors.

    Inherits training, capacity-bounded spill assignment, and tombstone
    bookkeeping from IVFIndex; overrides storage (codes, not vectors)
    and scoring (coarse + residual ADC).
    """

    def __init__(
        self,
        dim: int,
        nlist: int = 4096,
        nprobe: int = 64,
        m: int = 96,
        nbits: int = 8,
        metric: str = "cosine",
        kmeans_iters: int = 10,
        pq_iters: int = 10,
        capacity_factor: float = 2.0,
        train_sample: int = 262_144,
        refine: str = "none",
        refine_factor: int = 4,
        seed: int = 0,
    ):
        """refine="int8" (N*(D+4) host bytes) or refine="f32" (N*D*4
        host bytes) keeps per-row vectors in HOST memory — zero HBM —
        and exactly rescores the top refine_factor*k PQ candidates per
        query: PQ ranks coarsely within tight clusters (residual
        distortion ~ the neighbor margins), and the refine stage
        restores fine ranking (the FAISS-refine / DiskANN recipe).
        int8 rescoring resolves margins down to ~4e-3 of the score
        scale; use f32 when neighbor margins are tighter than that."""
        if dim % m != 0:
            raise ValueError(f"dim={dim} not divisible by m={m}")
        if refine not in ("none", "int8", "f32"):
            raise ValueError(f"unknown refine mode {refine!r}")
        super().__init__(
            dim, nlist=nlist, nprobe=nprobe, metric=metric, dtype="float32",
            kmeans_iters=kmeans_iters, capacity_factor=capacity_factor,
            train_sample=train_sample, seed=seed,
        )
        self.m = int(m)
        self.nbits = int(nbits)
        self.pq_iters = int(pq_iters)
        self.refine = refine
        self.refine_factor = int(refine_factor)
        # batches at least this large route to the batch-shared kernel
        # (decode each unique probed cell once; 3.6-14x measured on TPU)
        self.batch_share_threshold = 256
        self._books: Optional[jax.Array] = None  # [m, ksub, dsub]
        self._raw_chunks: list = []              # host int8 rows (refine)
        self._raw_scales: list = []              # host f32 per-row scales

    # -- build -------------------------------------------------------------

    def train(self, vectors: np.ndarray) -> None:
        """Coarse k-means (inherited), then residual PQ codebooks on the
        same sample (persistent.rs:155-186 trains per-subspace k-means;
        here it runs on cell residuals, the standard IVF-PQ recipe)."""
        super().train(vectors)
        v = self._prepare(vectors)
        n = v.shape[0]
        if n > self.train_sample:
            sel = np.random.default_rng(self.seed).choice(
                n, self.train_sample, replace=False
            )
            v = jnp.take(v, jnp.asarray(np.sort(sel)), axis=0)
        from codegraph_tpu.core.padding import round_up

        tile = min(4096, round_up(v.shape[0], 8))
        pad = (-v.shape[0]) % tile
        v_pad = jnp.concatenate(
            [v, jnp.zeros((pad, self.dim), v.dtype)]) if pad else v
        mask = jnp.concatenate(
            [jnp.ones((v.shape[0],), bool), jnp.zeros((pad,), bool)]
        ) if pad else jnp.ones((v.shape[0],), bool)
        assign = assign_clusters(
            v_pad, self._centroids, mask, tile_n=tile,
            metric="cosine" if self.metric == "cosine" else "dot",
        )[: v.shape[0]]
        residuals = v - jnp.take(self._centroids, assign, axis=0)
        # tiny corpora: shrink codebooks so ksub <= train rows
        nbits_eff = self.nbits
        while (1 << nbits_eff) > v.shape[0] and nbits_eff > 1:
            nbits_eff -= 1
        self._books = pq_train(
            residuals, self.m, nbits=nbits_eff, n_iters=self.pq_iters,
            seed=self.seed,
        ).centroids

    @property
    def is_trained(self) -> bool:
        return self._centroids is not None and self._books is not None

    def _alloc(self, list_cap: int) -> None:
        """Cell storage holds uint8 codes [nlist, cap, m]."""
        from codegraph_tpu.core.padding import round_up

        list_cap = max(8, round_up(list_cap, 8))
        codes = jnp.zeros((self.nlist, list_cap, self.m), jnp.uint8)
        ids = jnp.full((self.nlist, list_cap), -1, jnp.int32)
        bias = jnp.full((self.nlist, list_cap), NEG_INF, jnp.float32)
        if self._x is not None and self.list_cap > 0:
            old = min(self.list_cap, list_cap)
            codes = codes.at[:, :old].set(self._x[:, :old])
            ids = ids.at[:, :old].set(self._ids[:, :old])
            bias = bias.at[:, :old].set(self._bias[:, :old])
        self._x, self._ids, self._bias = codes, ids, bias
        self.list_cap = list_cap

    def _store_values(self, v: jax.Array, cells: np.ndarray) -> jax.Array:
        """Residual-encode v against its assigned cells -> uint8 codes.
        (add() itself is inherited: same spill assignment, different
        cell payload.) With refine="int8", the normalized rows are also
        banked in host RAM for the rescore stage."""
        if self.refine == "int8":
            vn = np.asarray(v)
            scale = np.maximum(
                np.max(np.abs(vn), axis=1, keepdims=True), 1e-12
            ) / 127.0
            self._raw_chunks.append(
                np.clip(np.round(vn / scale), -127, 127).astype(np.int8)
            )
            self._raw_scales.append(scale.astype(np.float32))
        elif self.refine == "f32":
            vn = np.asarray(v, np.float32)
            self._raw_chunks.append(vn)
            self._raw_scales.append(np.ones((vn.shape[0], 1), np.float32))
        residuals = v - jnp.take(self._centroids, jnp.asarray(cells), axis=0)
        return pq_encode(residuals, self._books)

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
        from codegraph_tpu.ops.similarity import l2_normalize

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
        use_refine = self.refine != "none" and self._raw_chunks
        k_fetch = max(k, min(k * self.refine_factor,
                             self.list_cap * np_eff)) if use_refine else k
        s, i = ivfpq_search_kernel(
            q, self._centroids, self._x, self._ids, self._bias,
            self._books, k_fetch, np_eff,
        )
        s_np, i_np = np.asarray(s), np.asarray(i)
        dead = s_np <= float(NEG_INF) / 2
        i_np = np.where(dead, -1, i_np)
        if not use_refine:
            return s_np, i_np
        return self._refine_host(np.asarray(q), s_np, i_np, k)

    def _refine_host(
        self, qnp: np.ndarray, s_np: np.ndarray, i_np: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact host rescore of the candidate set (rows * scales)."""
        if len(self._raw_chunks) > 1:
            self._raw_chunks = [np.concatenate(self._raw_chunks)]
            self._raw_scales = [np.concatenate(self._raw_scales)]
        raw, scales = self._raw_chunks[0], self._raw_scales[0]
        safe = np.maximum(i_np, 0)
        vecs = raw[safe].astype(np.float32) * scales[safe]  # [B, R, D]
        exact = np.einsum("bd,brd->br", qnp, vecs)
        exact = np.where(i_np >= 0, exact, float(NEG_INF))
        order = np.argsort(-exact, axis=1)[:, :k]
        return (
            np.take_along_axis(exact, order, axis=1),
            np.take_along_axis(i_np, order, axis=1),
        )

    def search_batch(
        self, queries: np.ndarray, k: int, nprobe: Optional[int] = None,
        tile_u: int = 16,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch-shared search: dedupe the batch's probed cells, decode
        each unique cell once, score on the MXU (ivfpq_batch_search_kernel).
        Same scores as search(); orders of magnitude faster for large
        batches whose queries share cells. U_pad buckets to powers of two
        to bound recompiles."""
        if self._x is None or self.n_rows == 0:
            B = np.asarray(queries).shape[0]
            return (
                np.full((B, k), float(NEG_INF), np.float32),
                np.full((B, k), -1, np.int32),
            )
        from codegraph_tpu.ops.similarity import l2_normalize

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

        use_refine = self.refine != "none" and self._raw_chunks
        k_fetch = max(k, min(k * self.refine_factor,
                             self.list_cap * np_eff)) if use_refine else k
        s, i = ivfpq_batch_search_kernel(
            q, probe_ids, jnp.asarray(cells_u), self._x, self._ids,
            self._bias, self._centroids, self._books, k_fetch,
            tile_u=tile_u,
        )
        s_np, i_np = np.asarray(s), np.asarray(i)
        dead = s_np <= float(NEG_INF) / 2
        i_np = np.where(dead, -1, i_np)
        if not use_refine:
            return s_np, i_np
        return self._refine_host(np.asarray(q), s_np, i_np, k)

    # -- state -------------------------------------------------------------

    def stats(self) -> dict:
        st = super().stats()
        st.update({
            "m": self.m,
            "nbits": self.nbits,
            "bytes_per_row": self.m + 4 + 4,  # codes + id + bias (HBM)
            "refine": self.refine,
            "host_bytes_per_row": {"none": 0, "int8": self.dim + 4,
                                   "f32": self.dim * 4}[self.refine],
        })
        return st


__all__ = ["IVFPQIndex", "ivfpq_search_kernel", "ivfpq_batch_search_kernel"]
