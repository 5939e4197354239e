"""Sharded IVF-PQ: the capacity tier times the mesh.

Config "3x5" taken to its limit: the [nlist, m, cap] residual-code
tensor shards over its CELL axis exactly like ShardedIVFIndex (whole
inverted lists stay chip-local; probes never cross ICI), the small
codebooks replicate, and each chip runs the coarse + residual-ADC
scoring over its local cells before the usual all_gather k-way merge.
At m=96 one v5e holds ~160M rows of codes, so an 8-chip slice holds
~1.3B rows — where the reference's single-node SurrealDB HNSW
(schema/codegraph.surql:815-823) stops at RAM.

Refine modes compose with the mesh two ways:
- host refine (int8/f32 rows in host RAM, index/ivfpq.py) applies AFTER
  the cross-shard merge: merged ids are global rows, shard-agnostic.
- refine="int8_device" (the production 10M operating point) shards the
  int8 row bank over the mesh BY GLOBAL ROW RANGE: every shard gathers
  the full cross-shard candidate set (k_fetch ids each over ICI),
  exactly rescores the candidates whose ids fall in its range, and a
  psum recombines — each valid id is in-range on exactly one shard, so
  the sum IS the exact score. No row ever visits the host, matching the
  single-chip bank semantics (index/ivfpq.py _refine_device_kernel).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from codegraph_tpu.core.errors import DimensionMismatch, IndexNotBuilt
from codegraph_tpu.index.ivfpq import IVFPQIndex
from codegraph_tpu.ops.topk import NEG_INF, merge_topk


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "mesh", "axis"))
def sharded_ivfpq_search(
    q: jax.Array,           # [B, D] replicated
    centroids: jax.Array,   # [nlist, D] sharded over `axis`
    code_lists: jax.Array,  # [nlist, m, cap] uint8, sharded
    id_lists: jax.Array,    # [nlist, cap] sharded (GLOBAL row ids)
    bias_lists: jax.Array,  # [nlist, cap] sharded
    books: jax.Array,       # [m, ksub, dsub] replicated
    k: int,
    nprobe: int,
    mesh: Mesh,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    def _per_shard(qs, cents, cl, il, bl, bk):
        B = qs.shape[0]
        s, i = _scan_local(qs, cents, cl, il, bl, bk, k, nprobe)
        # merge the per-shard candidate sets over ICI (ids are global)
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        n_shards = all_s.shape[0]
        cs = jnp.transpose(all_s, (1, 0, 2)).reshape(B, n_shards * k)
        ci = jnp.transpose(all_i, (1, 0, 2)).reshape(B, n_shards * k)
        top_s, pos = jax.lax.top_k(cs, k)
        return top_s, jnp.take_along_axis(ci, pos, axis=-1)

    return shard_map(
        _per_shard, mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis, None, None),
                  P(axis, None), P(axis, None), P()),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )(q, centroids, code_lists, id_lists, bias_lists, books)


def _scan_local(qs, cents, cl, il, bl, bk, k_fetch: int, nprobe: int):
    """Shard-local coarse + residual-ADC scan -> top-k_fetch
    (scores [B, k_fetch], GLOBAL row ids [B, k_fetch])."""
    B = qs.shape[0]
    m, ksub, dsub = bk.shape
    c_scores = jax.lax.dot_general(
        qs, cents, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, nlist_local]
    local_nprobe = min(nprobe, cents.shape[0])
    probe_s, probe_ids = jax.lax.top_k(c_scores, local_nprobe)
    table = jnp.einsum("bmd,mkd->bmk", qs.reshape(B, m, dsub), bk,
                       preferred_element_type=jnp.float32)

    def step(carry, p):
        top_s, top_i = carry
        cell = probe_ids[:, p]
        ct = jnp.take(cl, cell, axis=0).astype(jnp.int32)  # [B, m, cap]
        it = jnp.take(il, cell, axis=0)
        bt = jnp.take(bl, cell, axis=0)
        # adc[b, c] = sum_j table[b, j, ct[b, j, c]]
        adc = jnp.sum(jnp.take_along_axis(table, ct, axis=2), axis=1)
        s = probe_s[:, p][:, None] + adc + bt
        return merge_topk(top_s, top_i, s, it, k_fetch), None

    init = (jnp.full((B, k_fetch), NEG_INF, jnp.float32),
            jnp.full((B, k_fetch), -1, jnp.int32))
    (s, i), _ = jax.lax.scan(step, init, jnp.arange(local_nprobe))
    return s, i


@functools.partial(
    jax.jit, static_argnames=("k", "k_fetch", "nprobe", "mesh", "axis"))
def sharded_ivfpq_search_refined(
    q: jax.Array,           # [B, D] replicated
    centroids: jax.Array,   # [nlist, D] sharded over `axis` (cell axis)
    code_lists: jax.Array,  # [nlist, m, cap] uint8, sharded (cell axis)
    id_lists: jax.Array,    # [nlist, cap] sharded (GLOBAL row ids)
    bias_lists: jax.Array,  # [nlist, cap] sharded
    books: jax.Array,       # [m, ksub, dsub] replicated
    bank: jax.Array,        # [N_pad, D] int8, sharded by ROW RANGE
    scales: jax.Array,      # [N_pad, 1] f32, sharded by ROW RANGE
    k: int,
    k_fetch: int,
    nprobe: int,
    mesh: Mesh,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Sharded IVF-PQ with ON-DEVICE int8 exact refine (the production
    10M operating point, index/ivfpq.py refine="int8_device", on a mesh).

    Two shardings coexist: the cell tensors shard over the CELL axis
    (probes stay chip-local), the refine bank over the GLOBAL ROW RANGE
    (ids are dense over rows, cells are not). Per shard: ADC-scan
    top-k_fetch -> all_gather the S x k_fetch candidate ids over ICI ->
    exactly rescore the candidates whose ids land in this shard's row
    range (int8 gather + f32 dot, rows never leave the chip) -> psum
    recombines (ranges are disjoint: each valid id contributes on
    exactly one shard) -> replicated top-k. ICI traffic per query is
    k_fetch*8 candidate bytes + the [B, S*k_fetch] psum — no row data.
    """
    def _per_shard(qs, cents, cl, il, bl, bk, bank_l, sc_l):
        B = qs.shape[0]
        s, i = _scan_local(qs, cents, cl, il, bl, bk, k_fetch, nprobe)
        all_i = jax.lax.all_gather(i, axis)           # [S, B, k_fetch]
        n_shards = all_i.shape[0]
        C = n_shards * k_fetch
        ci = jnp.transpose(all_i, (1, 0, 2)).reshape(B, C)

        rows_per = bank_l.shape[0]
        lo = jax.lax.axis_index(axis) * rows_per

        # tile the candidate axis so the dequantized [B, tile, D] f32
        # rows stay ~100MB at production shapes (B=256, D=768)
        tile_c = 128 if C >= 128 else C
        Cp = -(-C // tile_c) * tile_c
        ci_p = jnp.pad(ci, ((0, 0), (0, Cp - C)), constant_values=-1)
        tiles = jnp.transpose(
            ci_p.reshape(B, Cp // tile_c, tile_c), (1, 0, 2))

        def tile_exact(ci_t):                         # [B, tile_c]
            in_r = (ci_t >= lo) & (ci_t < lo + rows_per)
            safe = jnp.clip(ci_t - lo, 0, rows_per - 1)
            rows = jnp.take(bank_l, safe, axis=0).astype(jnp.float32)
            scs = jnp.take(sc_l[:, 0], safe, axis=0)
            ex = jnp.einsum("bd,bcd->bc", qs, rows,
                            preferred_element_type=jnp.float32) * scs
            return jnp.where(in_r, ex, 0.0)

        part = jax.lax.map(tile_exact, tiles)         # [T, B, tile_c]
        part = jnp.transpose(part, (1, 0, 2)).reshape(B, Cp)[:, :C]
        total = jax.lax.psum(part, axis)              # exact scores
        total = jnp.where(ci >= 0, total, NEG_INF)
        top_s, pos = jax.lax.top_k(total, k)
        return top_s, jnp.take_along_axis(ci, pos, axis=-1)

    return shard_map(
        _per_shard, mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis, None, None),
                  P(axis, None), P(axis, None), P(),
                  P(axis, None), P(axis, None)),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )(q, centroids, code_lists, id_lists, bias_lists, books, bank, scales)


class ShardedIVFPQIndex:
    """Builds a single-host IVFPQIndex, then shards its cell tensors
    over the mesh. Probing is fully shard-local; only (score, id)
    candidate sets cross ICI. refine="int8_device" additionally shards
    the int8 row bank by global row range and rescores on-device before
    the final top-k (sharded_ivfpq_search_refined); host refine
    (int8/f32) applies after the merge."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        axis: str = "data",
        nlist: int = 4096,
        nprobe: int = 64,
        m: int = 96,
        metric: str = "cosine",
        kmeans_iters: int = 10,
        pq_iters: int = 10,
        refine: str = "none",
        refine_factor: int = 4,
        opq: bool = False,
    ):
        self.mesh = mesh
        self.axis = axis
        n_shards = mesh.shape[axis]
        if nlist % n_shards != 0:
            nlist = ((nlist // n_shards) + 1) * n_shards
        self._base = IVFPQIndex(
            dim, nlist=nlist, nprobe=nprobe, m=m, metric=metric,
            kmeans_iters=kmeans_iters, pq_iters=pq_iters,
            refine=refine, refine_factor=refine_factor, opq=opq,
        )
        self.nprobe = min(nprobe, nlist)
        self._placed = False
        self._centroids = self._x = self._ids = self._bias = None
        self._books = None
        self._bank = self._scales = None  # int8_device: row-range sharded

    @property
    def dim(self) -> int:
        return self._base.dim

    def train(self, vectors) -> None:
        self._base.train(vectors)

    def add(self, vectors) -> np.ndarray:
        rows = self._base.add(vectors)
        self._placed = False
        return rows

    def delete(self, rows) -> None:
        self._base.delete(rows)
        self._placed = False

    def _place(self) -> None:
        if self._placed:
            return
        cents, x, ids, bias = self._base.arrays()
        if x is None:
            raise IndexNotBuilt("nothing added to the sharded IVF-PQ index")
        sh2 = NamedSharding(self.mesh, P(self.axis, None))
        sh3 = NamedSharding(self.mesh, P(self.axis, None, None))
        rep = NamedSharding(self.mesh, P())
        self._centroids = jax.device_put(cents, sh2)
        self._x = jax.device_put(x, sh3)
        self._ids = jax.device_put(ids, sh2)
        self._bias = jax.device_put(bias, sh2)
        self._books = jax.device_put(self._base._books, rep)
        if self._base.refine == "int8_device" and self._base._dev_chunks:
            # bank shards by GLOBAL ROW RANGE (pad rows to the mesh),
            # orthogonal to the cell sharding above — see
            # sharded_ivfpq_search_refined
            bank, scales = self._base._dev_bank()
            S = self.mesh.shape[self.axis]
            pad = (-bank.shape[0]) % S
            if pad:
                bank = jnp.concatenate(
                    [bank, jnp.zeros((pad, bank.shape[1]), bank.dtype)])
                scales = jnp.concatenate(
                    [scales, jnp.ones((pad, 1), scales.dtype)])
            self._bank = jax.device_put(bank, sh2)
            self._scales = jax.device_put(scales, sh2)
        self._placed = True

    def search(
        self, queries: np.ndarray, k: int, nprobe: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._base.n_rows == 0:
            B = np.asarray(queries).shape[0]
            return (np.full((B, k), float(NEG_INF), np.float32),
                    np.full((B, k), -1, np.int32))
        self._place()
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, q.shape[1])
        if self._base.metric == "cosine":
            norms = np.linalg.norm(q, axis=1, keepdims=True)
            q = np.divide(q, norms, out=q.copy(), where=norms > 1e-12)
        base = self._base
        if base._rot is not None:
            # OPQ: the placed centroids/codes live in the rotated index
            # space (index/ivfpq.py train folds the rotation); queries
            # must enter it too (rotation preserves norms, so after the
            # cosine normalize is fine)
            q = np.asarray(q @ np.asarray(base._rot), np.float32)
        n_shards = self.mesh.shape[self.axis]
        np_eff = min(nprobe or self.nprobe,
                     self._base.nlist // n_shards)
        use_dev = base.refine == "int8_device" and bool(base._dev_chunks)
        use_host = base.refine in ("int8", "f32") and bool(base._raw_chunks)
        k_fetch = max(k, min(k * base.refine_factor,
                             base.list_cap * np_eff)) \
            if (use_dev or use_host) else k
        if use_dev:
            s, i = sharded_ivfpq_search_refined(
                jnp.asarray(q), self._centroids, self._x, self._ids,
                self._bias, self._books, self._bank, self._scales,
                k, k_fetch, np_eff, self.mesh, self.axis,
            )
            s_np, i_np = np.asarray(s), np.asarray(i)
            return s_np, np.where(s_np <= float(NEG_INF) / 2, -1, i_np)
        s, i = sharded_ivfpq_search(
            jnp.asarray(q), self._centroids, self._x, self._ids, self._bias,
            self._books, k_fetch, np_eff, self.mesh, self.axis,
        )
        s_np, i_np = np.asarray(s), np.asarray(i)
        i_np = np.where(s_np <= float(NEG_INF) / 2, -1, i_np)
        if not use_host:
            return s_np, i_np
        return base._refine_host(q, s_np, i_np, k)

    def stats(self) -> dict:
        st = self._base.stats()
        st["shards"] = self.mesh.shape[self.axis]
        return st

    def __len__(self) -> int:
        return len(self._base)


__all__ = [
    "ShardedIVFPQIndex",
    "sharded_ivfpq_search",
    "sharded_ivfpq_search_refined",
]
