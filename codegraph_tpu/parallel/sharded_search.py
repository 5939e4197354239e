"""Multi-chip sharded search: per-shard top-k + k-way merge over ICI.

BASELINE config 5: a 10M x 768-d corpus sharded row-wise over a v5e-8
mesh. The TPU-native answer to corpus scale (the reference's only scaling
story is a bigger SurrealDB instance): the embedding matrix shards over a
1-D mesh axis, every chip scans only its rows with the streaming top-k
kernel, and the [n_shards, B, k] candidate sets merge with one
`all_gather` of (score, id) pairs over ICI followed by a replicated
final top-k — gathered bytes are n_shards*B*k*8, vastly smaller than any
score matrix, so merge latency stays far below scan time (SURVEY.md
section 7 "cross-shard merge latency").
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
    # the new jax.shard_map cannot statically prove the post-all_gather
    # merge is replicated (no invariant cast primitive yet); the
    # experimental API with check_rep=False expresses exactly that.
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from codegraph_tpu.core.errors import DimensionMismatch
from codegraph_tpu.core.padding import round_up
from codegraph_tpu.ops.topk import NEG_INF, streaming_topk


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "axis", "tile_n")
)
def sharded_topk(
    q: jax.Array,      # [B, D] replicated
    x: jax.Array,      # [N_pad, D] sharded over `axis` (N_pad % n_shards == 0)
    bias: jax.Array,   # [N_pad] sharded over `axis`
    k: int,
    mesh: Mesh,
    axis: str = "data",
    tile_n: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores [B, k], global row ids [B, k]), replicated."""
    n_shards = mesh.shape[axis]
    n_shard_rows = x.shape[0] // n_shards

    def _per_shard(qs, xs, bs):
        s, i = streaming_topk(qs, xs, bs, k, tile_n=tile_n)
        shard = jax.lax.axis_index(axis)
        gi = jnp.where(i >= 0, i + shard * n_shard_rows, -1)
        all_s = jax.lax.all_gather(s, axis)   # [n_shards, B, k] over ICI
        all_i = jax.lax.all_gather(gi, axis)
        B = qs.shape[0]
        cs = jnp.transpose(all_s, (1, 0, 2)).reshape(B, n_shards * k)
        ci = jnp.transpose(all_i, (1, 0, 2)).reshape(B, n_shards * k)
        top_s, pos = jax.lax.top_k(cs, k)
        return top_s, jnp.take_along_axis(ci, pos, axis=-1)

    specs_in = (P(None, None), P(axis, None), P(axis))
    specs_out = (P(None, None), P(None, None))
    return shard_map(
        _per_shard, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
        check_rep=False,
    )(q, x, bias)


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "q_axis", "data_axis", "tile_n")
)
def sharded_topk_2d(
    q: jax.Array,      # [B, D] sharded over `q_axis` (B % q_shards == 0)
    x: jax.Array,      # [N_pad, D] sharded over `data_axis`
    bias: jax.Array,   # [N_pad] sharded over `data_axis`
    k: int,
    mesh: Mesh,
    q_axis: str = "q",
    data_axis: str = "data",
    tile_n: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """2-D sharded search: queries split over one mesh axis, corpus rows
    over the other — the (q_shards x data_shards) grid scales throughput
    and capacity INDEPENDENTLY. Each device scans its corpus shard for
    its query shard; the k-way merge all_gathers only along `data_axis`
    (each query row merges within its own q-shard ring), so ICI traffic
    per device is data_shards*B_local*k*8 bytes. Returns (scores, ids)
    sharded over q_axis — callers under jit keep them sharded; np.asarray
    assembles transparently.
    """
    n_data = mesh.shape[data_axis]
    n_shard_rows = x.shape[0] // n_data

    def _per_device(qs, xs, bs):
        s, i = streaming_topk(qs, xs, bs, k, tile_n=tile_n)
        shard = jax.lax.axis_index(data_axis)
        gi = jnp.where(i >= 0, i + shard * n_shard_rows, -1)
        all_s = jax.lax.all_gather(s, data_axis)   # [n_data, B_local, k]
        all_i = jax.lax.all_gather(gi, data_axis)
        Bl = qs.shape[0]
        cs = jnp.transpose(all_s, (1, 0, 2)).reshape(Bl, n_data * k)
        ci = jnp.transpose(all_i, (1, 0, 2)).reshape(Bl, n_data * k)
        top_s, pos = jax.lax.top_k(cs, k)
        return top_s, jnp.take_along_axis(ci, pos, axis=-1)

    return shard_map(
        _per_device, mesh=mesh,
        in_specs=(P(q_axis, None), P(data_axis, None), P(data_axis)),
        out_specs=(P(q_axis, None), P(q_axis, None)),
        check_rep=False,
    )(q, x, bias)


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "ici_axis", "dcn_axis", "tile_n")
)
def sharded_topk_hier(
    q: jax.Array,      # [B, D] replicated
    x: jax.Array,      # [N_pad, D] sharded over (dcn_axis, ici_axis)
    bias: jax.Array,   # [N_pad] sharded likewise
    k: int,
    mesh: Mesh,
    ici_axis: str = "ici",
    dcn_axis: str = "dcn",
    tile_n: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-host layout: hierarchical k-way merge, ICI first then DCN.

    On a multi-host slice the mesh factors into (dcn_axis=hosts,
    ici_axis=chips-per-host); corpus rows shard over BOTH (each host
    island owns a contiguous super-shard, split again over its chips).
    The merge runs in two levels: all_gather over ici_axis (fast
    intra-host interconnect) reduces each island to one [B, k]
    candidate set, then ONE all_gather of those k-sized sets crosses the
    slow DCN — per-host DCN traffic is hosts*B*k*8 bytes total,
    independent of chips-per-host, instead of the flat merge's
    (hosts*chips)*B*k*8. Build the mesh with
    mesh_utils.create_hybrid_device_mesh((chips,), (hosts,)) in real
    multi-host runs; functionally identical to 1-D sharded_topk over the
    flattened axes (tests verify exactness on a virtual (2, 4) mesh).
    """
    n_ici = mesh.shape[ici_axis]
    n_dcn = mesh.shape[dcn_axis]
    n_shard_rows = x.shape[0] // (n_ici * n_dcn)

    def _per_device(qs, xs, bs):
        s, i = streaming_topk(qs, xs, bs, k, tile_n=tile_n)
        # global row id: host island major, chip minor (matches the
        # P(dcn, ici)-flattened row order of the input sharding)
        host = jax.lax.axis_index(dcn_axis)
        chip = jax.lax.axis_index(ici_axis)
        shard = host * n_ici + chip
        gi = jnp.where(i >= 0, i + shard * n_shard_rows, -1)
        B = qs.shape[0]

        def merge(all_s, all_i, n):
            cs = jnp.transpose(all_s, (1, 0, 2)).reshape(B, n * k)
            ci = jnp.transpose(all_i, (1, 0, 2)).reshape(B, n * k)
            top_s, pos = jax.lax.top_k(cs, k)
            return top_s, jnp.take_along_axis(ci, pos, axis=-1)

        # level 1: intra-island merge over ICI
        s, gi = merge(jax.lax.all_gather(s, ici_axis),
                      jax.lax.all_gather(gi, ici_axis), n_ici)
        # level 2: one k-sized hop per island over DCN
        return merge(jax.lax.all_gather(s, dcn_axis),
                     jax.lax.all_gather(gi, dcn_axis), n_dcn)

    # rows shard over the combined (dcn, ici) axes
    return shard_map(
        _per_device, mesh=mesh,
        in_specs=(P(None, None), P((dcn_axis, ici_axis), None),
                  P((dcn_axis, ici_axis))),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )(q, x, bias)


class ShardedFlatIndex:
    """Flat exact index sharded row-wise over a 1-D mesh axis.

    Rows pad up to a multiple of n_shards * tile_n so each shard scans an
    identical static shape. Tombstone deletes via the sharded bias vector.
    """

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        axis: str = "data",
        metric: str = "cosine",
        dtype: str = "float32",
        tile_n: int = 1024,
    ):
        self.dim = int(dim)
        self.mesh = mesh
        self.axis = axis
        self.metric = metric
        self.dtype = jnp.dtype(dtype)
        self.tile_n = int(tile_n)
        self.n_shards = mesh.shape[axis]
        self.n_rows = 0
        self.n_live = 0
        self.capacity = 0
        self._x: Optional[jax.Array] = None
        self._bias: Optional[jax.Array] = None
        self._x_sharding = NamedSharding(mesh, P(axis, None))
        self._b_sharding = NamedSharding(mesh, P(axis))
        self._q_sharding = NamedSharding(mesh, P(None, None))

    def _prepare(self, vectors: np.ndarray) -> np.ndarray:
        v = np.asarray(vectors, np.float32)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, v.shape[1] if v.ndim == 2 else -1)
        if self.metric == "cosine":
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            v = np.divide(v, norms, out=v.copy(), where=norms > 1e-12)
        return v

    def build(self, vectors: np.ndarray) -> np.ndarray:
        """Place the full corpus sharded across the mesh. Returns row ids."""
        v = self._prepare(vectors)
        n = v.shape[0]
        cap = round_up(max(n, 1), self.n_shards * self.tile_n)
        x = np.zeros((cap, self.dim), np.float32)
        x[:n] = v
        bias = np.full((cap,), NEG_INF, np.float32)
        bias[:n] = 0.0
        self._x = jax.device_put(x.astype(self.dtype), self._x_sharding)
        self._bias = jax.device_put(bias, self._b_sharding)
        self.capacity = cap
        self.n_rows = n
        self.n_live = n
        return np.arange(n, dtype=np.int64)

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Append rows. Round 1 semantics: re-place the sharded arrays
        (host round-trip); the segmented delta model (SURVEY.md section 7
        step 8) will stage adds in an unsharded tail segment."""
        v = self._prepare(vectors)
        n = v.shape[0]
        if self._x is None:
            return self.build(vectors)
        x_host = np.array(self._x, np.float32)  # copy: device views are RO
        b_host = np.array(self._bias)
        rows = np.arange(self.n_rows, self.n_rows + n, dtype=np.int64)
        need = self.n_rows + n
        if need > self.capacity:
            cap = round_up(max(need, int(self.capacity * 1.5)),
                           self.n_shards * self.tile_n)
            x_new = np.zeros((cap, self.dim), np.float32)
            x_new[: self.n_rows] = x_host[: self.n_rows]
            b_new = np.full((cap,), NEG_INF, np.float32)
            b_new[: self.n_rows] = b_host[: self.n_rows]
            x_host, b_host = x_new, b_new
            self.capacity = cap
        x_host[self.n_rows : need] = v
        b_host[self.n_rows : need] = 0.0
        self._x = jax.device_put(x_host.astype(self.dtype), self._x_sharding)
        self._bias = jax.device_put(b_host, self._b_sharding)
        self.n_rows = need
        self.n_live += n
        return rows

    def delete(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, np.int64)
        if rows.size == 0:
            return
        b_host = np.asarray(self._bias).copy()
        b_host[rows] = NEG_INF
        self._bias = jax.device_put(b_host, self._b_sharding)
        self.n_live -= int(rows.size)

    def search(self, queries: np.ndarray, k: int,
               extra_bias=None) -> Tuple[np.ndarray, np.ndarray]:
        if self._x is None or self.n_rows == 0:
            B = np.asarray(queries).shape[0]
            return (
                np.full((B, k), float(NEG_INF), np.float32),
                np.full((B, k), -1, np.int32),
            )
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, q.shape[1])
        if self.metric == "cosine":
            norms = np.linalg.norm(q, axis=1, keepdims=True)
            q = np.divide(q, norms, out=q.copy(), where=norms > 1e-12)
        k_eff = min(k, self.capacity // self.n_shards)
        qd = jax.device_put(jnp.asarray(q), self._q_sharding)
        bias = self._bias
        if extra_bias is not None:
            # SearchFilters device mask (combine_bias semantics), laid
            # out with the corpus sharding so the add stays shard-local
            eb = np.zeros((self.capacity,), np.float32)
            n = min(len(extra_bias), self.capacity)
            eb[:n] = np.asarray(extra_bias, np.float32)[:n]
            bias = self._bias + jax.device_put(
                jnp.asarray(eb), self._b_sharding
            )
        s, i = sharded_topk(
            qd, self._x, bias, k_eff, self.mesh, self.axis,
            tile_n=min(self.tile_n, self.capacity // self.n_shards),
        )
        s_np, i_np = np.asarray(s), np.asarray(i)
        dead = s_np <= float(NEG_INF) / 2
        i_np = np.where(dead, -1, i_np)
        if k_eff < k:
            s_np = np.pad(s_np, ((0, 0), (0, k - k_eff)),
                          constant_values=float(NEG_INF))
            i_np = np.pad(i_np, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return s_np, i_np

    def __len__(self) -> int:
        return self.n_live


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "axis", "tile_n")
)
def sharded_topk_int8(
    qv: jax.Array,     # [B, D] int8 replicated
    qs: jax.Array,     # [B] f32 replicated
    xv: jax.Array,     # [N_pad, D] int8 sharded over `axis`
    xs: jax.Array,     # [N_pad] f32 sharded
    bias: jax.Array,   # [N_pad] f32 sharded
    k: int,
    mesh: Mesh,
    axis: str = "data",
    tile_n: int = 2048,
) -> Tuple[jax.Array, jax.Array]:
    """int8 per-shard scan + all_gather k-way merge (configs 2 x 5)."""
    from codegraph_tpu.ops.quantize import streaming_topk_int8

    n_shards = mesh.shape[axis]
    n_shard_rows = xv.shape[0] // n_shards

    def _per_shard(qv_, qs_, xv_, xs_, b_):
        s, i = streaming_topk_int8(qv_, qs_, xv_, xs_, b_, k, tile_n=tile_n)
        shard = jax.lax.axis_index(axis)
        gi = jnp.where(i >= 0, i + shard * n_shard_rows, -1)
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(gi, axis)
        B = qv_.shape[0]
        cs = jnp.transpose(all_s, (1, 0, 2)).reshape(B, n_shards * k)
        ci = jnp.transpose(all_i, (1, 0, 2)).reshape(B, n_shards * k)
        top_s, pos = jax.lax.top_k(cs, k)
        return top_s, jnp.take_along_axis(ci, pos, axis=-1)

    specs_in = (P(None, None), P(None), P(axis, None), P(axis), P(axis))
    specs_out = (P(None, None), P(None, None))
    return shard_map(
        _per_shard, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
        check_rep=False,
    )(qv, qs, xv, xs, bias)


class ShardedInt8Index:
    """int8-quantized corpus sharded row-wise + host-side f32 rescore.

    Configs 2 x 5: per-shard int8 MXU scan (4x the rows/s of f32 at
    equal HBM bandwidth), ICI k-way merge for the candidate set, then an
    exact f32 rescore of the top `rescore_k` — candidates are few
    (B x 100 rows), so the rescore gather runs host-side from the
    retained f32 copy rather than a cross-shard device gather.
    """

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        axis: str = "data",
        metric: str = "cosine",
        rescore_k: int = 100,
        tile_n: int = 2048,
    ):
        self.dim = int(dim)
        self.mesh = mesh
        self.axis = axis
        self.metric = metric
        self.rescore_k = int(rescore_k)
        self.tile_n = int(tile_n)
        self.n_shards = mesh.shape[axis]
        self.n_rows = 0
        self.n_live = 0
        self.capacity = 0
        self._qv = self._qs = self._bias = None
        self._host_f32: Optional[np.ndarray] = None  # rescore copy
        self._x_sh = NamedSharding(mesh, P(axis, None))
        self._v_sh = NamedSharding(mesh, P(axis))
        self._rep = NamedSharding(mesh, P())

    def build(self, vectors: np.ndarray) -> np.ndarray:
        from codegraph_tpu.ops.quantize import quantize_rows

        v = np.asarray(vectors, np.float32)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, v.shape[1] if v.ndim == 2 else -1)
        if self.metric == "cosine":
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            v = np.divide(v, norms, out=v.copy(), where=norms > 1e-12)
        n = v.shape[0]
        cap = round_up(max(n, 1), self.n_shards * self.tile_n)
        full = np.zeros((cap, self.dim), np.float32)
        full[:n] = v
        qv, qs = quantize_rows(jnp.asarray(full))
        bias = np.full((cap,), NEG_INF, np.float32)
        bias[:n] = 0.0
        self._qv = jax.device_put(qv, self._x_sh)
        self._qs = jax.device_put(qs, self._v_sh)
        self._bias = jax.device_put(jnp.asarray(bias), self._v_sh)
        self._host_f32 = full
        self.capacity = cap
        self.n_rows = n
        self.n_live = n
        return np.arange(n, dtype=np.int64)

    def delete(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, np.int64)
        if rows.size == 0:
            return
        b = np.array(self._bias)
        b[rows] = NEG_INF
        self._bias = jax.device_put(jnp.asarray(b), self._v_sh)
        self.n_live -= int(rows.size)

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        from codegraph_tpu.ops.quantize import quantize_rows

        if self._qv is None or self.n_rows == 0:
            B = np.asarray(queries).shape[0]
            return (np.full((B, k), float(NEG_INF), np.float32),
                    np.full((B, k), -1, np.int32))
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.metric == "cosine":
            norms = np.linalg.norm(q, axis=1, keepdims=True)
            q = np.divide(q, norms, out=q.copy(), where=norms > 1e-12)
        cand_k = min(max(k, self.rescore_k), self.capacity // self.n_shards)
        qv, qs = quantize_rows(jnp.asarray(q))
        qv = jax.device_put(qv, self._rep)
        qs = jax.device_put(qs, self._rep)
        s, i = sharded_topk_int8(
            qv, qs, self._qv, self._qs, self._bias, cand_k,
            self.mesh, self.axis,
            tile_n=min(self.tile_n, self.capacity // self.n_shards),
        )
        s_np, i_np = np.asarray(s), np.asarray(i)
        # exact f32 rescore host-side over the small candidate set
        safe = np.maximum(i_np, 0)
        cand_vecs = self._host_f32[safe]                 # [B, C, D]
        exact = np.einsum("bd,bcd->bc", q, cand_vecs)
        exact = np.where(i_np >= 0, exact, float(NEG_INF))
        order = np.argsort(-exact, axis=1)[:, :k]
        out_s = np.take_along_axis(exact, order, axis=1).astype(np.float32)
        out_i = np.take_along_axis(i_np, order, axis=1)
        out_i = np.where(out_s <= float(NEG_INF) / 2, -1, out_i)
        return out_s, out_i

    def __len__(self) -> int:
        return self.n_live


__all__ = [
    "ShardedFlatIndex",
    "ShardedInt8Index",
    "sharded_topk",
    "sharded_topk_2d",
    "sharded_topk_hier",
    "sharded_topk_int8",
]
