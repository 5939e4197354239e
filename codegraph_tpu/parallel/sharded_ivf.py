"""Sharded IVF: cells partitioned across chips, per-shard probe + merge.

Config 3 x 5: the [nlist, cap, D] cell tensor shards over its CELL axis
(cells are the natural unit — whole inverted lists stay chip-local, so a
probe never crosses ICI). Every chip scores queries against its LOCAL
centroid slice, probes its local top-nprobe cells, and the per-shard
candidates merge with the same all_gather k-way merge as the flat path.
Probing nprobe cells per shard (instead of nprobe global) means recall
at a given nprobe is >= the single-chip index; the scan cost per chip
stays nprobe * list_cap rows.
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
from codegraph_tpu.index.ivf import IVFIndex
from codegraph_tpu.ops.topk import NEG_INF, merge_topk


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "mesh", "axis"))
def sharded_ivf_search(
    q: jax.Array,          # [B, D] replicated
    centroids: jax.Array,  # [nlist, D] sharded over `axis`
    x_lists: jax.Array,    # [nlist, cap, D] sharded over `axis`
    id_lists: jax.Array,   # [nlist, cap] sharded (GLOBAL row ids)
    bias_lists: jax.Array, # [nlist, cap] sharded
    k: int,
    nprobe: int,
    mesh: Mesh,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    def _per_shard(qs, cents, xl, il, bl):
        B = qs.shape[0]
        c_scores = jax.lax.dot_general(
            qs, cents, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, nlist_local]
        local_nprobe = min(nprobe, cents.shape[0])
        _, probe_ids = jax.lax.top_k(c_scores, local_nprobe)

        def step(carry, p):
            top_s, top_i = carry
            cell = probe_ids[:, p]
            xt = jnp.take(xl, cell, axis=0)
            it = jnp.take(il, cell, axis=0)
            bt = jnp.take(bl, cell, axis=0)
            s = jnp.einsum("bd,bcd->bc", qs, xt.astype(jnp.float32),
                           preferred_element_type=jnp.float32) + bt
            return merge_topk(top_s, top_i, s, it, k), None

        init = (jnp.full((B, k), NEG_INF, jnp.float32),
                jnp.full((B, k), -1, jnp.int32))
        (s, i), _ = jax.lax.scan(step, init, jnp.arange(local_nprobe))
        # ids are already global rows; merge shards over ICI
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
                  P(axis, None), P(axis, None)),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )(q, centroids, x_lists, id_lists, bias_lists)


class ShardedIVFIndex:
    """Builds a single-chip IVFIndex, then shards its cell tensors.

    nlist must divide by the shard count; the coarse quantizer slice on
    each chip covers its local cells only, so probe selection is fully
    local and only the tiny (score, id) candidate sets cross ICI.
    """

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        axis: str = "data",
        nlist: int = 4096,
        nprobe: int = 64,
        metric: str = "cosine",
        dtype: str = "bfloat16",
        kmeans_iters: int = 10,
    ):
        self.mesh = mesh
        self.axis = axis
        n_shards = mesh.shape[axis]
        if nlist % n_shards != 0:
            nlist = ((nlist // n_shards) + 1) * n_shards
        self._base = IVFIndex(
            dim, nlist=nlist, nprobe=nprobe, metric=metric, dtype=dtype,
            kmeans_iters=kmeans_iters,
        )
        self.nprobe = min(nprobe, nlist)
        self._placed = False
        self._centroids = self._x = self._ids = self._bias = None

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
            raise IndexNotBuilt("nothing added to the sharded IVF index")
        sh2 = NamedSharding(self.mesh, P(self.axis, None))
        sh3 = NamedSharding(self.mesh, P(self.axis, None, None))
        self._centroids = jax.device_put(cents, sh2)
        self._x = jax.device_put(x, sh3)
        self._ids = jax.device_put(ids, sh2)
        self._bias = jax.device_put(bias, sh2)
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
        n_shards = self.mesh.shape[self.axis]
        np_eff = min(nprobe or self.nprobe,
                     self._base.nlist // n_shards)
        s, i = sharded_ivf_search(
            jnp.asarray(q), self._centroids, self._x, self._ids, self._bias,
            k, np_eff, self.mesh, self.axis,
        )
        s_np, i_np = np.asarray(s), np.asarray(i)
        i_np = np.where(s_np <= float(NEG_INF) / 2, -1, i_np)
        return s_np, i_np

    def stats(self) -> dict:
        return self._base.stats()

    def __len__(self) -> int:
        return len(self._base)


__all__ = ["ShardedIVFIndex", "sharded_ivf_search"]
