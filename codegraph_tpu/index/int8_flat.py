"""int8 scalar-quantized flat index with high-precision rescore.

BASELINE config 2: int8 flat scan + f32 rescore of the top-100 candidates.
TPU-native re-design of the reference's quantized store
(crates/codegraph-vector/src/persistent.rs:331-479 ScalarQuantizer +
src/optimization.rs:153-503 int8 ModelOptimizer): the corpus lives in HBM
as a [cap, D] int8 matrix + per-row scales (4x the rows per GB/s of HBM
bandwidth vs f32), the scan is an int8xint8->int32 MXU matmul, and recall
is recovered by rescoring the top `rescore_k` candidates against a
bf16/f32 copy (the reference's per-id cosine rescore, search.rs:118-127).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codegraph_tpu.core.errors import DimensionMismatch
from codegraph_tpu.core.padding import aligned_rows, grow_capacity
from codegraph_tpu.ops.similarity import l2_normalize
from codegraph_tpu.ops.topk import NEG_INF
from codegraph_tpu.ops.quantize import (
    quantize_rows,
    rescore_topk,
    streaming_topk_int8,
    streaming_topk_int8_pallas,
    streaming_topk_int8_qmajor,
)

DEFAULT_TILE_N = 2048
_PALLAS_TILE_B = 32


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _flat_write(q, s, bias, qv, qs, off):
    """Donated row-block write into the quantized bank. Donation lets
    XLA update the [cap, D] int8 matrix in place; an eager
    dynamic_update_slice holds old+new banks at once — a 2x8GB
    transient at 10M x 768 that cannot fit a 16GB v5e next to the
    rest of the index (same fix as ivfpq._bank_write)."""
    return (
        jax.lax.dynamic_update_slice(q, qv, (off, 0)),
        jax.lax.dynamic_update_slice(s, qs, (off,)),
        jax.lax.dynamic_update_slice(
            bias, jnp.zeros(qs.shape, jnp.float32), (off,)),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _flat_write_rescore(r, v, off):
    """Donated write of the high-precision rescore copy."""
    return jax.lax.dynamic_update_slice(r, v, (off, 0))


class Int8FlatIndex:
    """Exact-scan index over an int8-quantized HBM-resident matrix.

    rescore_dtype: "float32" | "bfloat16" | None. When set, a second
    [cap, D] matrix in that dtype is kept for the rescore stage; None
    skips rescoring (pure int8 ranking).
    """

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        rescore_dtype: Optional[str] = "bfloat16",
        rescore_k: int = 100,
        tile_n: int = DEFAULT_TILE_N,
    ):
        if metric not in ("cosine", "dot"):
            raise ValueError(f"unknown metric {metric!r}")
        self.dim = int(dim)
        self.metric = metric
        self.rescore_dtype = jnp.dtype(rescore_dtype) if rescore_dtype else None
        self.rescore_k = int(rescore_k)
        self.tile_n = int(tile_n)
        self.capacity = 0
        self.n_rows = 0
        self.n_live = 0
        self._q: Optional[jax.Array] = None  # [cap, D] int8
        self._s: Optional[jax.Array] = None  # [cap] f32 per-row scales
        self._r: Optional[jax.Array] = None  # [cap, D] rescore matrix
        self._bias: Optional[jax.Array] = None  # [cap] f32

    # -- ingest ------------------------------------------------------------

    def _prepare(self, vectors: np.ndarray) -> jax.Array:
        v = jnp.asarray(vectors)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, v.shape[1] if v.ndim == 2 else -1)
        v = v.astype(jnp.float32)
        if self.metric == "cosine":
            v = l2_normalize(v)
        return v

    def reserve(self, n_rows: int) -> None:
        """Pre-size capacity (one allocation; growth steps transiently
        hold old+new matrices — see FlatIndex.reserve)."""
        self._ensure_capacity(int(n_rows))

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        new_cap = grow_capacity(needed, self.capacity, self.tile_n, "int8")
        new_cap = aligned_rows(new_cap, "int8", self.tile_n)
        q = jnp.zeros((new_cap, self.dim), jnp.int8)
        s = jnp.zeros((new_cap,), jnp.float32)
        bias = jnp.full((new_cap,), NEG_INF, jnp.float32)
        r = (
            jnp.zeros((new_cap, self.dim), self.rescore_dtype)
            if self.rescore_dtype is not None
            else None
        )
        if self._q is not None and self.n_rows > 0:
            n = self.n_rows
            q = jax.lax.dynamic_update_slice(q, self._q[:n], (0, 0))
            s = jax.lax.dynamic_update_slice(s, self._s[:n], (0,))
            bias = jax.lax.dynamic_update_slice(bias, self._bias[:n], (0,))
            if r is not None:
                r = jax.lax.dynamic_update_slice(r, self._r[:n], (0, 0))
        self._q, self._s, self._r, self._bias = q, s, r, bias
        self.capacity = new_cap

    def add(self, vectors: np.ndarray) -> np.ndarray:
        v = self._prepare(vectors)
        n = v.shape[0]
        if n == 0:
            return np.zeros((0,), np.int64)
        self._ensure_capacity(self.n_rows + n)
        rows = np.arange(self.n_rows, self.n_rows + n, dtype=np.int64)
        qv, qs = quantize_rows(v)
        self._q, self._s, self._bias = _flat_write(
            self._q, self._s, self._bias, qv, qs, jnp.int32(self.n_rows))
        if self._r is not None:
            self._r = _flat_write_rescore(
                self._r, v.astype(self.rescore_dtype),
                jnp.int32(self.n_rows))
        self.n_rows += n
        self.n_live += n
        return rows

    def delete(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, np.int64)
        if rows.size == 0:
            return
        self._bias = self._bias.at[jnp.asarray(rows)].set(NEG_INF)
        self.n_live -= int(rows.size)

    # -- query -------------------------------------------------------------

    def _effective_bias(self, extra_bias):
        """Device-side SearchFilters mask (see core.padding.combine_bias)."""
        from codegraph_tpu.core.padding import combine_bias

        return combine_bias(self._bias, extra_bias, self.capacity)

    def search(self, queries: np.ndarray, k: int,
               extra_bias=None) -> Tuple[np.ndarray, np.ndarray]:
        """Two-stage search: int8 scan for top max(k, rescore_k) candidates,
        then high-precision rescore and truncate to k."""
        if self.n_rows == 0:
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

        cand_k = min(max(k, self.rescore_k), self.capacity)
        bias = self._effective_bias(extra_bias)
        qv, qs = quantize_rows(q)
        if jax.default_backend() in ("tpu", "axon"):
            # fused Pallas int8 kernel on real hardware; large batches use
            # the query-major grid (corpus read once per call)
            B = q.shape[0]
            qmajor = B >= _PALLAS_TILE_B
            kernel = (
                streaming_topk_int8_qmajor if qmajor
                else streaming_topk_int8_pallas
            )
            B_pad = -(-B // _PALLAS_TILE_B) * _PALLAS_TILE_B
            if B_pad != B:
                qv = jnp.pad(qv, ((0, B_pad - B), (0, 0)))
                qs = jnp.pad(qs, ((0, B_pad - B),))
            s, i = kernel(
                qv, qs, self._q, self._s, bias, cand_k,
                tile_n=min(self.tile_n, self.capacity), tile_b=_PALLAS_TILE_B,
            )
            s, i = s[:B], i[:B]
        else:
            s, i = streaming_topk_int8(
                qv, qs, self._q, self._s, bias, cand_k,
                tile_n=min(self.tile_n, self.capacity),
            )
        if self._r is not None:
            k_eff = min(k, cand_k)
            s, i = rescore_topk(q, self._r, i, s, k_eff)
        else:
            k_eff = min(k, cand_k)
            s, i = s[:, :k_eff], i[:, :k_eff]

        s_np, i_np = np.asarray(s), np.asarray(i)
        dead = s_np <= float(NEG_INF) / 2
        i_np = np.where(dead, -1, i_np)
        if k_eff < k:
            s_np = np.pad(s_np, ((0, 0), (0, k - k_eff)), constant_values=float(NEG_INF))
            i_np = np.pad(i_np, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return s_np, i_np

    # -- state -------------------------------------------------------------

    def arrays(self):
        return self._q, self._s, self._r, self._bias

    def load_arrays(self, q, s, r, bias, n_rows: int, n_live: int):
        self._q = jnp.asarray(q, jnp.int8)
        self._s = jnp.asarray(s, jnp.float32)
        self._r = jnp.asarray(r, self.rescore_dtype) if r is not None else None
        self._bias = jnp.asarray(bias, jnp.float32)
        self.capacity = int(self._q.shape[0])
        self.n_rows = int(n_rows)
        self.n_live = int(n_live)

    def __len__(self) -> int:
        return self.n_live


__all__ = ["Int8FlatIndex"]
