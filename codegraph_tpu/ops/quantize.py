"""int8 quantization for the flat-scan hot path (BASELINE config 2).

TPU-native re-design of the reference's quantizers
(crates/codegraph-vector/src/persistent.rs:331-479 ScalarQuantizer per-dim
min/max; src/optimization.rs:153-503 ModelOptimizer scale/zero-point int8):
on TPU the right layout is *per-row symmetric* int8, because then

    score[b, n] = t[b] * s[n] * (v[b] . u[n])

where `v . u` is an int8 x int8 -> int32 MXU matmul and the scales apply as
a rank-1 outer product on the int32 tile — one fused multiply on the VPU.
Per-dim (asymmetric) scales would break the pure-int8 contraction and fall
off the MXU fast path. Recall is recovered by the f32/bf16 rescore of the
top candidates (config 2), exactly like the reference's rescore stage
(search.rs:118-127 per-id cosine rescoring).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


def quantize_rows(x: jax.Array, eps: float = 1e-12) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization.

    x: [N, D] float. Returns (q [N, D] int8, scales [N] f32) with
    x ~= scales[:, None] * q. Zero rows get scale 0.
    """
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1)  # [N]
    scales = absmax / INT8_MAX
    inv = jnp.where(scales > eps, 1.0 / jnp.maximum(scales, eps), 0.0)
    q = jnp.clip(jnp.round(x * inv[:, None]), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scales


def dequantize_rows(q: jax.Array, scales: jax.Array) -> jax.Array:
    """Inverse of quantize_rows: [N, D] int8 + [N] f32 -> [N, D] f32."""
    return q.astype(jnp.float32) * scales[:, None]


def int8_scores(
    qv: jax.Array, qs: jax.Array, xv: jax.Array, xs: jax.Array
) -> jax.Array:
    """Scaled int8 score tile: [B, D]i8 x [N, D]i8 -> [B, N]f32.

    The contraction runs int8 x int8 -> int32 on the MXU; the per-row
    scales fold in as a rank-1 outer product.
    """
    raw = jax.lax.dot_general(
        qv,
        xv,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return raw.astype(jnp.float32) * qs[:, None] * xs[None, :]


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def streaming_topk_int8(
    qv: jax.Array,
    qs: jax.Array,
    xv: jax.Array,
    xs: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = 2048,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming top-k over an int8 corpus (XLA scan over N tiles).

    qv/qs: quantized queries [B, D] int8 + scales [B]
    xv/xs: quantized corpus [N_pad, D] int8 + scales [N_pad]
    bias:  [N_pad] f32, 0=live / NEG_INF=dead
    Returns (scores [B, k] f32, ids [B, k] i32).
    """
    from codegraph_tpu.ops.topk import NEG_INF, merge_topk

    B, D = qv.shape
    N = xv.shape[0]
    assert N % tile_n == 0, f"N_pad={N} must be a multiple of tile_n={tile_n}"
    n_tiles = N // tile_n

    x_tiles = xv.reshape(n_tiles, tile_n, D)
    s_tiles = xs.reshape(n_tiles, tile_n)
    b_tiles = bias.reshape(n_tiles, tile_n)

    def step(carry, inp):
        top_s, top_i = carry
        xt, st, bt, base = inp
        s = int8_scores(qv, qs, xt, st) + bt[None, :]
        ids = base + jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
        return merge_topk(top_s, top_i, s, ids, k), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile_n
    (top_s, top_i), _ = jax.lax.scan(step, init, (x_tiles, s_tiles, b_tiles, bases))
    return top_s, top_i


# ---------------------------------------------------------------------------
# Pallas fused int8 kernel
# ---------------------------------------------------------------------------


def _int8_topk_kernel(
    qv_ref, qs_ref, xv_ref, xs_ref, bias_ref, out_s_ref, out_i_ref,
    acc_s, acc_i, *, k: int, k_pad: int, tile_n: int
):
    import jax.experimental.pallas as pl

    from codegraph_tpu.ops.topk import NEG_INF, _lane_merge

    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, -1)

    raw = jax.lax.dot_general(
        qv_ref[:], xv_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # int8 x int8 -> int32 on the MXU
    s = raw.astype(jnp.float32) * qs_ref[:] * xs_ref[:] + bias_ref[:]

    new_s, new_i = _lane_merge(
        s, j * tile_n, acc_s[:], acc_i[:], k, k_pad
    )
    acc_s[:] = new_s
    acc_i[:] = new_i

    @pl.when(j == n_j - 1)
    def _():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "tile_b", "interpret")
)
def streaming_topk_int8_pallas(
    qv: jax.Array,
    qs: jax.Array,
    xv: jax.Array,
    xs: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = 2048,
    tile_b: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused int8 matmul + streaming top-k (the config-2 hot kernel).

    Same contract as streaming_topk_int8; int8 corpus tiles halve the HBM
    traffic of bf16 and quadruple f32, so the scan runs ~4x the rows/s of
    the f32 flat kernel at equal bandwidth.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from codegraph_tpu.ops.topk import LANE, _round_up

    B, D = qv.shape
    N = xv.shape[0]
    assert N % tile_n == 0 and B % tile_b == 0
    k_pad = _round_up(max(k, 1), LANE)
    grid = (B // tile_b, N // tile_n)
    kernel = functools.partial(
        _int8_topk_kernel, k=k, k_pad=k_pad, tile_n=tile_n
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, k_pad), jnp.float32),
            pltpu.VMEM((tile_b, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=B * D + N * D + N * 8 + 2 * B * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qv, qs.reshape(B, 1), xv, xs.reshape(1, N), bias.reshape(1, N))
    return out_s[:, :k], out_i[:, :k]


def _int8_topk_qmajor_kernel(
    qv_ref, qs_ref, xv_ref, xs_ref, bias_ref, out_s_ref, out_i_ref,
    acc_s, acc_i, *, k: int, k_pad: int, tile_n: int, tile_b: int
):
    import jax.experimental.pallas as pl

    from codegraph_tpu.ops.topk import NEG_INF, _lane_merge

    i = pl.program_id(0)          # N tile (outer: corpus read once/call)
    j = pl.program_id(1)          # B tile (inner)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_s[pl.ds(j * tile_b, tile_b), :] = jnp.full(
            (tile_b, k_pad), NEG_INF, jnp.float32
        )
        acc_i[pl.ds(j * tile_b, tile_b), :] = jnp.full(
            (tile_b, k_pad), -1, jnp.int32
        )

    raw = jax.lax.dot_general(
        qv_ref[:], xv_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = raw.astype(jnp.float32) * qs_ref[:] * xs_ref[:] + bias_ref[:]

    row = pl.ds(j * tile_b, tile_b)
    new_s, new_i = _lane_merge(
        s, i * tile_n, acc_s[row, :], acc_i[row, :], k, k_pad
    )
    acc_s[row, :] = new_s
    acc_i[row, :] = new_i

    @pl.when(i == n_i - 1)
    def _():
        out_s_ref[:] = acc_s[row, :]
        out_i_ref[:] = acc_i[row, :]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "tile_b", "interpret")
)
def streaming_topk_int8_qmajor(
    qv: jax.Array,
    qs: jax.Array,
    xv: jax.Array,
    xs: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = 2048,
    tile_b: int = 128,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Query-major fused int8 scan: the int8 corpus streams from HBM once
    per call regardless of batch size — at 10M x 768 that is 7.5GB/call,
    the whole-corpus exact-scan configuration of the BASELINE north star
    on a single chip."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from codegraph_tpu.ops.topk import LANE, _round_up

    B, D = qv.shape
    N = xv.shape[0]
    assert N % tile_n == 0 and B % tile_b == 0
    k_pad = _round_up(max(k, 1), LANE)
    grid = (N // tile_n, B // tile_b)
    kernel = functools.partial(
        _int8_topk_qmajor_kernel, k=k, k_pad=k_pad, tile_n=tile_n,
        tile_b=tile_b,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, k_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, k_pad), jnp.float32),
            pltpu.VMEM((B, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=B * D + N * D + N * 8 + 2 * B * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qv, qs.reshape(B, 1), xv, xs.reshape(1, N), bias.reshape(1, N))
    return out_s[:, :k], out_i[:, :k]




def _int8_topk_qres_kernel(
    qv_ref, qs_ref, xv_ref, xs_ref, bias_ref, out_s_ref, out_i_ref,
    acc_s, acc_i, *, k: int, k_pad: int, tile_n: int, tile_b: int
):
    """int8 query-RESIDENT kernel: the whole [B, D] int8 batch (plus
    scales) is pinned in VMEM via constant-index blocks, so the only
    per-call HBM traffic is one int8 corpus read (see
    topk._flat_topk_qres_kernel for the floor-probe rationale)."""
    import jax.experimental.pallas as pl

    from codegraph_tpu.ops.topk import NEG_INF, _lane_merge

    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_s[pl.ds(j * tile_b, tile_b), :] = jnp.full(
            (tile_b, k_pad), NEG_INF, jnp.float32
        )
        acc_i[pl.ds(j * tile_b, tile_b), :] = jnp.full(
            (tile_b, k_pad), -1, jnp.int32
        )

    row = pl.ds(j * tile_b, tile_b)
    raw = jax.lax.dot_general(
        qv_ref[row, :], xv_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = raw.astype(jnp.float32) * qs_ref[row, :] * xs_ref[:] + bias_ref[:]

    new_s, new_i = _lane_merge(
        s, i * tile_n, acc_s[row, :], acc_i[row, :], k, k_pad
    )
    acc_s[row, :] = new_s
    acc_i[row, :] = new_i

    @pl.when(i == n_i - 1)
    def _():
        out_s_ref[:] = acc_s[row, :]
        out_i_ref[:] = acc_i[row, :]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "tile_b", "interpret")
)
def streaming_topk_int8_qres(
    qv: jax.Array,
    qs: jax.Array,
    xv: jax.Array,
    xs: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = 2048,
    tile_b: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Query-resident fused int8 scan: one int8 corpus read per call,
    queries pinned in VMEM. Same contract as streaming_topk_int8_qmajor."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from codegraph_tpu.ops.topk import LANE, _round_up

    B, D = qv.shape
    N = xv.shape[0]
    assert N % tile_n == 0 and B % tile_b == 0
    k_pad = _round_up(max(k, 1), LANE)
    grid = (N // tile_n, B // tile_b)
    kernel = functools.partial(
        _int8_topk_qres_kernel, k=k, k_pad=k_pad, tile_n=tile_n,
        tile_b=tile_b,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, k_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, k_pad), jnp.float32),
            pltpu.VMEM((B, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=B * D + N * D + N * 8 + 2 * B * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qv, qs.reshape(B, 1), xv, xs.reshape(1, N), bias.reshape(1, N))
    return out_s[:, :k], out_i[:, :k]


@functools.partial(jax.jit, static_argnames=("k",))
def rescore_topk(
    q: jax.Array,
    x_rescore: jax.Array,
    cand_ids: jax.Array,
    cand_scores: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """f32 rescore of quantized-scan candidates (config 2 stage 2).

    q: [B, D] f32 queries; x_rescore: [cap, D] high-precision corpus;
    cand_ids/cand_scores: [B, C] from the int8 scan (ids may be -1).
    Gathers candidate rows, recomputes exact dot scores, returns top-k.
    Mirrors the reference's per-candidate cosine rescore
    (crates/codegraph-vector/src/search.rs:118-127).
    """
    from codegraph_tpu.ops.topk import NEG_INF

    safe_ids = jnp.maximum(cand_ids, 0)
    rows = jnp.take(x_rescore, safe_ids, axis=0).astype(jnp.float32)  # [B, C, D]
    exact = jnp.einsum("bd,bcd->bc", q.astype(jnp.float32), rows)
    exact = jnp.where(cand_ids >= 0, exact, NEG_INF)
    top_s, pos = jax.lax.top_k(exact, k)
    top_i = jnp.take_along_axis(cand_ids, pos, axis=-1)
    return top_s, top_i


__all__ = [
    "streaming_topk_int8_qmajor",
    "streaming_topk_int8_qres",
    "INT8_MAX",
    "quantize_rows",
    "dequantize_rows",
    "int8_scores",
    "streaming_topk_int8",
    "rescore_topk",
]
