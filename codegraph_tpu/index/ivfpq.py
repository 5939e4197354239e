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
cells are the same capacity-bounded buckets as IVFIndex (second-choice
spill, ops/kmeans.py assign_clusters_topk).

Storage layout is SUBSPACE-MAJOR: codes live as [nlist, m, cap] uint8
(not [nlist, cap, m]). This is the layout the Pallas per-cell-DMA ADC
kernel needs: Mosaic's tpu.dynamic_gather indexes along lanes only
within one 128-lane vreg, so the ADC lookup runs as
take_along_axis(table[m, 128], codesT[m, 128], axis=1) over 128-row
column tiles of the cell — the 256-entry table is split into lo/hi
128-lane halves with a select (two gathers, exact uint8 semantics).
Probed-cell shapes stay static; the cell block streams HBM->VMEM via
the pipelined grid DMA (one cell per grid step, double-buffered).

Accuracy knobs: m (bytes/row), nbits (ksub = 2^nbits), nprobe. With
nprobe == nlist the only error left is PQ quantization of the residual.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from codegraph_tpu.core.errors import DimensionMismatch
# LANE/round_up come from the repo's single alignment utility — the
# private twins in ops.topk exist for that module's internals only
from codegraph_tpu.core.padding import LANE, round_up
from codegraph_tpu.index.ivf import IVFIndex
from codegraph_tpu.ops.kmeans import assign_clusters
from codegraph_tpu.ops.pq import pq_encode
from codegraph_tpu.ops.topk import (
    NEG_INF,
    _lane_merge_vids,
    merge_topk,
)


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivfpq_search_kernel(
    q: jax.Array,           # [B, D] f32
    centroids: jax.Array,   # [nlist, D] f32 coarse
    code_lists: jax.Array,  # [nlist, m, cap] uint8 residual codes
    id_lists: jax.Array,    # [nlist, cap] i32 (-1 pad)
    bias_lists: jax.Array,  # [nlist, cap] f32 (0 live / NEG_INF dead)
    books: jax.Array,       # [m, ksub, dsub] f32 residual codebooks
    k: int,
    nprobe: int,
) -> Tuple[jax.Array, jax.Array]:
    """XLA reference ADC path. Returns (approx scores [B, k], ids [B, k]).

    The oracle for ivfpq_search_pallas (identical scores); also the CPU
    fallback. Its per-probe [B, m, cap] gathers are the measured QPS
    bottleneck at 10M rows — the Pallas kernel replaces them on TPU."""
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

    # per-query cell gathers are the memory hot spot: [tile_b, m, cap]
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
            # ct [tb, m, cap], table_t [tb, m, ksub]:
            # adc[b, c] = sum_j table_t[b, j, ct[b, j, c]]
            adc = jnp.sum(
                jnp.take_along_axis(table_t, ct, axis=2), axis=1
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
        )).reshape(-1, code_lists.shape[2])[:B]             # [B, cap]
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


# ---------------------------------------------------------------------------
# Pallas per-cell-DMA ADC kernel (the round-2 kernel)
# ---------------------------------------------------------------------------


def _adc_cell_kernel(
    pid_ref,      # scalar-prefetch: [B*nprobe] i32 probed cell per step
    ps_ref,       # scalar-prefetch: [B*nprobe] f32 coarse q.c(cell) score
    tlo_ref,      # (1, m, 128) ADC table, codes 0..127
    thi_ref,      # (1, m, 128) ADC table, codes 128..255
    codes_ref,    # (1, m, cap) uint8 cell codes (subspace-major)
    ids_ref,      # (1, 1, cap) i32 global row ids
    bias_ref,     # (1, 1, cap) f32 live/dead bias
    out_s_ref,    # (1, 1, k_pad)
    out_i_ref,    # (1, 1, k_pad)
    acc_s,        # VMEM (1, k_pad) scratch — running top-k scores
    acc_i,        # VMEM (1, k_pad) scratch — running top-k ids
    *, k: int, k_pad: int, cap: int, nprobe: int,
):
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, -1)

    # coarse term q . c(cell): computed by stage 1's MXU matmul and
    # prefetched as an SMEM scalar (an in-kernel [1, D] reduce read vreg
    # pad lanes when D % 128 != 0 — measured wrong on-device)
    coarse = ps_ref[b * nprobe + p]

    tlo = tlo_ref[0]  # [m, 128]
    thi = thi_ref[0]

    # ADC over 128-column tiles of the cell: two lane-gathers + select.
    # tpu.dynamic_gather only indexes lanes within one 128-wide vreg, so
    # the 256-entry table is split lo/hi; both halves are gathered and
    # the high bit of the code selects. Unrolled: cap/128 is small.
    parts = []
    for t in range(cap // LANE):
        ct = codes_ref[0, :, t * LANE:(t + 1) * LANE].astype(jnp.int32)
        lo = jnp.take_along_axis(tlo, jnp.minimum(ct, LANE - 1), axis=1)
        hi = jnp.take_along_axis(thi, jnp.maximum(ct - LANE, 0), axis=1)
        val = jnp.where(ct < LANE, lo, hi)              # [m, 128]
        parts.append(jnp.sum(val, axis=0, keepdims=True))  # [1, 128]
    s = jnp.concatenate(parts, axis=1) + bias_ref[0] + coarse  # [1, cap]

    new_s, new_i = _lane_merge_vids(
        s, ids_ref[0], acc_s[:], acc_i[:], k, k_pad
    )
    acc_s[:] = new_s
    acc_i[:] = new_i

    @pl.when(p == nprobe - 1)
    def _():
        out_s_ref[0] = acc_s[:]
        out_i_ref[0] = acc_i[:]


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "interpret"))
def ivfpq_search_pallas(
    q: jax.Array,           # [B, D] f32
    centroids: jax.Array,   # [nlist, D] f32
    code_lists: jax.Array,  # [nlist, m, cap] uint8
    id_lists: jax.Array,    # [nlist, cap] i32
    bias_lists: jax.Array,  # [nlist, cap] f32
    books: jax.Array,       # [m, ksub, dsub] f32
    k: int,
    nprobe: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-cell-DMA Pallas ADC search. Scores identical to
    ivfpq_search_kernel.

    Grid (B, nprobe): the probed cell id is scalar-prefetched, so the
    pipeline DMAs exactly that cell's [m, cap] code block (plus its
    [cap] ids/bias and [D] centroid) HBM->VMEM per step, double-buffered
    against the previous step's ADC — replacing the XLA path's
    [B, m, cap] batch gathers that made per-query probing gather-bound
    (round-1 VERDICT item 2). In-kernel the table lookup rides
    tpu.dynamic_gather (lane-indexed, 128-entry windows) and the running
    top-k uses the threshold-gated insertion merge from ops/topk.py.
    """
    B, D = q.shape
    m, ksub, dsub = books.shape
    nlist, cap = id_lists.shape
    assert code_lists.shape == (nlist, m, cap)
    assert cap % LANE == 0, f"cap={cap} must be a multiple of {LANE}"
    assert ksub <= 2 * LANE

    c_scores = jax.lax.dot_general(
        q, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    probe_s, probe_ids = jax.lax.top_k(c_scores, nprobe)  # [B, nprobe]
    pid_flat = probe_ids.reshape(-1).astype(jnp.int32)    # [B*nprobe]
    ps_flat = probe_s.reshape(-1)                         # [B*nprobe] f32

    table = jnp.einsum("bmd,mkd->bmk", q.reshape(B, m, dsub), books,
                       preferred_element_type=jnp.float32)  # [B, m, ksub]
    if ksub < 2 * LANE:
        table = jnp.pad(table, ((0, 0), (0, 0), (0, 2 * LANE - ksub)))
    tlo, thi = table[:, :, :LANE], table[:, :, LANE:]

    k_pad = round_up(max(k, 1), LANE)
    kernel = functools.partial(
        _adc_cell_kernel, k=k, k_pad=k_pad, cap=cap, nprobe=nprobe,
    )
    # singleton middle axes keep every block's trailing two dims equal to
    # the array dims (the Mosaic block-shape divisibility rule)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nprobe),
        in_specs=[
            pl.BlockSpec((1, m, LANE), lambda b, p, pid, ps: (b, 0, 0)),
            pl.BlockSpec((1, m, LANE), lambda b, p, pid, ps: (b, 0, 0)),
            pl.BlockSpec(
                (1, m, cap),
                lambda b, p, pid, ps: (pid[b * nprobe + p], 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, cap),
                lambda b, p, pid, ps: (pid[b * nprobe + p], 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, cap),
                lambda b, p, pid, ps: (pid[b * nprobe + p], 0, 0),
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, k_pad), lambda b, p, pid, ps: (b, 0, 0)),
            pl.BlockSpec((1, 1, k_pad), lambda b, p, pid, ps: (b, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, k_pad), jnp.float32),
            pltpu.VMEM((1, k_pad), jnp.int32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, k_pad), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nprobe * cap * m,
            bytes_accessed=B * nprobe * (m * cap + 8 * cap + 4 * D),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        pid_flat, ps_flat, tlo, thi,
        code_lists, id_lists[:, None, :], bias_lists[:, None, :],
    )
    return out_s[:, 0, :k], out_i[:, 0, :k]


@functools.partial(jax.jit, static_argnames=("k", "tile_u"))
def ivfpq_batch_search_kernel(
    q: jax.Array,           # [B, D] f32
    probe_ids: jax.Array,   # [B, nprobe] i32 cells each query probes
    cells_u: jax.Array,     # [U_pad] i32 union of probed cells (pad = nlist)
    code_lists: jax.Array,  # [nlist, m, cap] uint8
    id_lists: jax.Array,    # [nlist, cap] i32
    bias_lists: jax.Array,  # [nlist, cap] f32
    centroids: jax.Array,   # [nlist, D] f32
    books: jax.Array,       # [m, ksub, dsub] f32
    k: int,
    tile_u: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-shared IVF-PQ search: decode each UNIQUE probed cell once
    and score it against the whole query batch on the MXU.

    The per-query ADC kernel gathers [B, m, cap] table entries per probe
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
        codes = jnp.swapaxes(
            jnp.take(code_lists, cu_safe, axis=0), 1, 2
        )                                     # [tu, cap, m]
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


# donated transposed scatter: buf [nlist, m, cap], vals [n, m]
@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter2t(buf, cells, pos, vals):
    return buf.at[cells, :, pos].set(vals)




def _filter_fetch_k(k: int, extra_bias, cap_total: int) -> int:
    """Candidate count for a FILTERED approximate search: scale the
    over-fetch by the filter's selectivity (allowed fraction) so a 2%
    filter over-fetches ~50x, not a fixed 4x that would leave filtered
    queries nearly empty. Bounded by the probed capacity."""
    eb = np.asarray(extra_bias, np.float32)
    allowed = float(np.mean(eb > float(NEG_INF) / 2)) if eb.size else 1.0
    mult = min(64.0, 2.0 / max(allowed, 1.0 / 64.0))
    return int(min(cap_total, max(4 * k, round(k * mult))))


def _apply_extra_bias_post(s_np, i_np, extra_bias):
    """Drop candidates the filter mask excludes (post-scan, host)."""
    eb = np.asarray(extra_bias, np.float32)
    safe = np.minimum(np.maximum(i_np, 0), eb.shape[0] - 1)
    excl = (i_np >= 0) & (i_np < eb.shape[0]) \
        & (eb[safe] <= float(NEG_INF) / 2)
    return (np.where(excl, float(NEG_INF), s_np),
            np.where(excl, -1, i_np))


def _truncate_topk(s_np, i_np, k: int):
    order = np.argsort(-s_np, axis=1)[:, :k]
    return (np.take_along_axis(s_np, order, axis=1),
            np.take_along_axis(i_np, order, axis=1))


@jax.jit
def _quantize_rows_device(v: jax.Array):
    """Per-row symmetric int8 on device: (int8 [n, D], f32 scales [n, 1]).
    Stays device-resident — the whole point of refine="int8_device" is
    that rows never visit the host."""
    scale = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True),
                        1e-12) / 127.0
    q8 = jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int8)
    return q8, scale.astype(jnp.float32)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _bank_write(bank, scales, q8, sc, off):
    """In-place (donated) write of a row block into the preallocated
    refine bank at dynamic offset `off`. Donation lets XLA reuse the
    bank buffer: without it every chunked add would allocate a second
    full-size bank (2x7.7GB transient at 10M x 768)."""
    return (
        jax.lax.dynamic_update_slice(bank, q8, (off, 0)),
        jax.lax.dynamic_update_slice(scales, sc, (off, 0)),
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _refine_device_kernel(q, raw, scales, s_cand, i_cand, k: int):
    """Exact on-device rescore of PQ candidates: gather int8 rows by
    global id, dequantize, f32 dot, re-top-k. [B, R, D] gather traffic
    = B*R*D bytes (126 MB at B=1024, R=40, D=768) — tiny next to a scan."""
    safe = jnp.maximum(i_cand, 0)                        # [B, R]
    rows = jnp.take(raw, safe, axis=0).astype(jnp.float32)   # [B, R, D]
    sc = jnp.take(scales[:, 0], safe, axis=0)            # [B, R]
    exact = jnp.einsum("bd,brd->br", q, rows,
                       preferred_element_type=jnp.float32) * sc
    exact = jnp.where(i_cand >= 0, exact, NEG_INF)
    s_top, pos = jax.lax.top_k(exact, k)
    return s_top, jnp.take_along_axis(i_cand, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile_c"))
def _refine_device_tiled(q, raw, scales, s_cand, i_cand, k: int,
                         tile_c: int = 128):
    """_refine_device_kernel with the candidate axis tiled: the f32
    dequantized gather peaks at [B, tile_c, D] (100 MB at B=256, D=768)
    instead of [B, R, D] (755 MB at the rf=96 operating-point fetch of
    R=960) — the big-refine-factor configs the r5 sweep needs."""
    B, R = i_cand.shape
    Rp = -(-R // tile_c) * tile_c
    i_p = jnp.pad(i_cand, ((0, 0), (0, Rp - R)), constant_values=-1)
    tiles = jnp.transpose(i_p.reshape(B, Rp // tile_c, tile_c), (1, 0, 2))

    def tile_fn(it):                                     # [B, tile_c]
        safe = jnp.maximum(it, 0)
        rows = jnp.take(raw, safe, axis=0).astype(jnp.float32)
        sc = jnp.take(scales[:, 0], safe, axis=0)
        ex = jnp.einsum("bd,bcd->bc", q, rows,
                        preferred_element_type=jnp.float32) * sc
        return jnp.where(it >= 0, ex, NEG_INF)

    ex = jax.lax.map(tile_fn, tiles)                     # [T, B, tile_c]
    exact = jnp.transpose(ex, (1, 0, 2)).reshape(B, Rp)[:, :R]
    s_top, pos = jax.lax.top_k(exact, k)
    return s_top, jnp.take_along_axis(i_cand, pos, axis=1)


class IVFPQIndex(IVFIndex):
    """IVF cells storing m-byte residual PQ codes instead of vectors.

    Inherits training, capacity-bounded spill assignment, and tombstone
    bookkeeping from IVFIndex; overrides storage (subspace-major codes,
    not vectors) and scoring (coarse + residual ADC). Routing: on TPU
    the Pallas per-cell-DMA kernel serves EVERY batch size (measured
    2.5k QPS on uniform B=256 at 10M x 768 vs 313 for batch-shared,
    and it matches batch-shared's concentrated-traffic win); where the
    kernel is unavailable (CPU/XLA), batches >= batch_share_threshold
    route to the batch-shared decode-unique-cells-once kernel.
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
        opq: bool = False,
        opq_iters: int = 6,
        pq_train_sample: Optional[int] = None,
        seed: int = 0,
    ):
        """refine="int8" (N*(D+4) host bytes) or refine="f32" (N*D*4
        host bytes) keeps per-row vectors in HOST memory — zero HBM —
        and exactly rescores the top refine_factor*k PQ candidates per
        query: PQ ranks coarsely within tight clusters (residual
        distortion ~ the neighbor margins), and the refine stage
        restores fine ranking (the FAISS-refine / DiskANN recipe).
        int8 rescoring resolves margins down to ~4e-3 of the score
        scale; use f32 when neighbor margins are tighter than that.

        opq=True learns an orthogonal rotation (ops/opq.py, Ge et al.
        OPQ) minimizing residual PQ distortion and applies it as a
        GLOBAL pre-rotation of the index space: _prepare rotates every
        incoming vector/query and the coarse centroids are rotated once
        at train time, so all dot products — coarse, ADC, refine — are
        preserved exactly and no kernel changes. The refine bank stores
        rotated rows (scores unchanged; raw-vector reconstruction would
        need rot.T, which the index does not expose).

        refine="int8_device" banks the int8 rows + scales in HBM
        (N*(D+4) device bytes — 7.7 GB at 10M x 768, fits one chip next
        to the codes) and rescores with an on-device gather + f32 dot:
        no host round-trip at ADD time (the host modes fetch every row
        over the transport — prohibitive on a remote-attached chip) and
        no host einsum at query time. This is the production 10M-tier
        configuration (BENCH_SWEEP r4 ivfpq_operating_point); beyond
        HBM (100M), fall back to refine="int8" host banking."""
        if dim % m != 0:
            raise ValueError(f"dim={dim} not divisible by m={m}")
        if refine not in ("none", "int8", "f32", "int8_device"):
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
        self.opq = bool(opq)
        self.opq_iters = int(opq_iters)
        # PQ/OPQ training rows may be capped below train_sample: the
        # coarse k-means wants every row it can get (nlist centroids to
        # place), while the 256-entry subspace codebooks saturate far
        # earlier — and the OPQ alternation holds ~6 row-sized f32
        # transients, which at 262k x 768 next to a reserved 10M refine
        # bank overruns a 16GB v5e. None = use train_sample.
        self.pq_train_sample = (
            int(pq_train_sample) if pq_train_sample else None)
        self._rot: Optional[jax.Array] = None    # [D, D]; x_rot = x @ rot
        # batches at least this large route to the batch-shared kernel
        # (decode each unique probed cell once; 3.6-14x measured on TPU)
        self.batch_share_threshold = 256
        # per-query kernel choice: None = Pallas on TPU / XLA elsewhere;
        # True/False force it ("interpret" forces Pallas interpret mode,
        # the hermetic-test path for the kernel itself)
        self.use_pallas: Optional[object] = None
        self._books: Optional[jax.Array] = None  # [m, ksub, dsub]
        self._raw_chunks: list = []              # host int8 rows (refine)
        self._raw_scales: list = []              # host f32 per-row scales
        self._dev_chunks: list = []              # device int8 rows (refine)
        self._dev_scales: list = []              # device f32 scales [n, 1]
        # True once _dev_reserve preallocated the bank: adds then write
        # in place (donated dynamic_update_slice) at offset n_rows
        # instead of appending chunks for a lazy concat — the concat
        # briefly holds old+new banks (2x7.7GB at 10M x 768), which is
        # an HBM OOM next to the 2GB code tensor on a 16GB chip
        self._dev_prealloc = False

    # -- build -------------------------------------------------------------

    def reserve(self, n_rows: int) -> None:
        """Preallocate cell storage (inherited) AND, for
        refine="int8_device", the [n_rows, D] int8 bank + scales, so a
        chunked 10M build allocates each HBM tenant exactly once.
        Without this the bank grows by lazy chunk-concat, whose final
        consolidation holds two full banks at once."""
        super().reserve(n_rows)
        if self.refine == "int8_device":
            self._dev_reserve(n_rows)

    def _dev_reserve(self, cap_rows: int) -> None:
        cap_rows = int(cap_rows)
        if self._dev_chunks:
            # consolidate any append-mode chunks first (no-op once in
            # prealloc mode: the list is always length 1 there)
            have_bank, have_scales = self._dev_bank()
        else:
            have_bank = have_scales = None
        have = 0 if have_bank is None else int(have_bank.shape[0])
        if self._dev_prealloc and have >= cap_rows:
            return
        rows = max(cap_rows, have, 1)
        bank = jnp.zeros((rows, self.dim), jnp.int8)
        scales = jnp.ones((rows, 1), jnp.float32)
        if have:
            bank, scales = _bank_write(
                bank, scales, have_bank, have_scales, jnp.int32(0))
        self._dev_chunks = [bank]
        self._dev_scales = [scales]
        self._dev_prealloc = True

    def _prepare(self, vectors: np.ndarray) -> jax.Array:
        v = super()._prepare(vectors)
        if self._rot is not None:
            # OPQ global pre-rotation: orthogonal, so every downstream
            # dot product (coarse, ADC, refine) is score-identical
            v = jax.lax.dot_general(
                v, self._rot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return v

    def train(self, vectors: np.ndarray) -> None:
        """Coarse k-means (inherited), then residual PQ codebooks on the
        same sample (persistent.rs:155-186 trains per-subspace k-means;
        here it runs on cell residuals, the standard IVF-PQ recipe).
        With opq=True the codebooks are trained jointly with an
        orthogonal rotation (alternating minimization, ops/opq.py) that
        is then folded into the index space: centroids rotate once here,
        vectors/queries rotate in _prepare."""
        self._rot = None          # retrain resets any previous rotation
        super().train(vectors)
        v = self._prepare(vectors)
        n = v.shape[0]
        pq_sample = min(self.train_sample,
                        self.pq_train_sample or self.train_sample)
        if n > pq_sample:
            sel = np.random.default_rng(self.seed).choice(
                n, pq_sample, replace=False
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
        if self.opq:
            from codegraph_tpu.ops.opq import opq_train

            rot, books = opq_train(
                residuals, self.m, nbits=nbits_eff,
                n_iters=self.opq_iters, pq_iters=2,
                final_pq_iters=self.pq_iters, seed=self.seed,
            )
            self._books = books.centroids
            # fold the rotation into the index space: from here on every
            # vector and query rotates in _prepare, centroids rotate once
            self._centroids = jax.lax.dot_general(
                self._centroids, rot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            self._rot = rot
        else:
            from codegraph_tpu.ops.opq import pq_train_batched

            # batched trainer: one vmapped Lloyd's program for all m
            # subspaces instead of m sequential kmeans() dispatches
            self._books = pq_train_batched(
                residuals, self.m, nbits=nbits_eff, n_iters=self.pq_iters,
                seed=self.seed,
            ).centroids

    @property
    def is_trained(self) -> bool:
        return self._centroids is not None and self._books is not None

    def _alloc(self, list_cap: int) -> None:
        """Cell storage holds uint8 codes [nlist, m, cap], subspace-major
        with cap a multiple of 128 (the Pallas ADC kernel's lane tile)."""
        from codegraph_tpu.core.padding import round_up

        list_cap = max(LANE, round_up(list_cap, LANE))
        codes = jnp.zeros((self.nlist, self.m, list_cap), jnp.uint8)
        ids = jnp.full((self.nlist, list_cap), -1, jnp.int32)
        bias = jnp.full((self.nlist, list_cap), NEG_INF, jnp.float32)
        if self._x is not None and self.list_cap > 0:
            old = min(self.list_cap, list_cap)
            codes = codes.at[:, :, :old].set(self._x[:, :, :old])
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
        elif self.refine == "int8_device":
            q8, sc = _quantize_rows_device(v)
            if self._dev_prealloc:
                # rows land at global ids [n_rows, n_rows+n): write in
                # place at that offset (donated buffer, no copy)
                need = self.n_rows + int(q8.shape[0])
                if need > int(self._dev_chunks[0].shape[0]):
                    self._dev_reserve(
                        max(need, int(self._dev_chunks[0].shape[0] * 1.5)))
                self._dev_chunks[0], self._dev_scales[0] = _bank_write(
                    self._dev_chunks[0], self._dev_scales[0], q8, sc,
                    jnp.int32(self.n_rows))
            else:
                self._dev_chunks.append(q8)
                self._dev_scales.append(sc)
        elif self.refine == "f32":
            vn = np.asarray(v, np.float32)
            self._raw_chunks.append(vn)
            self._raw_scales.append(np.ones((vn.shape[0], 1), np.float32))
        residuals = v - jnp.take(self._centroids, jnp.asarray(cells), axis=0)
        return pq_encode(residuals, self._books)

    def _scatter_payload(self, cells_j, pos_j, vals) -> None:
        """vals [n, m] codes scatter into [nlist, m, cap] at (cell, :, pos)."""
        self._x = _scatter2t(self._x, cells_j, pos_j, vals)

    # -- query -------------------------------------------------------------

    def _maybe_rotate(self, q: jax.Array) -> jax.Array:
        """Queries enter the OPQ-rotated index space (after
        normalization — rotation preserves norms, order irrelevant)."""
        if self._rot is None:
            return q
        return jax.lax.dot_general(
            q, self._rot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def _pallas_mode(self) -> Optional[bool]:
        """Resolve use_pallas: True / False / "interpret" / None(auto)."""
        if self.use_pallas == "interpret":
            return "interpret"
        if self.use_pallas is None:
            # "axon" = TPU via the remote-attach plugin (flat.py:36) —
            # omitting it silently dropped auto mode to the 35-QPS XLA
            # gather path on the actual deployment platform
            return jax.default_backend() in ("tpu", "axon")
        return bool(self.use_pallas)

    def search(
        self, queries: np.ndarray, k: int, nprobe: Optional[int] = None,
        extra_bias=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """extra_bias: optional [n] f32 filter mask indexed by GLOBAL row
        id (0 = allowed, NEG_INF = excluded) — the SearchFilters device
        mask. Applied post-scan over the candidate set (the PQ scan is
        already approximate); the over-fetch scales with the filter's
        selectivity (allowed fraction), so a 2% filter fetches ~50x
        candidates instead of a fixed 4x that would return near-empty
        results."""
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
        mode = self._pallas_mode()
        # batch-shared routing only where the per-cell-DMA kernel isn't
        # available (CPU/XLA): measured on TPU at 10M x 768, the Pallas
        # path does 2.5k QPS on UNIFORM B=256 batches vs 313 QPS for the
        # batch-shared kernel (whose win case — concentrated traffic —
        # it matches), so on TPU it owns every batch size
        if q.shape[0] >= self.batch_share_threshold and not mode:
            return self.search_batch(queries, k, nprobe=nprobe,
                                     extra_bias=extra_bias)
        if self.metric == "cosine":
            q = l2_normalize(q)
        q = self._maybe_rotate(q)
        np_eff = min(nprobe or self.nprobe, self.nlist)
        use_refine = self.refine != "none" and (
            self._raw_chunks or self._dev_chunks)
        k_fetch = max(k, min(k * self.refine_factor,
                             self.list_cap * np_eff)) if use_refine else k
        if extra_bias is not None:
            k_fetch = max(k_fetch, _filter_fetch_k(
                k, extra_bias, self.list_cap * np_eff))
        if mode:
            s, i = ivfpq_search_pallas(
                q, self._centroids, self._x, self._ids, self._bias,
                self._books, k_fetch, np_eff,
                interpret=(mode == "interpret"),
            )
        else:
            s, i = ivfpq_search_kernel(
                q, self._centroids, self._x, self._ids, self._bias,
                self._books, k_fetch, np_eff,
            )
        if use_refine and self.refine == "int8_device" \
                and extra_bias is None:
            # device path: candidates never leave the chip before the
            # exact rescore (one extra fetch of [B, k] only)
            s, i = self._refine_dev(q, s, i, k)
            s_np, i_np = np.asarray(s), np.asarray(i)
            return s_np, np.where(s_np <= float(NEG_INF) / 2, -1, i_np)
        s_np, i_np = np.asarray(s), np.asarray(i)
        dead = s_np <= float(NEG_INF) / 2
        i_np = np.where(dead, -1, i_np)
        if extra_bias is not None:
            s_np, i_np = _apply_extra_bias_post(s_np, i_np, extra_bias)
        if not use_refine:
            if k_fetch > k:
                s_np, i_np = _truncate_topk(s_np, i_np, k)
            return s_np, i_np
        if self.refine == "int8_device":
            s2, i2 = self._refine_dev(
                q, jnp.asarray(s_np), jnp.asarray(i_np), k)
            s_np, i_np = np.asarray(s2), np.asarray(i2)
            return s_np, np.where(s_np <= float(NEG_INF) / 2, -1, i_np)
        return self._refine_host(np.asarray(q), s_np, i_np, k)

    def _refine_dev(self, q, s_cand, i_cand, k: int):
        """Route to the flat or candidate-tiled exact rescore: beyond
        256 candidates/query the flat [B, R, D] f32 gather transient
        outgrows its usefulness (755 MB at rf=96), so tile."""
        raw, scales = self._dev_bank()
        if int(i_cand.shape[1]) > 256:
            return _refine_device_tiled(q, raw, scales, s_cand, i_cand, k)
        return _refine_device_kernel(q, raw, scales, s_cand, i_cand, k)

    def _dev_bank(self):
        """Consolidate device refine chunks into one [N, D] bank (one
        concat copy, HBM-local; lazily on first refined search)."""
        if len(self._dev_chunks) > 1:
            self._dev_chunks = [jnp.concatenate(self._dev_chunks)]
            self._dev_scales = [jnp.concatenate(self._dev_scales)]
        return self._dev_chunks[0], self._dev_scales[0]

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
        tile_u: int = 16, extra_bias=None,
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
        q = self._maybe_rotate(q)
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

        use_refine = self.refine != "none" and (
            self._raw_chunks or self._dev_chunks)
        k_fetch = max(k, min(k * self.refine_factor,
                             self.list_cap * np_eff)) if use_refine else k
        if extra_bias is not None:
            k_fetch = max(k_fetch, _filter_fetch_k(
                k, extra_bias, self.list_cap * np_eff))
        s, i = ivfpq_batch_search_kernel(
            q, probe_ids, jnp.asarray(cells_u), self._x, self._ids,
            self._bias, self._centroids, self._books, k_fetch,
            tile_u=tile_u,
        )
        if use_refine and self.refine == "int8_device" \
                and extra_bias is None:
            s, i = self._refine_dev(q, s, i, k)
            s_np, i_np = np.asarray(s), np.asarray(i)
            return s_np, np.where(s_np <= float(NEG_INF) / 2, -1, i_np)
        s_np, i_np = np.asarray(s), np.asarray(i)
        dead = s_np <= float(NEG_INF) / 2
        i_np = np.where(dead, -1, i_np)
        if extra_bias is not None:
            s_np, i_np = _apply_extra_bias_post(s_np, i_np, extra_bias)
        if not use_refine:
            if k_fetch > k:
                s_np, i_np = _truncate_topk(s_np, i_np, k)
            return s_np, i_np
        if self.refine == "int8_device":
            s2, i2 = self._refine_dev(
                q, jnp.asarray(s_np), jnp.asarray(i_np), k)
            s_np, i_np = np.asarray(s2), np.asarray(i2)
            return s_np, np.where(s_np <= float(NEG_INF) / 2, -1, i_np)
        return self._refine_host(np.asarray(q), s_np, i_np, k)

    # -- state -------------------------------------------------------------

    def stats(self) -> dict:
        st = super().stats()
        st.update({
            "m": self.m,
            "nbits": self.nbits,
            "opq": self._rot is not None,
            "bytes_per_row": self.m + 4 + 4,  # codes + id + bias (HBM)
            "refine": self.refine,
            "host_bytes_per_row": {"none": 0, "int8": self.dim + 4,
                                   "f32": self.dim * 4,
                                   "int8_device": 0}[self.refine],
            "hbm_refine_bytes_per_row": (
                self.dim + 4 if self.refine == "int8_device" else 0),
        })
        return st


__all__ = [
    "IVFPQIndex",
    "ivfpq_search_kernel",
    "ivfpq_search_pallas",
    "ivfpq_batch_search_kernel",
]
