"""Streaming top-k over an HBM-resident embedding matrix.

The north-star query kernel (SURVEY.md section 7 / BASELINE config 1):
replaces the reference's brute-force rayon `parallel_top_k_search`
(crates/codegraph-vector/src/simd_ops.rs:361-384) and SurrealDB HNSW KNN
(schema/codegraph.surql:328-397) with a fused matmul + streaming top-k
that never materializes the [B, N] score matrix in HBM.

Two implementations with identical semantics:

* `streaming_topk`      — pure-XLA `lax.scan` over row tiles; the carry is
                          the running (scores, ids) top-k. XLA keeps the
                          per-tile [B, TILE_N] scores in VMEM/registers.
* `streaming_topk_pallas` — Pallas kernel: grid over (B tiles, N tiles),
                          MXU dot per tile, VMEM top-k accumulator merged
                          in-kernel, written out on the last N tile.

Both take a `bias` vector [N] (0 for live rows, NEG_INF for padding and
tombstoned rows) so dynamic corpora keep static shapes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # plain float so Pallas kernels can use it as a literal

DEFAULT_TILE_N = 1024
DEFAULT_TILE_B = 8
LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def exact_topk(
    q: jax.Array, x: jax.Array, k: int, bias: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """Full [B, N] materialization + lax.top_k. Oracle / small-N path."""
    scores = jax.lax.dot_general(
        q, x, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias[None, :]
    return jax.lax.top_k(scores, k)


def merge_topk(
    s_a: jax.Array, i_a: jax.Array, s_b: jax.Array, i_b: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge two (scores, ids) candidate sets per row into top-k.

    Used by the scan carry and by the cross-shard k-way merge
    (parallel/sharded_search.py). Pure lax.top_k over the concat.
    """
    s = jnp.concatenate([s_a, s_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    top_s, pos = jax.lax.top_k(s, k)
    return top_s, jnp.take_along_axis(i, pos, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def streaming_topk(
    q: jax.Array,
    x: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
) -> Tuple[jax.Array, jax.Array]:
    """XLA streaming top-k: scan over N in tiles, carrying the running top-k.

    q:    [B, D] queries (pre-normalized for cosine)
    x:    [N_pad, D] corpus, N_pad % tile_n == 0
    bias: [N_pad] f32, 0=live / NEG_INF=dead
    Returns (scores [B, k], ids [B, k]) with ids global row indices.
    """
    B, D = q.shape
    N = x.shape[0]
    assert N % tile_n == 0, f"N_pad={N} must be a multiple of tile_n={tile_n}"
    n_tiles = N // tile_n

    x_tiles = x.reshape(n_tiles, tile_n, D)
    b_tiles = bias.reshape(n_tiles, tile_n)
    qf = q

    def step(carry, inp):
        top_s, top_i = carry
        xt, bt, base = inp
        s = jax.lax.dot_general(
            qf, xt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bt[None, :]
        ids = base + jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
        return merge_topk(top_s, top_i, s, ids, k), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile_n
    (top_s, top_i), _ = jax.lax.scan(step, init, (x_tiles, b_tiles, bases))
    return top_s, top_i


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _threshold_merge_impl(s, make_ids, accs, acci, k: int, k_pad: int):
    """Shared threshold-gated insertion body for both merge variants —
    the id derivation is the ONLY difference, so it is injected via
    make_ids(argmax_col, at_max_mask) -> [Bt] global ids. Keeping one
    body means a future fix to the pos/roll insertion cannot leave the
    flat kernels and the IVF-PQ ADC kernel disagreeing."""
    Bt, tile_n = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, tile_n), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, k_pad), 1)

    def cond(state):
        s_cur, accs, _ = state
        return jnp.any(jnp.max(s_cur, axis=1) > accs[:, k - 1])

    def body(state):
        s_cur, accs, acci = state
        m = jnp.max(s_cur, axis=1)
        am = jnp.argmax(s_cur, axis=1)
        do = m > accs[:, k - 1]
        at_max = col == am[:, None]
        raw_i = make_ids(am, at_max)
        s_cur = jnp.where(at_max, NEG_INF, s_cur)
        ins_s = jnp.where(do, m, NEG_INF)
        ins_i = jnp.where(do, raw_i.astype(jnp.int32), -1)
        pos = jnp.sum(
            (accs > ins_s[:, None]).astype(jnp.int32)[:, :k], axis=1
        )
        shifted_s = pltpu.roll(accs, 1, 1)
        shifted_i = pltpu.roll(acci, 1, 1)
        at = kcol == pos[:, None]
        before = kcol < pos[:, None]
        accs = jnp.where(before, accs,
                         jnp.where(at, ins_s[:, None], shifted_s))
        acci = jnp.where(before, acci,
                         jnp.where(at, ins_i[:, None], shifted_i))
        return s_cur, accs, acci

    _, new_s, new_i = jax.lax.while_loop(cond, body, (s, accs, acci))
    return new_s, new_i


def _threshold_merge(s, base, accs, acci, k: int, k_pad: int):
    """Merge a score tile into the sorted (descending) top-k accumulator
    with threshold-gated insertion: extract candidates only while some
    row still beats its k-th best; each winner inserts via a roll-shift.
    O(improvements) instead of O(k) passes per tile — a row improves its
    top-k only ~k*ln(N/k) times over a whole random scan. Inserted id =
    base + argmax column."""
    return _threshold_merge_impl(
        s, lambda am, _at: base + am.astype(jnp.int32), accs, acci, k, k_pad
    )


def _threshold_merge_vids(s, ids_row, accs, acci, k: int, k_pad: int):
    """_threshold_merge variant whose inserted ids come from an explicit
    per-column id vector instead of base+offset — for kernels scoring
    gathered cells whose rows carry arbitrary global ids (the IVF-PQ
    per-cell-DMA ADC kernel). The one-matching-column mask-sum replaces
    a scalar gather (Mosaic lane-gathers are vector-shaped only)."""
    return _threshold_merge_impl(
        s,
        lambda _am, at_max: jnp.sum(jnp.where(at_max, ids_row, 0), axis=1),
        accs, acci, k, k_pad,
    )


def _lane_reduce(s, ids_row=None):
    """One fused pass over a [Bt, tile_n] score tile producing, for each of
    the 128 lane positions, the best value across the tile_n/128 column
    slices (m1), the runner-up value (m2), which slice the best came from
    (r1), and — when ids_row is given — the best value's id (id1).

    This is the whole-tile work of the merge: ~5 VPU ops per element in a
    single pass, instead of the 2-3 full argmax+mask passes per inserted
    candidate that the threshold-gated merge pays. Everything downstream
    operates on [Bt, 128] arrays (16x smaller at tile_n=2048)."""
    Bt, tile_n = s.shape
    R = tile_n // LANE
    m1 = s[:, 0:LANE]
    m2 = jnp.full((Bt, LANE), NEG_INF, jnp.float32)
    r1 = jnp.zeros((Bt, LANE), jnp.int32)
    id1 = ids_row[:, 0:LANE] if ids_row is not None else None
    for r in range(1, R):
        sl = s[:, r * LANE:(r + 1) * LANE]
        better = sl > m1
        m2 = jnp.maximum(m2, jnp.where(better, m1, sl))
        m1 = jnp.where(better, sl, m1)
        r1 = jnp.where(better, r, r1)
        if ids_row is not None:
            id1 = jnp.where(better, ids_row[:, r * LANE:(r + 1) * LANE], id1)
    return m1, m2, r1, id1


def _mask_lane_max(s, r1):
    """NEG_INF out the per-lane-position maxima (at slice r1) of a
    [Bt, tile_n] tile — the already-consumed candidates — so the slow-path
    full-width merge cannot re-insert duplicates."""
    Bt, tile_n = s.shape
    R = tile_n // LANE
    parts = [
        jnp.where(r1 == r, NEG_INF, s[:, r * LANE:(r + 1) * LANE])
        for r in range(R)
    ]
    return jnp.concatenate(parts, axis=1)


def _lane_merge_common(s, m1, m2, r1, ids1, accs, acci, k, k_pad,
                       slow_make_ids):
    ins_ids = lambda _am, at: jnp.sum(jnp.where(at, ids1, 0), axis=1)
    new_s, new_i = _threshold_merge_impl(m1, ins_ids, accs, acci, k, k_pad)

    # Exactness: every tile entry other than a lane-position max is <= that
    # lane's m2. If no row's m2 beats its post-merge k-th best, the cheap
    # merge saw every candidate that matters. Otherwise (rare once the
    # threshold warms up — it needs TWO top-k entries at the same lane
    # position of the same tile) finish with the full-width merge over the
    # tile with the consumed maxima masked out.
    hidden = jnp.any(m2 > new_s[:, k - 1][:, None])

    def slow(args):
        a_s, a_i = args
        return _threshold_merge_impl(
            _mask_lane_max(s, r1), slow_make_ids, a_s, a_i, k, k_pad
        )

    return jax.lax.cond(hidden, slow, lambda a: a, (new_s, new_i))


def _lane_merge(s, base, accs, acci, k: int, k_pad: int):
    """Lane-reduced exact merge of a [Bt, tile_n] score tile into the
    sorted top-k accumulator. Drop-in replacement for _threshold_merge
    with the same semantics (inserted id = base + column) but ~16x less
    VPU work per tile: one fused reduction pass collapses each 128-lane
    position to its best two values, candidate insertion runs on the
    [Bt, 128] lane-maxima, and a threshold check on the runner-ups
    triggers the full-width merge only when a lane position actually hid
    a second top-k entry."""
    Bt, tile_n = s.shape
    if tile_n <= LANE:
        return _threshold_merge(s, base, accs, acci, k, k_pad)
    assert tile_n % LANE == 0
    m1, m2, r1, _ = _lane_reduce(s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, LANE), 1)
    ids1 = base + r1 * LANE + lane
    return _lane_merge_common(
        s, m1, m2, r1, ids1, accs, acci, k, k_pad,
        lambda am, _at: base + am.astype(jnp.int32),
    )


def _lane_merge_vids(s, ids_row, accs, acci, k: int, k_pad: int):
    """_lane_merge variant whose ids come from an explicit per-column id
    vector (the IVF-PQ gathered-cell kernels), mirroring
    _threshold_merge_vids."""
    Bt, tile_n = s.shape
    if tile_n <= LANE:
        return _threshold_merge_vids(s, ids_row, accs, acci, k, k_pad)
    assert tile_n % LANE == 0
    m1, m2, r1, id1 = _lane_reduce(s, ids_row)
    return _lane_merge_common(
        s, m1, m2, r1, id1, accs, acci, k, k_pad,
        lambda _am, at: jnp.sum(jnp.where(at, ids_row, 0), axis=1),
    )


def _flat_topk_kernel(
    q_ref, x_ref, bias_ref, out_s_ref, out_i_ref, acc_s, acc_i, *, k: int,
    k_pad: int, tile_n: int
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF)
        acc_i[:] = jnp.full_like(acc_i, -1)

    s = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]  # bias block is [1, tile_n], broadcasts over B

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
def streaming_topk_pallas(
    q: jax.Array,
    x: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas fused matmul + streaming top-k.

    Shapes: q [B, D] (B % tile_b == 0), x [N_pad, D] (N_pad % tile_n == 0),
    bias [N_pad]. Returns (scores [B, k], ids [B, k]).

    The top-k accumulator lives in VMEM scratch and persists across the
    sequential N-tile grid dimension; k is padded to the 128 lane width
    for layout, then sliced back.
    """
    B, D = q.shape
    N = x.shape[0]
    assert N % tile_n == 0 and B % tile_b == 0
    k_pad = _round_up(max(k, 1), LANE)

    grid = (B // tile_b, N // tile_n)
    kernel = functools.partial(
        _flat_topk_kernel, k=k, k_pad=k_pad, tile_n=tile_n
    )

    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
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
            bytes_accessed=B * D * 4 + N * D * 4 + N * 4 + 2 * B * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, x, bias.reshape(1, N))
    return out_s[:, :k], out_i[:, :k]


# ---------------------------------------------------------------------------
# Query-major Pallas kernel: corpus read ONCE for the whole query batch
# ---------------------------------------------------------------------------


def _flat_topk_qmajor_kernel(
    q_ref, x_ref, bias_ref, out_s_ref, out_i_ref, acc_s, acc_i, *, k: int,
    k_pad: int, tile_n: int, tile_b: int
):
    """Grid (n_tiles, b_tiles): the corpus tile is the OUTER loop, so each
    [tile_n, D] block streams from HBM exactly once and serves every
    query tile — total HBM traffic is one corpus read per call regardless
    of B. The accumulator holds SORTED top-k for ALL query rows in VMEM.

    Merge strategy: threshold-gated insertion. A fixed k-pass extract per
    tile costs O(k * B * N) VPU work over the whole scan and dominates
    the kernel; instead, a while-loop extracts candidates only while some
    row still beats its current k-th best, and each winner inserts into
    the sorted accumulator with a shift (pltpu.roll). For a random-order
    corpus a row improves its top-k O(k * ln(N/k)) times total, so the
    expected VPU work collapses from k passes/tile to ~0-2 after the
    early tiles."""
    i = pl.program_id(0)          # N tile (outer)
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

    s = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]

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
def streaming_topk_pallas_qmajor(
    q: jax.Array,
    x: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    tile_b: int = 64,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Corpus-outer variant of streaming_topk_pallas for LARGE query
    batches: HBM reads the corpus once per call instead of once per
    query tile. Accumulator VMEM = B * k_pad * 8 bytes, so B up to a few
    thousand fits comfortably."""
    B, D = q.shape
    N = x.shape[0]
    assert N % tile_n == 0 and B % tile_b == 0
    k_pad = _round_up(max(k, 1), LANE)
    grid = (N // tile_n, B // tile_b)
    kernel = functools.partial(
        _flat_topk_qmajor_kernel, k=k, k_pad=k_pad, tile_n=tile_n,
        tile_b=tile_b,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
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
            bytes_accessed=B * D * 4 + N * D * 4 + N * 4 + 2 * B * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, x, bias.reshape(1, N))
    return out_s[:, :k], out_i[:, :k]


# ---------------------------------------------------------------------------
# Query-RESIDENT kernel: the whole query batch lives in VMEM
# ---------------------------------------------------------------------------


def _flat_topk_qres_kernel(
    q_ref, x_ref, bias_ref, out_s_ref, out_i_ref, acc_s, acc_i, *, k: int,
    k_pad: int, tile_n: int, tile_b: int
):
    """Like _flat_topk_qmajor_kernel but the q BLOCK is the whole [B, D]
    batch with a constant index_map — it is DMA'd into VMEM exactly once
    per call. The floor probe (.bench/kernel_r3_int8.json) showed the
    qmajor kernel is HBM-traffic-bound on re-fetching query tiles: per
    corpus tile the whole batch streams again (B*D bytes x N/tile_n ~
    3-12 GB/call at the headline config), while the batch itself is only
    ~3 MB. Holding q resident leaves ONE corpus read as the only
    meaningful HBM traffic."""
    i = pl.program_id(0)          # N tile (outer)
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

    row = pl.ds(j * tile_b, tile_b)
    s = jax.lax.dot_general(
        q_ref[row, :], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]

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
def streaming_topk_pallas_qres(
    q: jax.Array,
    x: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    tile_b: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Query-resident streaming top-k: q [B, D] is pinned whole in VMEM
    (constant block), the corpus streams once. VMEM budget ~ B*D*dtype +
    2*tile_n*D*dtype + tile_b*tile_n*4 + B*k_pad*8 — B up to a few
    thousand bf16 rows fits. Same results as streaming_topk_pallas_qmajor.
    """
    B, D = q.shape
    N = x.shape[0]
    assert N % tile_n == 0 and B % tile_b == 0
    k_pad = _round_up(max(k, 1), LANE)
    grid = (N // tile_n, B // tile_b)
    kernel = functools.partial(
        _flat_topk_qres_kernel, k=k, k_pad=k_pad, tile_n=tile_n,
        tile_b=tile_b,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
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
            bytes_accessed=B * D * 4 + N * D * 4 + N * 4 + 2 * B * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, x, bias.reshape(1, N))
    return out_s[:, :k], out_i[:, :k]


# ---------------------------------------------------------------------------
# Query-major kernel over a TRANSPOSED corpus [D, N]
# ---------------------------------------------------------------------------


def _flat_topk_qmajor_xt_kernel(
    q_ref, xt_ref, bias_ref, out_s_ref, out_i_ref, acc_s, acc_i, *, k: int,
    k_pad: int, tile_n: int, tile_b: int
):
    """Same schedule as _flat_topk_qmajor_kernel but the corpus block is
    [D, tile_n]: the tile dot is q @ xt (contracting (1, 0)) — the
    natural [M,K]x[K,N] MXU orientation, so Mosaic never has to
    transpose the streamed operand in registers."""
    i = pl.program_id(0)          # N tile (outer)
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

    s = jax.lax.dot_general(
        q_ref[:], xt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]

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
def streaming_topk_pallas_qmajor_xt(
    q: jax.Array,
    xt: jax.Array,
    bias: jax.Array,
    k: int,
    tile_n: int = DEFAULT_TILE_N,
    tile_b: int = 64,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Query-major streaming top-k over a PRE-TRANSPOSED corpus xt [D, N].

    Identical results to streaming_topk_pallas_qmajor(q, xt.T, ...); the
    [D, tile_n] blocks feed the MXU in its native orientation. Callers
    that own the corpus layout (FlatIndex) can store xt once and avoid
    any per-call transpose.
    """
    B, D = q.shape
    N = xt.shape[1]
    assert N % tile_n == 0 and B % tile_b == 0
    k_pad = _round_up(max(k, 1), LANE)
    grid = (N // tile_n, B // tile_b)
    kernel = functools.partial(
        _flat_topk_qmajor_xt_kernel, k=k, k_pad=k_pad, tile_n=tile_n,
        tile_b=tile_b,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
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
            bytes_accessed=B * D * 4 + N * D * 4 + N * 4 + 2 * B * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, xt, bias.reshape(1, N))
    return out_s[:, :k], out_i[:, :k]


__all__ = [
    "NEG_INF",
    "exact_topk",
    "merge_topk",
    "streaming_topk",
    "streaming_topk_pallas",
    "streaming_topk_pallas_qmajor",
    "streaming_topk_pallas_qres",
    "streaming_topk_pallas_qmajor_xt",
]
