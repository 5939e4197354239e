"""Product quantization: per-subspace k-means codebooks + ADC scan.

TPU-native re-design of the reference's ProductQuantizer
(crates/codegraph-vector/src/persistent.rs:118-330: m subquantizers x
2^nbits centroids, per-subspace k-means training :155-186,
encode/decode :190-243). Training reuses the batched on-chip Lloyd's
kernel (ops/kmeans.py) vmapped over subspaces; query scoring is ADC
(asymmetric distance computation): one small matmul builds the
[m, ksub] dot-table, then scoring the whole corpus is a pure gather-sum
over uint8 codes — 768-d f32 rows become m bytes, so the scan reads
D*4/m times less HBM than the f32 flat scan.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codegraph_tpu.ops.kmeans import kmeans


@dataclass
class PQCodebook:
    centroids: jax.Array  # [m, ksub, dsub] f32

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def ksub(self) -> int:
        return self.centroids.shape[1]

    @property
    def dsub(self) -> int:
        return self.centroids.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def pq_train(
    x: jax.Array, m: int, nbits: int = 8, n_iters: int = 10, seed: int = 0
) -> PQCodebook:
    """Train m per-subspace codebooks of 2^nbits centroids each.

    x: [N, D] with D % m == 0. Euclidean subspace k-means (metric="dot"
    spherical normalization would distort subspace geometry).
    """
    N, D = x.shape
    assert D % m == 0, f"D={D} not divisible by m={m}"
    ksub = 1 << nbits
    assert N >= ksub, f"need >= {ksub} training rows, got {N}"
    dsub = D // m
    xs = x.reshape(N, m, dsub)
    books = []
    for j in range(m):
        c, _ = kmeans(
            xs[:, j, :], ksub, n_iters=n_iters, metric="l2",
            tile_n=min(4096, max(8, N)), seed=seed + j,
        )
        books.append(c)
    return PQCodebook(centroids=jnp.stack(books))


@functools.partial(jax.jit, static_argnames=("tile_n",))
def pq_encode(
    x: jax.Array, centroids: jax.Array, tile_n: int = 8_192
) -> jax.Array:
    """[N, D] -> [N, m] uint8 codes (nearest centroid per subspace by L2).

    Streams over row tiles: the [tile, m, ksub] distance block is the
    working set (a flat [N, m, ksub] would be 51GB at 512k x 96 x 256;
    even one 32k tile is a ~3GB transient at m=96, which evicts the 10M
    build — bank 8GB + codes 2GB — out of HBM, hence the 8k tile)."""
    N, D = x.shape
    m, ksub, dsub = centroids.shape
    c_sq = jnp.sum(jnp.square(centroids), axis=-1)  # [m, ksub]

    def encode_tile(xt):
        xs = xt.reshape(xt.shape[0], m, dsub)
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over ksub
        dots = jnp.einsum("nmd,mkd->nmk", xs, centroids,
                          preferred_element_type=jnp.float32)
        dist = c_sq[None, :, :] - 2.0 * dots
        return jnp.argmin(dist, axis=-1).astype(jnp.uint8)

    if N <= tile_n:
        return encode_tile(x)
    pad = (-N) % tile_n
    xp = jnp.concatenate([x, jnp.zeros((pad, D), x.dtype)]) if pad else x
    tiles = xp.reshape(-1, tile_n, D)
    codes = jax.lax.map(encode_tile, tiles)
    return codes.reshape(-1, m)[:N]


@jax.jit
def pq_decode(codes: jax.Array, centroids: jax.Array) -> jax.Array:
    """[N, m] uint8 -> [N, D] f32 reconstruction."""
    m = centroids.shape[0]
    gathered = jnp.take_along_axis(
        centroids[None, :, :, :],
        codes.astype(jnp.int32)[:, :, None, None],
        axis=2,
    )[:, :, 0, :]  # [N, m, dsub]
    return gathered.reshape(codes.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def pq_adc_topk(
    q: jax.Array,          # [B, D] f32 queries
    codes: jax.Array,      # [N, m] uint8 corpus codes
    centroids: jax.Array,  # [m, ksub, dsub]
    bias: jax.Array,       # [N] f32 (0 live / NEG_INF dead)
    k: int,
    tile_n: int = 16384,
) -> Tuple[jax.Array, jax.Array]:
    """ADC dot-product top-k: table lookup instead of full matmul.

    score[b, n] = sum_j table[b, j, codes[n, j]] where
    table[b, j, :] = q_sub[b, j] . centroids[j, :, :]. Streams over N in
    tiles (a flat gather would materialize [B, N, m] — ~100GB at
    1M x 256 x 96).

    Caveat: ADC is gather-bound, which is the VPU's weak spot — on TPU
    the int8 flat scan (ops/quantize.py) is the production quantized
    path; PQ earns its keep as a compression format (m bytes/row) and on
    gather-friendly backends.
    """
    from codegraph_tpu.ops.topk import NEG_INF, merge_topk

    B, D = q.shape
    N, m = codes.shape
    assert N % tile_n == 0, f"N={N} must be a multiple of tile_n={tile_n}"
    dsub = centroids.shape[2]
    qs = q.reshape(B, m, dsub)
    table = jnp.einsum("bmd,mkd->bmk", qs, centroids,
                       preferred_element_type=jnp.float32)  # [B, m, ksub]
    code_tiles = codes.reshape(N // tile_n, tile_n, m)
    bias_tiles = bias.reshape(N // tile_n, tile_n)

    def step(carry, inp):
        top_s, top_i = carry
        ct, bt, base = inp
        idx = ct.astype(jnp.int32)  # [tile_n, m]
        s = jnp.sum(
            jnp.take_along_axis(
                table[:, None, :, :],            # [B, 1, m, ksub]
                idx[None, :, :, None],           # [1, tile_n, m, 1]
                axis=3,
            )[:, :, :, 0],
            axis=-1,
        ) + bt[None, :]                          # [B, tile_n]
        ids = base + jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
        return merge_topk(top_s, top_i, s, ids, k), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    bases = jnp.arange(N // tile_n, dtype=jnp.int32) * tile_n
    (top_s, top_i), _ = jax.lax.scan(
        step, init, (code_tiles, bias_tiles, bases)
    )
    return top_s, top_i


__all__ = ["PQCodebook", "pq_train", "pq_encode", "pq_decode", "pq_adc_topk"]
