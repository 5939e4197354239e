"""On-chip batched k-means (Lloyd's) for IVF index build + PQ training.

TPU-native generalization of the reference's per-subspace k-means
(crates/codegraph-vector/src/persistent.rs:155-186 ProductQuantizer
training, :273 k-means loop): a scalar CPU loop there becomes two MXU
matmuls per tile here — assignment is `scores = X_tile @ C^T` + argmax,
and the centroid update accumulates `onehot(assign)^T @ X_tile` so the
whole iteration stays on the systolic array. The N dimension streams in
tiles via `lax.scan`, so the [N, nlist] score matrix never materializes
in HBM.

Spherical mode (`metric="cosine"`) re-normalizes centroids every
iteration, matching cosine-metric IVF (argmax dot == nearest on sphere).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _tile_assign(
    x_tile: jax.Array, c: jax.Array, c_half_sq: jax.Array | None = None
) -> jax.Array:
    """[T, D] x [K, D] -> nearest-centroid assignment [T] int32.

    c_half_sq = ||c||^2 / 2 turns the dot argmax into an L2 argmin
    (argmin ||x-c||^2 == argmax x.c - ||c||^2/2); None/zeros keeps plain
    dot (cosine on normalized data).
    """
    scores = jax.lax.dot_general(
        x_tile, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if c_half_sq is not None:
        scores = scores - c_half_sq[None, :]
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_n", "metric"))
def assign_clusters(
    x: jax.Array, centroids: jax.Array, mask: jax.Array, tile_n: int = 4096,
    metric: str = "cosine",
) -> jax.Array:
    """Streaming nearest-centroid assignment.

    x: [N_pad, D]; centroids: [K, D]; mask: [N_pad] bool (False = padding).
    Returns [N_pad] int32 assignments (padding rows get 0 but are ignored
    downstream via the mask).
    """
    N, D = x.shape
    assert N % tile_n == 0
    x_tiles = x.reshape(N // tile_n, tile_n, D)
    c_half_sq = (
        0.5 * jnp.sum(jnp.square(centroids), axis=1) if metric == "l2" else None
    )

    def step(_, xt):
        return None, _tile_assign(xt, centroids, c_half_sq)

    _, out = jax.lax.scan(step, None, x_tiles)
    return out.reshape(N)


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "tile_n", "spherical", "l2")
)
def _lloyd_iteration(
    x: jax.Array,
    maskf: jax.Array,
    centroids: jax.Array,
    n_clusters: int,
    tile_n: int,
    spherical: bool,
    l2: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One Lloyd's step. Returns (new_centroids [K, D], counts [K])."""
    N, D = x.shape
    x_tiles = x.reshape(N // tile_n, tile_n, D)
    m_tiles = maskf.reshape(N // tile_n, tile_n)
    c_half_sq = (
        0.5 * jnp.sum(jnp.square(centroids), axis=1) if l2 else None
    )

    def step(carry, inp):
        sums, counts = carry
        xt, mt = inp
        assign = _tile_assign(xt, centroids, c_half_sq)  # [T]
        onehot = (
            jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32) * mt[:, None]
        )  # [T, K]
        sums = sums + jax.lax.dot_general(
            onehot, xt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, D]
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), None

    init = (
        jnp.zeros((n_clusters, D), jnp.float32),
        jnp.zeros((n_clusters,), jnp.float32),
    )
    (sums, counts), _ = jax.lax.scan(step, init, (x_tiles, m_tiles))

    # empty clusters keep their previous centroid (reference keeps the old
    # centroid too rather than crashing, persistent.rs:178-184)
    safe = jnp.maximum(counts, 1.0)[:, None]
    new_c = jnp.where(counts[:, None] > 0, sums / safe, centroids)
    if spherical:
        sq = jnp.sum(jnp.square(new_c), axis=1, keepdims=True)
        new_c = new_c * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
    return new_c, counts


def kmeans(
    x: jax.Array,
    n_clusters: int,
    n_iters: int = 10,
    metric: str = "cosine",
    tile_n: int = 4096,
    seed: int = 0,
    mask: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Batched Lloyd's k-means on device.

    x: [N_pad, D] (rows beyond `mask` are padding). Returns
    (centroids [n_clusters, D] f32, counts [n_clusters] f32).
    Initialization samples live rows without replacement.
    """
    N, D = x.shape
    if N % tile_n != 0:
        # pad to tile boundary; padded rows masked out
        pad = (-N) % tile_n
        x = jnp.concatenate([x, jnp.zeros((pad, D), x.dtype)], axis=0)
        if mask is None:
            mask = jnp.concatenate(
                [jnp.ones((N,), bool), jnp.zeros((pad,), bool)], axis=0
            )
        else:
            mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)], axis=0)
        N = N + pad
    if mask is None:
        mask = jnp.ones((N,), bool)
    maskf = mask.astype(jnp.float32)

    key = jax.random.PRNGKey(seed)
    # sample initial centroids from live rows: weighted choice w/o replacement
    probs = maskf / jnp.maximum(jnp.sum(maskf), 1.0)
    init_rows = jax.random.choice(
        key, N, shape=(n_clusters,), replace=False, p=probs
    )
    centroids = jnp.take(x, init_rows, axis=0).astype(jnp.float32)
    if metric == "cosine":
        sq = jnp.sum(jnp.square(centroids), axis=1, keepdims=True)
        centroids = centroids * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))

    counts = jnp.zeros((n_clusters,), jnp.float32)
    spherical = metric == "cosine"
    l2 = metric == "l2"
    for _ in range(n_iters):
        centroids, counts = _lloyd_iteration(
            x, maskf, centroids, n_clusters, tile_n, spherical, l2
        )
    return centroids, counts


@functools.partial(jax.jit, static_argnames=("tile_n", "metric", "top"))
def assign_clusters_topk(
    x: jax.Array, centroids: jax.Array, mask: jax.Array, tile_n: int = 4096,
    metric: str = "cosine", top: int = 2,
) -> jax.Array:
    """Top-`top` nearest centroids per row ([N_pad, top] int32) — the
    spill targets for capacity-bounded IVF cells."""
    N, D = x.shape
    assert N % tile_n == 0
    x_tiles = x.reshape(N // tile_n, tile_n, D)
    c_half_sq = (
        0.5 * jnp.sum(jnp.square(centroids), axis=1) if metric == "l2" else None
    )

    def step(_, xt):
        scores = jax.lax.dot_general(
            xt, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if c_half_sq is not None:
            scores = scores - c_half_sq[None, :]
        _, idx = jax.lax.top_k(scores, top)
        return None, idx.astype(jnp.int32)

    _, out = jax.lax.scan(step, None, x_tiles)
    return out.reshape(N, top)


__all__ = ["kmeans", "assign_clusters", "assign_clusters_topk"]
