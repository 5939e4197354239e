"""OPQ: learned orthogonal rotation before product quantization.

The reference's ProductQuantizer splits dims into m contiguous subspaces
(crates/codegraph-vector/src/persistent.rs:118-155) — fine for isotropic
data, but real embedding residuals concentrate variance in a few
directions, so fixed subspaces waste codebook capacity. OPQ (Ge et al.,
CVPR'13, "Optimized Product Quantization") learns an orthogonal R
minimizing ||X R - decode(encode(X R))||^2 by alternating PQ training
with an orthogonal-Procrustes solve; because R is orthogonal it
preserves every dot product, so the IVF-PQ index can apply it as a
global pre-rotation of the whole space (vectors, queries, centroids)
with zero kernel changes and exact score semantics.

Also provides `pq_train_batched`: all m subspace k-means run as ONE
vmapped Lloyd's program instead of m sequential kmeans() calls — the
per-call dispatch overhead (30 ms over the dev transport x 96 subspaces
x iters) was most of r4's PQ training wall-clock.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from codegraph_tpu.ops.pq import PQCodebook, pq_decode, pq_encode


@functools.partial(jax.jit, static_argnames=("ksub", "n_iters", "tile_n"))
def _subspace_lloyd(
    xs: jax.Array,     # [m, N, dsub] f32 (N % tile_n == 0)
    init_c: jax.Array, # [m, ksub, dsub] f32
    ksub: int,
    n_iters: int,
    tile_n: int,
) -> jax.Array:
    """Lloyd's over all m subspaces at once (L2 metric). Returns
    [m, ksub, dsub] centroids. Empty clusters keep their previous
    centroid (matching ops/kmeans.py semantics)."""
    m, N, dsub = xs.shape
    x_tiles = xs.reshape(m, N // tile_n, tile_n, dsub).transpose(1, 0, 2, 3)

    def one_iter(c, _):
        # c: [m, ksub, dsub]
        c_half_sq = 0.5 * jnp.sum(jnp.square(c), axis=-1)  # [m, ksub]

        def tile_step(carry, xt):  # xt: [m, tile, dsub]
            sums, counts = carry
            scores = jnp.einsum("mtd,mkd->mtk", xt, c,
                                preferred_element_type=jnp.float32)
            scores = scores - c_half_sq[:, None, :]
            assign = jnp.argmax(scores, axis=-1)            # [m, tile]
            onehot = jax.nn.one_hot(assign, ksub, dtype=jnp.float32)
            sums = sums + jnp.einsum("mtk,mtd->mkd", onehot, xt,
                                     preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(onehot, axis=1)       # [m, ksub]
            return (sums, counts), None

        init = (jnp.zeros((m, ksub, dsub), jnp.float32),
                jnp.zeros((m, ksub), jnp.float32))
        (sums, counts), _ = jax.lax.scan(tile_step, init, x_tiles)
        safe = jnp.maximum(counts, 1.0)[:, :, None]
        return jnp.where(counts[:, :, None] > 0, sums / safe, c), None

    c_final, _ = jax.lax.scan(one_iter, init_c, None, length=n_iters)
    return c_final


def pq_train_batched(
    x: jax.Array, m: int, nbits: int = 8, n_iters: int = 10, seed: int = 0,
    tile_n: int = 4096,
) -> PQCodebook:
    """Train m subspace codebooks with ONE vmapped Lloyd's program.

    Same contract as ops/pq.py pq_train (L2 subspace k-means, row-sample
    init) minus the m-sequential-kmeans dispatch tax. x: [N, D], D % m == 0.
    """
    N, D = x.shape
    assert D % m == 0, f"D={D} not divisible by m={m}"
    ksub = 1 << nbits
    assert N >= ksub, f"need >= {ksub} training rows, got {N}"
    dsub = D // m
    pad = (-N) % tile_n
    xs = jnp.swapaxes(x.reshape(N, m, dsub), 0, 1)          # [m, N, dsub]
    if pad:
        # pad rows replicate row 0: they only bias counts, never create
        # NaNs, and with N >> pad the effect on centroids is negligible
        xs = jnp.concatenate(
            [xs, jnp.broadcast_to(xs[:, :1], (m, pad, dsub))], axis=1)
    # init: independent row sample per subspace
    key = jax.random.PRNGKey(seed)
    rows = jax.random.randint(key, (m, ksub), 0, N)
    init_c = jnp.take_along_axis(
        jnp.swapaxes(x.reshape(N, m, dsub), 0, 1),          # [m, N, dsub]
        rows[:, :, None], axis=1).astype(jnp.float32)
    c = _subspace_lloyd(xs.astype(jnp.float32), init_c, ksub, n_iters,
                        tile_n)
    return PQCodebook(centroids=c)


def opq_train(
    x: jax.Array,
    m: int,
    nbits: int = 8,
    n_iters: int = 6,
    pq_iters: int = 3,
    final_pq_iters: int = 10,
    seed: int = 0,
) -> Tuple[jax.Array, PQCodebook]:
    """Alternating OPQ-NP: (train PQ on X R) <-> (Procrustes R update).

    x: [N, D] training rows (typically IVF residuals). Returns
    (rot [D, D], books): apply as `x @ rot` before encoding; queries get
    the same rotation (dot products are preserved — rot is orthogonal).

    Each outer iteration trains light codebooks (pq_iters Lloyd steps)
    on the rotated data, reconstructs, and solves
        min_R ||X R - Xhat||_F  s.t.  R^T R = I
    via SVD of X^T Xhat (R = U V^T). The final codebooks get
    final_pq_iters full Lloyd steps at the converged rotation.
    """
    N, D = x.shape
    x = x.astype(jnp.float32)
    # identity init: residuals have no privileged axis ordering, and a
    # random rotation start was measured no better after 6 iterations
    rot = jnp.eye(D, dtype=jnp.float32)
    for it in range(n_iters):
        xr = x @ rot
        books = pq_train_batched(xr, m, nbits=nbits, n_iters=pq_iters,
                                 seed=seed + it)
        codes = pq_encode(xr, books.centroids)
        xhat = pq_decode(codes, books.centroids)            # [N, D]
        mat = jax.lax.dot_general(
            x, xhat, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [D, D]
        u, _, vt = jnp.linalg.svd(mat, full_matrices=False)
        rot = u @ vt
    books = pq_train_batched(x @ rot, m, nbits=nbits,
                             n_iters=final_pq_iters, seed=seed)
    return rot, books


def pq_distortion(x: jax.Array, books: PQCodebook) -> float:
    """Mean squared reconstruction error — the quantity OPQ minimizes;
    used by tests and the operating-point sweep to report ADC quality."""
    codes = pq_encode(x, books.centroids)
    xhat = pq_decode(codes, books.centroids)
    return float(jnp.mean(jnp.sum(jnp.square(x - xhat), axis=1)))


__all__ = ["opq_train", "pq_train_batched", "pq_distortion"]
