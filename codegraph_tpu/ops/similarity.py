"""Similarity primitives.

TPU-native replacement for the reference's AVX2 SIMD cosine kernels
(crates/codegraph-vector/src/simd_ops.rs:7-487): on TPU the 8-lane FMA
loop becomes one MXU matmul, and normalize becomes a fused VPU rsqrt.
Cosine over pre-normalized rows == dot product, so the index layer
normalizes at ingest and the hot path is pure dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Row-normalize; zero rows stay zero (analogue of normalize_avx2,
    simd_ops.rs:245)."""
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, eps))
    return (x * inv).astype(x.dtype)


def pairwise_scores(q: jax.Array, x: jax.Array) -> jax.Array:
    """[B, D] x [N, D] -> [B, N] dot scores in f32 on the MXU."""
    return jax.lax.dot_general(
        q,
        x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


__all__ = ["l2_normalize", "pairwise_scores"]
