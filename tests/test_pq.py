import numpy as np
import pytest

import jax.numpy as jnp

from codegraph_tpu.ops.pq import (
    pq_adc_topk,
    pq_decode,
    pq_encode,
    pq_train,
)


def recall_at_k(got, ref):
    return sum(len(set(g) & set(r)) for g, r in zip(got, ref)) / ref.size


def test_pq_roundtrip_reduces_error(rng):
    N, D, m = 1024, 64, 8
    x = rng.standard_normal((N, D)).astype(np.float32)
    book = pq_train(jnp.asarray(x), m=m, nbits=6, n_iters=6)
    codes = pq_encode(jnp.asarray(x), book.centroids)
    assert codes.shape == (N, m) and codes.dtype == jnp.uint8
    recon = np.asarray(pq_decode(codes, book.centroids))
    err = np.mean(np.sum((x - recon) ** 2, axis=1))
    base = np.mean(np.sum(x**2, axis=1))
    assert err < 0.7 * base  # quantization must explain a chunk of variance


def test_pq_codes_use_codebook_range(rng):
    x = rng.standard_normal((512, 32)).astype(np.float32)
    book = pq_train(jnp.asarray(x), m=4, nbits=4, n_iters=4)
    codes = np.asarray(pq_encode(jnp.asarray(x), book.centroids))
    assert codes.max() < 16
    assert len(np.unique(codes)) > 4  # uses a spread of the codebook


def test_pq_adc_recall_vs_exact(rng):
    N, D, m, B, k = 2048, 64, 16, 4, 10
    # clustered data so PQ has structure to capture
    centers = rng.standard_normal((32, D)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 32, N)] +
         rng.standard_normal((N, D)).astype(np.float32) * 0.5)
    q = x[rng.choice(N, B, replace=False)] + 0.05
    book = pq_train(jnp.asarray(x), m=m, nbits=8, n_iters=8)
    codes = pq_encode(jnp.asarray(x), book.centroids)
    bias = jnp.zeros((N,), jnp.float32)
    s, i = pq_adc_topk(jnp.asarray(q), codes, book.centroids, bias, k, tile_n=512)
    exact = np.asarray(jnp.asarray(q) @ jnp.asarray(x).T)
    ref_i = np.argsort(-exact, axis=1)[:, :k]
    assert recall_at_k(np.asarray(i), ref_i) >= 0.5  # ADC-only, no rescore


def test_pq_adc_respects_bias(rng):
    N, D, m = 256, 32, 4
    x = rng.standard_normal((N, D)).astype(np.float32)
    book = pq_train(jnp.asarray(x), m=m, nbits=4, n_iters=4)
    codes = pq_encode(jnp.asarray(x), book.centroids)
    bias = np.zeros((N,), np.float32)
    bias[:128] = -1e30  # tombstone the first half
    s, i = pq_adc_topk(jnp.asarray(x[:2]), codes, book.centroids,
                       jnp.asarray(bias), 5, tile_n=256)
    assert (np.asarray(i) >= 128).all()


def test_pq_encode_tiled_matches_flat(rng):
    # the streaming row-tiled encoder must agree with the single-tile
    # path across a non-divisible tile boundary
    import jax.numpy as jnp

    from codegraph_tpu.ops.pq import pq_encode, pq_train

    x = rng.standard_normal((700, 32)).astype(np.float32)
    books = pq_train(jnp.asarray(x[:512]), m=8, nbits=6, n_iters=4).centroids
    flat = pq_encode(jnp.asarray(x), books, tile_n=1024)   # single tile
    tiled = pq_encode(jnp.asarray(x), books, tile_n=256)   # 3 tiles + pad
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(tiled))


# -- OPQ (ops/opq.py): learned rotation + vmapped subspace training ---------


def test_pq_train_batched_matches_sequential_quality(rng):
    from codegraph_tpu.ops.opq import pq_distortion, pq_train_batched

    N, D, m = 2048, 64, 8
    centers = rng.standard_normal((32, D)).astype(np.float32) * 2
    x = jnp.asarray(centers[rng.integers(0, 32, N)] +
                    rng.standard_normal((N, D)).astype(np.float32) * 0.3)
    seq = pq_train(x, m=m, nbits=5, n_iters=6)
    bat = pq_train_batched(x, m=m, nbits=5, n_iters=6, tile_n=512)
    d_seq = pq_distortion(x, seq)
    d_bat = pq_distortion(x, bat)
    # same algorithm, different init draws: within 15% of each other
    assert d_bat <= 1.15 * d_seq


def test_pq_train_batched_pads_non_divisible_rows(rng):
    from codegraph_tpu.ops.opq import pq_train_batched

    x = jnp.asarray(rng.standard_normal((700, 32)).astype(np.float32))
    books = pq_train_batched(x, m=4, nbits=4, n_iters=3, tile_n=256)
    assert books.centroids.shape == (4, 16, 8)
    assert bool(jnp.all(jnp.isfinite(books.centroids)))


def test_opq_rotation_is_orthogonal(rng):
    from codegraph_tpu.ops.opq import opq_train

    x = jnp.asarray(rng.standard_normal((1024, 32)).astype(np.float32))
    rot, books = opq_train(x, m=4, nbits=4, n_iters=3, pq_iters=2,
                           final_pq_iters=3)
    eye = np.asarray(rot.T @ rot)
    np.testing.assert_allclose(eye, np.eye(32), atol=1e-4)
    assert books.centroids.shape == (4, 16, 8)


def test_opq_beats_plain_pq_on_anisotropic_data(rng):
    from codegraph_tpu.ops.opq import opq_train, pq_distortion, \
        pq_train_batched

    # variance concentrated in a few mixed directions: fixed contiguous
    # subspaces are the worst case, a rotation recovers most of it
    N, D, m = 4096, 64, 8
    z = rng.standard_normal((N, D)).astype(np.float32)
    scale = np.exp(-np.arange(D) / 8.0).astype(np.float32)  # fast decay
    mix = np.linalg.qr(rng.standard_normal((D, D)))[0].astype(np.float32)
    x = jnp.asarray((z * scale) @ mix)
    plain = pq_train_batched(x, m=m, nbits=4, n_iters=6, tile_n=512)
    rot, books = opq_train(x, m=m, nbits=4, n_iters=4, pq_iters=2,
                           final_pq_iters=6)
    d_plain = pq_distortion(x, plain)
    d_opq = pq_distortion(x @ rot, books)
    assert d_opq < 0.9 * d_plain  # >=10% distortion cut
