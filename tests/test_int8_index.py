import numpy as np
import pytest

from codegraph_tpu.index.int8_flat import Int8FlatIndex
from codegraph_tpu.ops.quantize import dequantize_rows, quantize_rows


def cosine_oracle(q, x, k, live_mask=None):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    s = qn @ xn.T
    if live_mask is not None:
        s = np.where(live_mask[None, :], s, -np.inf)
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def recall_at_k(got, ref):
    hits = sum(len(set(g) & set(r)) for g, r in zip(got, ref))
    return hits / ref.size


def test_quantize_roundtrip(rng):
    x = rng.standard_normal((64, 128)).astype(np.float32)
    q, s = quantize_rows(x)
    x2 = np.asarray(dequantize_rows(q, s))
    # per-row symmetric int8: max abs error is scale/2 = absmax/254
    err = np.abs(x - x2)
    bound = np.abs(x).max(axis=1, keepdims=True) / 254 + 1e-6
    assert (err <= bound).all()


def test_quantize_zero_row(rng):
    x = np.zeros((4, 32), np.float32)
    q, s = quantize_rows(x)
    assert (np.asarray(q) == 0).all()
    assert (np.asarray(s) == 0).all()


def test_int8_index_recall_with_rescore(rng):
    N, D, B, k = 2000, 128, 8, 10
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    idx = Int8FlatIndex(D, rescore_dtype="float32", rescore_k=100, tile_n=256)
    idx.add(x)
    s, i = idx.search(q, k)
    ref_s, ref_i = cosine_oracle(q, x, k)
    # int8 scan + f32 rescore of top-100 must reach near-perfect recall@10
    assert recall_at_k(i, ref_i) >= 0.99
    # rescored scores are exact f32 cosine for the rows they rank
    hit = i[:, 0] == ref_i[:, 0]
    np.testing.assert_allclose(s[hit, 0], ref_s[hit, 0], atol=1e-3)


def test_int8_index_no_rescore_still_decent(rng):
    N, D, B, k = 1000, 64, 4, 10
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    idx = Int8FlatIndex(D, rescore_dtype=None, tile_n=256)
    idx.add(x)
    s, i = idx.search(q, k)
    _, ref_i = cosine_oracle(q, x, k)
    assert recall_at_k(i, ref_i) >= 0.9


def test_int8_index_delete_and_selfhit(rng):
    N, D, k = 600, 64, 5
    x = rng.standard_normal((N, D)).astype(np.float32)
    idx = Int8FlatIndex(D, rescore_dtype="bfloat16", tile_n=256)
    idx.add(x)
    idx.delete(np.arange(0, 200))
    assert len(idx) == 400
    s, i = idx.search(x[200:204], k)
    assert (i >= 200).all()
    np.testing.assert_array_equal(i[:, 0], np.arange(200, 204))


def test_int8_index_incremental_capacity_growth(rng):
    D = 32
    idx = Int8FlatIndex(D, rescore_dtype="float32", tile_n=128)
    for start in range(0, 600, 200):
        rows = idx.add(rng.standard_normal((200, D)).astype(np.float32))
        np.testing.assert_array_equal(rows, np.arange(start, start + 200))
    assert len(idx) == 600
    assert idx.capacity >= 600


def test_int8_index_empty(rng):
    idx = Int8FlatIndex(16)
    s, i = idx.search(rng.standard_normal((2, 16)).astype(np.float32), 3)
    assert (i == -1).all()


def test_int8_index_prealloc_chunked_matches_oneshot(rng):
    # the donated _flat_write must place chunk c at offset c*chunk in a
    # reserved bank: chunked adds == one-shot add, with and without the
    # rescore copy (the 10M build path adds 80 chunks into one reserve)
    x = rng.standard_normal((300, 64)).astype(np.float32)
    q = rng.standard_normal((5, 64)).astype(np.float32)
    for dtype in (None, "bfloat16"):
        one = Int8FlatIndex(64, rescore_dtype=dtype, rescore_k=20)
        one.add(x)
        chunked = Int8FlatIndex(64, rescore_dtype=dtype, rescore_k=20)
        chunked.reserve(300)
        for lo in range(0, 300, 100):
            chunked.add(x[lo:lo + 100])
        s1, i1 = one.search(q, 10)
        s2, i2 = chunked.search(q, 10)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-6)
