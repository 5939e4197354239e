import numpy as np
import pytest

from codegraph_tpu.core.errors import DimensionMismatch
from codegraph_tpu.index.flat import FlatIndex


def cosine_oracle(q, x, k, live_mask=None):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    s = qn @ xn.T
    if live_mask is not None:
        s = np.where(live_mask[None, :], s, -np.inf)
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_flat_index_recall_exact(rng):
    N, D, B, k = 1000, 64, 5, 10
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    idx = FlatIndex(D, metric="cosine", tile_n=256, backend="xla")
    rows = idx.add(x)
    assert len(idx) == N
    np.testing.assert_array_equal(rows, np.arange(N))
    s, i = idx.search(q, k)
    _, ref_i = cosine_oracle(q, x, k)
    np.testing.assert_array_equal(i, ref_i)  # recall@k == 1.0 (exact)


def test_flat_index_delete_tombstones(rng):
    N, D, k = 300, 32, 5
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((2, D)).astype(np.float32)
    idx = FlatIndex(D, tile_n=128, backend="xla")
    idx.add(x)
    dead = np.arange(0, 100)
    idx.delete(dead)
    assert len(idx) == 200
    s, i = idx.search(q, k)
    assert (i >= 100).all()
    live = np.ones(N, bool)
    live[dead] = False
    _, ref_i = cosine_oracle(q, x, k, live)
    np.testing.assert_array_equal(i, ref_i)


def test_flat_index_incremental_add(rng):
    D, k = 48, 3
    idx = FlatIndex(D, tile_n=128, backend="xla")
    a = rng.standard_normal((100, D)).astype(np.float32)
    b = rng.standard_normal((200, D)).astype(np.float32)
    idx.add(a)
    rows_b = idx.add(b)
    np.testing.assert_array_equal(rows_b, np.arange(100, 300))
    q = b[:3]
    s, i = idx.search(q, k)
    # each query should find itself first (cosine self-sim == 1)
    np.testing.assert_array_equal(i[:, 0], rows_b[:3])
    assert np.allclose(s[:, 0], 1.0, atol=5e-3)


def test_flat_index_k_larger_than_corpus(rng):
    D = 16
    idx = FlatIndex(D, tile_n=128, backend="xla")
    idx.add(rng.standard_normal((3, D)).astype(np.float32))
    s, i = idx.search(rng.standard_normal((1, D)).astype(np.float32), 10)
    assert i.shape == (1, 10)
    assert (i[0, :3] >= 0).all()
    assert (i[0][s[0] < -1e29] == -1).all()


def test_flat_index_empty_search(rng):
    idx = FlatIndex(8, backend="xla")
    s, i = idx.search(rng.standard_normal((2, 8)).astype(np.float32), 4)
    assert (i == -1).all()


def test_flat_index_dim_mismatch(rng):
    idx = FlatIndex(8, backend="xla")
    with pytest.raises(DimensionMismatch):
        idx.add(rng.standard_normal((2, 9)).astype(np.float32))


def test_flat_index_pallas_backend_matches_xla(rng):
    N, D, B, k = 512, 128, 8, 10
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    idx = FlatIndex(D, tile_n=256, backend="xla")
    idx.add(x)
    s_x, i_x = idx.search(q, k, backend="xla")
    s_p, i_p = idx.search(q, k, backend="pallas")
    np.testing.assert_array_equal(i_x, i_p)
    np.testing.assert_allclose(s_x, s_p, rtol=2e-3, atol=1e-3)


def test_flat_index_bfloat16_storage(rng):
    N, D, k = 256, 64, 5
    x = rng.standard_normal((N, D)).astype(np.float32)
    idx = FlatIndex(D, dtype="bfloat16", tile_n=128, backend="xla")
    idx.add(x)
    q = x[:2]
    s, i = idx.search(q, k)
    # bf16 quantization noise, but self-hit must survive
    assert i[0, 0] == 0 and i[1, 0] == 1


def test_reserve_presizes_capacity():
    from codegraph_tpu.index.flat import FlatIndex

    idx = FlatIndex(16, metric="cosine", tile_n=64)
    idx.reserve(200)
    cap = idx.capacity
    assert cap >= 200
    rng = np.random.default_rng(0)
    for _ in range(4):
        idx.add(rng.standard_normal((50, 16)).astype(np.float32))
    assert idx.capacity == cap  # no growth happened
    assert len(idx) == 200
    s, i = idx.search(np.asarray(idx.get_vectors(np.arange(3))), 1)
    np.testing.assert_array_equal(i[:, 0], np.arange(3))
