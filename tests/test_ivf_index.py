import numpy as np
import pytest

from codegraph_tpu.core.errors import IndexNotBuilt
from codegraph_tpu.index.ivf import IVFIndex
from codegraph_tpu.ops.kmeans import kmeans


def cosine_oracle(q, x, k, live_mask=None):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    s = qn @ xn.T
    if live_mask is not None:
        s = np.where(live_mask[None, :], s, -np.inf)
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def recall_at_k(got, ref):
    hits = sum(len(set(g) & set(r)) - (1 if -1 in set(g) & set(r) else 0)
               for g, r in zip(got, ref))
    return hits / ref.size


def clustered_data(rng, n_clusters, per_cluster, d):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4
    pts = (
        centers[:, None, :] + rng.standard_normal((n_clusters, per_cluster, d)) * 0.3
    ).reshape(-1, d).astype(np.float32)
    return pts


def test_kmeans_recovers_clusters(rng):
    x = clustered_data(rng, 8, 64, 32)
    import jax.numpy as jnp

    c, counts = kmeans(jnp.asarray(x), 8, n_iters=8, metric="cosine", tile_n=128)
    counts = np.asarray(counts)
    # all 8 cells populated, roughly balanced on well-separated clusters
    assert (counts > 0).all()
    assert counts.sum() == x.shape[0]
    assert counts.max() <= 3 * counts.min() + 64


def test_ivf_full_probe_is_exact(rng):
    # nprobe == nlist must reproduce the flat-exact ranking
    x = rng.standard_normal((800, 64)).astype(np.float32)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    idx = IVFIndex(64, nlist=16, nprobe=16, kmeans_iters=5)
    idx.train(x)
    idx.add(x)
    s, i = idx.search(q, 10)
    _, ref_i = cosine_oracle(q, x, 10)
    np.testing.assert_array_equal(np.sort(i, axis=1), np.sort(ref_i, axis=1))


def test_ivf_recall_on_clustered_data(rng):
    x = clustered_data(rng, 32, 64, 48)  # 2048 points
    q = x[rng.choice(len(x), 8, replace=False)] + 0.01
    idx = IVFIndex(48, nlist=32, nprobe=8, kmeans_iters=8)
    idx.train(x)
    idx.add(x)
    s, i = idx.search(q, 10)
    _, ref_i = cosine_oracle(q, x, 10)
    assert recall_at_k(i, ref_i) >= 0.9


def test_ivf_nprobe_sweep_monotone(rng):
    x = rng.standard_normal((1500, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    idx = IVFIndex(32, nlist=24, kmeans_iters=5)
    idx.train(x)
    idx.add(x)
    _, ref_i = cosine_oracle(q, x, 10)
    recalls = []
    for nprobe in (2, 8, 24):
        _, i = idx.search(q, 10, nprobe=nprobe)
        recalls.append(recall_at_k(i, ref_i))
    assert recalls[-1] >= recalls[0]
    assert recalls[-1] == 1.0  # full probe == exact


def test_ivf_add_before_train_raises(rng):
    idx = IVFIndex(16, nlist=4)
    with pytest.raises(IndexNotBuilt):
        idx.add(rng.standard_normal((10, 16)).astype(np.float32))


def test_ivf_delete_tombstones(rng):
    x = rng.standard_normal((400, 32)).astype(np.float32)
    idx = IVFIndex(32, nlist=8, nprobe=8, kmeans_iters=4)
    idx.train(x)
    rows = idx.add(x)
    idx.delete(rows[:100])
    assert len(idx) == 300
    s, i = idx.search(x[:4], 5)
    live = i[i >= 0]
    assert (live >= 100).all()


def test_ivf_incremental_add_and_overflow_repad(rng):
    d = 24
    base = rng.standard_normal((300, d)).astype(np.float32)
    idx = IVFIndex(d, nlist=8, nprobe=8, kmeans_iters=4, capacity_factor=1.2)
    idx.train(base)
    idx.add(base)
    cap0 = idx.list_cap
    # skewed additions near one training point force one cell to overflow
    skew = base[0] + rng.standard_normal((200, d)).astype(np.float32) * 0.05
    rows = idx.add(skew)
    assert idx.list_cap >= cap0
    s, i = idx.search(skew[:3], 5)
    assert (np.isin(rows[:3], i.ravel())).any() or (s[:, 0] > 0.9).all()
    stats = idx.stats()
    assert stats["rows"] == 500 and stats["live"] == 500
    assert 0.0 <= stats["padding_waste"] < 1.0


def test_ivf_spill_bounds_padding_waste(rng):
    """Heavy-tailed cluster sizes must not blow up list_cap (the 1M-scale
    measurement showed 87% padding waste before capacity-bounded spill)."""
    d = 32
    # one dominant cluster + spread: natural imbalance
    dominant = rng.standard_normal((1, d)).astype(np.float32) * 3
    x = np.concatenate([
        dominant + rng.standard_normal((600, d)).astype(np.float32) * 0.1,
        rng.standard_normal((200, d)).astype(np.float32),
    ]).astype(np.float32)
    idx = IVFIndex(d, nlist=16, nprobe=16, kmeans_iters=4, capacity_factor=2.0)
    idx.train(x)
    idx.add(x)
    stats = idx.stats()
    assert stats["max_fill"] <= idx.list_cap
    # waste bounded by the capacity factor (plus alignment slack)
    assert stats["padding_waste"] <= 0.65
    # full probe still finds everything despite spill
    s, i = idx.search(x[:5], 5)
    np.testing.assert_array_equal(i[:, 0], np.arange(5))


def test_ivf_batch_shared_matches_per_query(rng):
    # gather-unique-cells + MXU scoring must reproduce the per-query
    # probe kernel exactly (same probe sets, same scores)
    x = clustered_data(rng, 16, 48, 32)
    q = x[rng.choice(len(x), 16, replace=False)] + 0.01
    idx = IVFIndex(32, nlist=16, nprobe=4, kmeans_iters=5)
    idx.train(x)
    idx.add(x)
    s_a, i_a = idx.search(q, 10)
    s_b, i_b = idx.search_batch(q, 10, tile_u=4)
    np.testing.assert_allclose(s_b, s_a, atol=1e-4)
    for ra, rb in zip(i_a, i_b):
        assert set(ra) == set(rb)


def test_ivf_batch_shared_tombstones_and_empty(rng):
    x = rng.standard_normal((400, 32)).astype(np.float32)
    idx = IVFIndex(32, nlist=8, nprobe=8, kmeans_iters=4)
    s, i = idx.search_batch(x[:2], 5)  # before any add
    assert (i == -1).all()
    idx.train(x)
    rows = idx.add(x)
    idx.delete(rows[:4])
    _, i = idx.search_batch(x[:4] + 0.001, 5)
    assert not np.isin(np.arange(4), i).any()
