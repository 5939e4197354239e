"""IVF-PQ (index/ivfpq.py): residual-quantized cells — compression
ratio, recall vs the exact oracle, full-probe behavior, tombstones."""

import numpy as np
import pytest

from codegraph_tpu.core.errors import IndexNotBuilt
from codegraph_tpu.index.ivfpq import IVFPQIndex

from tests.test_ivf_index import clustered_data, cosine_oracle, recall_at_k


def test_ivfpq_full_probe_recall(rng):
    # nprobe == nlist leaves only PQ quantization error: top-1 self-hits
    # are exact, tail ranking degrades gracefully (~0.7 on random data
    # where neighbor margins are at chance level)
    x = rng.standard_normal((800, 64)).astype(np.float32)
    q = x[:8] + rng.standard_normal((8, 64)).astype(np.float32) * 0.01
    idx = IVFPQIndex(64, nlist=16, nprobe=16, m=16, kmeans_iters=5,
                     pq_iters=8)
    idx.train(x)
    idx.add(x)
    s, i = idx.search(q, 10)
    _, ref_i = cosine_oracle(q, x, 10)
    assert recall_at_k(i, ref_i) >= 0.6
    assert (i[:, 0] == np.arange(8)).all()  # near-duplicate self-hit


def test_ivfpq_refine_restores_recall(rng):
    # within tight clusters PQ residual distortion is on the order of
    # the neighbor margins; the host rescore of the candidate set
    # restores fine ranking (FAISS-refine recipe). This synthetic set
    # has neighbor margins ~1e-4 — below int8 resolution (~4e-3), so
    # the f32 refine tier is the one that recovers the exact ranking.
    x = clustered_data(rng, 32, 64, 48)  # 2048 points
    q = x[rng.choice(len(x), 8, replace=False)] + 0.01
    _, ref_i = cosine_oracle(q, x, 10)

    plain = IVFPQIndex(48, nlist=32, nprobe=8, m=12, kmeans_iters=8,
                       pq_iters=8)
    plain.train(x)
    plain.add(x)
    _, i_plain = plain.search(q, 10)

    refined = IVFPQIndex(48, nlist=32, nprobe=8, m=12, kmeans_iters=8,
                         pq_iters=8, refine="f32", refine_factor=16)
    refined.train(x)
    refined.add(x)
    _, i_ref = refined.search(q, 10)

    r_plain = recall_at_k(i_plain, ref_i)
    r_ref = recall_at_k(i_ref, ref_i)
    assert r_ref >= 0.85
    assert r_ref >= r_plain
    st = refined.stats()
    assert st["refine"] == "f32" and st["host_bytes_per_row"] == 192

    # int8 refine: same recipe, 4x less host RAM, margin floor ~4e-3
    r8 = IVFPQIndex(48, nlist=32, nprobe=8, m=12, kmeans_iters=8,
                    pq_iters=8, refine="int8", refine_factor=16)
    r8.train(x)
    r8.add(x)
    _, i8 = r8.search(q, 10)
    assert r8.stats()["host_bytes_per_row"] == 52
    assert recall_at_k(i8, ref_i) >= r_plain - 0.05


def test_ivfpq_compression_and_stats(rng):
    x = rng.standard_normal((512, 64)).astype(np.float32)
    idx = IVFPQIndex(64, nlist=8, nprobe=8, m=8, kmeans_iters=4, pq_iters=4)
    idx.train(x)
    idx.add(x)
    st = idx.stats()
    assert st["m"] == 8 and st["bytes_per_row"] == 16
    # cells hold uint8 codes, not vectors: 8 bytes/row vs 256,
    # subspace-major [nlist, m, cap] for the Pallas lane-gather ADC
    assert idx._x.dtype == np.uint8
    assert idx._x.shape[:2] == (8, 8)
    assert idx._x.shape[2] == idx.list_cap and idx.list_cap % 128 == 0


def test_ivfpq_delete_tombstones(rng):
    x = rng.standard_normal((400, 32)).astype(np.float32)
    q = x[:4] + 0.001
    idx = IVFPQIndex(32, nlist=8, nprobe=8, m=8, kmeans_iters=4, pq_iters=6)
    idx.train(x)
    rows = idx.add(x)
    _, i0 = idx.search(q, 1)
    assert (i0[:, 0] == np.arange(4)).all()
    idx.delete(rows[:4])
    _, i1 = idx.search(q, 5)
    assert not np.isin(np.arange(4), i1).any()
    assert len(idx) == 396


def test_ivfpq_add_before_train_raises(rng):
    idx = IVFPQIndex(16, nlist=4, m=4)
    with pytest.raises(IndexNotBuilt):
        idx.add(rng.standard_normal((8, 16)).astype(np.float32))


def test_ivfpq_dim_not_divisible_raises():
    with pytest.raises(ValueError):
        IVFPQIndex(65, nlist=4, m=4)


def test_ivfpq_nprobe_sweep_monotone(rng):
    x = clustered_data(rng, 16, 32, 32)
    q = x[rng.choice(len(x), 8, replace=False)] + 0.01
    idx = IVFPQIndex(32, nlist=16, m=8, kmeans_iters=5, pq_iters=6)
    idx.train(x)
    idx.add(x)
    _, ref_i = cosine_oracle(q, x, 10)
    recalls = []
    for nprobe in (1, 4, 16):
        _, i = idx.search(q, 10, nprobe=nprobe)
        recalls.append(recall_at_k(i, ref_i))
    assert recalls[-1] >= recalls[0] - 1e-9


def test_ivfpq_batch_shared_matches_per_query(rng):
    # decode-then-dot == coarse + ADC: the batch-shared kernel must
    # return the same candidates/scores as the per-query gather kernel
    x = clustered_data(rng, 16, 48, 32)
    q = x[rng.choice(len(x), 16, replace=False)] + 0.01
    idx = IVFPQIndex(32, nlist=16, nprobe=4, m=8, kmeans_iters=5,
                     pq_iters=6)
    idx.train(x)
    idx.add(x)
    s_a, i_a = idx.search(q, 10)
    s_b, i_b = idx.search_batch(q, 10, tile_u=4)
    np.testing.assert_allclose(s_b, s_a, atol=1e-4)
    # ids may swap within score ties; compare as multisets per row
    for ra, rb in zip(i_a, i_b):
        assert set(ra) == set(rb)


def test_ivfpq_batch_shared_with_refine(rng):
    x = clustered_data(rng, 16, 48, 32)
    q = x[rng.choice(len(x), 16, replace=False)] + 0.005
    idx = IVFPQIndex(32, nlist=16, nprobe=8, m=8, kmeans_iters=5,
                     pq_iters=6, refine="f32", refine_factor=8)
    idx.train(x)
    idx.add(x)
    s1, i1 = idx.search(q, 10)
    s2, i2 = idx.search_batch(q, 10, tile_u=4)
    np.testing.assert_allclose(s2, s1, atol=1e-4)
    for ra, rb in zip(i1, i2):
        assert set(ra) == set(rb)


def test_ivfpq_batch_shared_tombstones(rng):
    x = rng.standard_normal((400, 32)).astype(np.float32)
    q = x[:4] + 0.001
    idx = IVFPQIndex(32, nlist=8, nprobe=8, m=8, kmeans_iters=4, pq_iters=6)
    idx.train(x)
    rows = idx.add(x)
    idx.delete(rows[:4])
    _, i = idx.search_batch(q, 5, tile_u=4)
    assert not np.isin(np.arange(4), i).any()


def test_ivfpq_pallas_kernel_matches_xla(rng):
    """The per-cell-DMA Pallas ADC kernel (interpret mode) must produce
    the same candidates and scores as the XLA reference path."""
    from codegraph_tpu.index.ivfpq import (
        ivfpq_search_kernel,
        ivfpq_search_pallas,
    )

    x = rng.standard_normal((900, 64)).astype(np.float32)
    q = rng.standard_normal((6, 64)).astype(np.float32)
    idx = IVFPQIndex(64, nlist=8, nprobe=4, m=16, kmeans_iters=4,
                     pq_iters=4)
    idx.train(x)
    idx.add(x)
    idx.delete(np.arange(10))  # tombstones must stay dead in both paths
    import jax.numpy as jnp
    from codegraph_tpu.ops.similarity import l2_normalize

    qn = l2_normalize(jnp.asarray(q))
    s_ref, i_ref = ivfpq_search_kernel(
        qn, idx._centroids, idx._x, idx._ids, idx._bias, idx._books, 10, 4)
    s_pl, i_pl = ivfpq_search_pallas(
        qn, idx._centroids, idx._x, idx._ids, idx._bias, idx._books, 10, 4,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_ref), rtol=1e-4, atol=1e-4)
    assert (np.asarray(i_pl) == np.asarray(i_ref)).all()


def test_ivfpq_pallas_routing_flag(rng):
    """use_pallas='interpret' routes search() through the Pallas kernel
    end-to-end (including refine) with identical results to the XLA path."""
    x = rng.standard_normal((600, 32)).astype(np.float32)
    q = x[:5] + 0.001
    idx = IVFPQIndex(32, nlist=8, nprobe=8, m=8, kmeans_iters=4, pq_iters=4,
                     refine="int8")
    idx.train(x)
    idx.add(x)
    idx.use_pallas = False
    s_x, i_x = idx.search(q, 5)
    idx.use_pallas = "interpret"
    s_p, i_p = idx.search(q, 5)
    assert (i_x == i_p).all()
    np.testing.assert_allclose(s_x, s_p, rtol=1e-4, atol=1e-4)
    assert (i_p[:, 0] == np.arange(5)).all()


def test_ivfpq_device_refine_matches_host_int8(rng):
    """refine="int8_device" (HBM-resident rows + on-device rescore) must
    rank like the host int8 refine — same quantizer, different venue —
    across both the per-query and batch-shared paths, incremental adds,
    and deletes."""
    x = clustered_data(rng, 32, 64, 48)  # 2048 points
    q = x[rng.choice(len(x), 8, replace=False)] + 0.01
    _, ref_i = cosine_oracle(q, x, 10)

    host = IVFPQIndex(48, nlist=32, nprobe=8, m=12, kmeans_iters=8,
                      pq_iters=8, refine="int8", refine_factor=16)
    host.train(x)
    host.add(x)
    s_h, i_h = host.search(q, 10)

    dev = IVFPQIndex(48, nlist=32, nprobe=8, m=12, kmeans_iters=8,
                     pq_iters=8, refine="int8_device", refine_factor=16)
    dev.train(x)
    dev.add(x[:1024])  # incremental adds -> multiple device chunks
    dev.add(x[1024:])
    s_d, i_d = dev.search(q, 10)

    assert recall_at_k(i_d, ref_i) >= recall_at_k(i_h, ref_i) - 0.05
    # same quantizer -> (near-)identical candidate rankings
    agree = np.mean([len(set(a) & set(b)) / 10.0
                     for a, b in zip(i_d, i_h)])
    assert agree >= 0.9
    st = dev.stats()
    assert st["host_bytes_per_row"] == 0
    assert st["hbm_refine_bytes_per_row"] == 52

    # batch-shared path returns the same thing
    s_b, i_b = dev.search_batch(q, 10)
    agree_b = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(i_b, i_d)])
    assert agree_b >= 0.9

    # deletes: tombstoned rows never resurface through the refine gather
    victim = int(i_d[0, 0])
    dev.delete(np.array([victim]))
    _, i_after = dev.search(q, 10)
    assert victim not in i_after[0]


def test_ivfpq_device_refine_prealloc_bank_matches_append(rng):
    """reserve() preallocates the int8_device bank; in-place (donated)
    writes at global-row offsets must produce the same refine results
    as the append/lazy-concat path, across chunked adds, growth past
    the reservation, deletes, and snapshot publish/attach."""
    import os
    import tempfile

    from codegraph_tpu.index.snapshot import (
        attach_index_shm, publish_index_shm)

    x = clustered_data(rng, 32, 64, 48)  # 2048 points
    q = x[rng.choice(len(x), 8, replace=False)] + 0.01

    def build(prealloc_rows=None, chunks=(1024, 1024)):
        idx = IVFPQIndex(48, nlist=32, nprobe=8, m=12, kmeans_iters=8,
                         pq_iters=8, refine="int8_device",
                         refine_factor=16)
        idx.train(x)
        if prealloc_rows is not None:
            idx.reserve(prealloc_rows)
            assert idx._dev_prealloc
            assert idx._dev_chunks[0].shape[0] >= prealloc_rows
        lo = 0
        for n in chunks:
            idx.add(x[lo:lo + n])
            lo += n
        return idx

    base = build(None)                       # append mode (legacy)
    pre = build(len(x))                      # exact reservation
    grow = build(1024, chunks=(512, 512, 1024))  # overflows reservation

    s0, i0 = base.search(q, 10)
    for idx in (pre, grow):
        assert len(idx._dev_chunks) == 1
        s1, i1 = idx.search(q, 10)
        np.testing.assert_array_equal(i1, i0)
        np.testing.assert_allclose(s1, s0, rtol=1e-5, atol=1e-5)

    # deletes still mask through the preallocated bank
    victim = int(i0[0, 0])
    pre.delete(np.array([victim]))
    _, i_after = pre.search(q, 10)
    assert victim not in i_after[0]

    # publish slices prealloc padding off; attach restores the device
    # bank (refine survives the shm round-trip)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "pq_dev.shm")
        pub = publish_index_shm(grow, p)
        att, _ = attach_index_shm(p)
        try:
            assert att._dev_prealloc and len(att._dev_chunks) == 1
            assert int(att._dev_chunks[0].shape[0]) == grow.n_rows
            s2, i2 = att.search(q, 10)
            np.testing.assert_array_equal(i2, i0)
        finally:
            att_close = getattr(att, "close", None)
            if att_close:
                att_close()
            pub.close()


def test_ivfpq_opq_scores_match_unrotated_exact(rng):
    # OPQ is a global orthogonal pre-rotation: returned SCORES are still
    # cosines in the ORIGINAL space (rotation preserves dot products),
    # so top-1 self-hits and score values must line up with the oracle
    x = rng.standard_normal((800, 64)).astype(np.float32)
    q = x[:8] + rng.standard_normal((8, 64)).astype(np.float32) * 0.01
    idx = IVFPQIndex(64, nlist=16, nprobe=16, m=16, kmeans_iters=5,
                     pq_iters=4, opq=True, opq_iters=3,
                     refine="f32", refine_factor=8)
    idx.train(x)
    idx.add(x)
    s, i = idx.search(q, 10)
    ref_s, ref_i = cosine_oracle(q, x, 10)
    assert (i[:, 0] == np.arange(8)).all()
    # refine=f32 rescores exactly (in rotated space == original space)
    np.testing.assert_allclose(s[:, 0], ref_s[:, 0], atol=1e-3)
    assert idx.stats()["opq"] is True


def test_ivfpq_opq_improves_adc_on_anisotropic_residuals(rng):
    # residuals with mixed, decaying variance: fixed subspaces lose
    # ranking signal that the learned rotation recovers (ADC-only recall)
    N, D = 4096, 64
    centers = rng.standard_normal((8, D)).astype(np.float32) * 4
    scale = np.exp(-np.arange(D) / 6.0).astype(np.float32)
    mix = np.linalg.qr(rng.standard_normal((D, D)))[0].astype(np.float32)
    noise = (rng.standard_normal((N, D)).astype(np.float32) * scale) @ mix
    x = centers[rng.integers(0, 8, N)] + noise
    q = x[rng.choice(N, 16, replace=False)] \
        + 0.02 * (rng.standard_normal((16, D)).astype(np.float32)
                  * scale) @ mix
    _, ref_i = cosine_oracle(q, x, 10)

    kw = dict(nlist=8, nprobe=8, m=16, nbits=4, kmeans_iters=6,
              pq_iters=6, refine="none")
    plain = IVFPQIndex(D, **kw)
    plain.train(x)
    plain.add(x)
    opq = IVFPQIndex(D, opq=True, opq_iters=4, **kw)
    opq.train(x)
    opq.add(x)
    r_plain = recall_at_k(plain.search(q, 10)[1], ref_i)
    r_opq = recall_at_k(opq.search(q, 10)[1], ref_i)
    assert r_opq >= r_plain  # rotation never hurts here, usually lifts


def test_ivfpq_opq_shm_roundtrip_preserves_rotation(rng, tmp_path):
    import os

    from codegraph_tpu.index.snapshot import (
        attach_index_shm, publish_index_shm)

    x = rng.standard_normal((600, 32)).astype(np.float32)
    q = x[:4] + 0.01
    idx = IVFPQIndex(32, nlist=8, nprobe=8, m=8, nbits=4, kmeans_iters=4,
                     pq_iters=3, opq=True, opq_iters=2)
    idx.train(x)
    idx.add(x)
    s0, i0 = idx.search(q, 5)
    p = os.path.join(tmp_path, "opq.shm")
    pub = publish_index_shm(idx, p)
    att, store = attach_index_shm(p)
    try:
        assert att._rot is not None
        s1, i1 = att.search(q, 5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, atol=1e-5)
    finally:
        store.close()
        pub.close()


def test_refine_device_tiled_matches_flat(rng):
    """The candidate-tiled exact rescore (_refine_device_tiled, used for
    the r5 big-refine-factor fetches) is bit-identical to the flat
    kernel, including -1 padding and non-multiple-of-tile widths."""
    import jax.numpy as jnp

    from codegraph_tpu.index.ivfpq import (
        _refine_device_kernel, _refine_device_tiled)

    N, D, B, R, K = 512, 32, 4, 300, 10  # R % 128 != 0 on purpose
    raw = rng.integers(-127, 128, (N, D)).astype(np.int8)
    scales = rng.random((N, 1)).astype(np.float32) * 0.01 + 1e-3
    q = rng.standard_normal((B, D)).astype(np.float32)
    i_cand = rng.integers(0, N, (B, R)).astype(np.int32)
    i_cand[:, -7:] = -1  # dead candidates
    s_cand = rng.standard_normal((B, R)).astype(np.float32)

    s_f, i_f = _refine_device_kernel(
        jnp.asarray(q), jnp.asarray(raw), jnp.asarray(scales),
        jnp.asarray(s_cand), jnp.asarray(i_cand), K)
    s_t, i_t = _refine_device_tiled(
        jnp.asarray(q), jnp.asarray(raw), jnp.asarray(scales),
        jnp.asarray(s_cand), jnp.asarray(i_cand), K)
    np.testing.assert_allclose(np.asarray(s_t), np.asarray(s_f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_f))


def test_ivfpq_pq_train_sample_caps_pq_rows(rng):
    # pq_train_sample caps only the PQ/OPQ training set (the 256-entry
    # subspace codebooks saturate early; OPQ's row-sized transients are
    # the 16GB-v5e constraint) while coarse k-means keeps train_sample.
    x = clustered_data(rng, 16, 96, 48)  # 1536 points
    q = x[rng.choice(len(x), 8, replace=False)] + 0.01
    _, ref_i = cosine_oracle(q, x, 10)
    idx = IVFPQIndex(48, nlist=16, nprobe=16, m=12, kmeans_iters=5,
                     pq_iters=6, opq=True, opq_iters=2,
                     pq_train_sample=256, refine="int8_device",
                     refine_factor=8)
    idx.train(x)
    assert idx.is_trained
    assert idx._books.shape == (12, 256, 4)
    idx.add(x)
    s, i = idx.search(q, 10)
    assert recall_at_k(i, ref_i) >= 0.6
