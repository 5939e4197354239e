"""Oracle tests: streaming top-k (XLA + Pallas) vs NumPy exact search.

Analogue of the reference's exact-search oracle strategy
(SURVEY.md section 4: hermetic recall tests vs a NumPy oracle).
"""

import numpy as np
import pytest

from codegraph_tpu.ops.topk import (
    NEG_INF,
    exact_topk,
    merge_topk,
    streaming_topk,
    streaming_topk_pallas,
)


def numpy_topk(q, x, k, bias=None):
    s = q.astype(np.float32) @ x.astype(np.float32).T
    if bias is not None:
        s = s + bias[None, :]
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def _assert_topk_match(scores, ids, ref_scores, ref_ids):
    # XLA matmul accumulation order differs from NumPy: allow ~1e-3 relative
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=8e-3, atol=2e-3)


@pytest.mark.parametrize("B,N,D,k", [(4, 512, 128, 10), (8, 1024, 384, 7)])
def test_streaming_topk_matches_oracle(rng, B, N, D, k):
    q = rng.standard_normal((B, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    bias = np.zeros(N, np.float32)
    ref_s, ref_i = numpy_topk(q, x, k)
    s, i = streaming_topk(q, x, bias, k, tile_n=256)
    _assert_topk_match(s, i, ref_s, ref_i)
    # no ties in random data -> ids should match exactly
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_streaming_topk_respects_bias(rng):
    B, N, D, k = 2, 256, 64, 5
    q = rng.standard_normal((B, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    bias = np.zeros(N, np.float32)
    dead = rng.choice(N, size=50, replace=False)
    bias[dead] = float(NEG_INF)
    s, i = streaming_topk(q, x, bias, k, tile_n=128)
    assert not np.isin(np.asarray(i), dead).any()
    ref_s, ref_i = numpy_topk(q, x, k, bias)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_exact_topk_matches_oracle(rng):
    B, N, D, k = 3, 200, 32, 4
    q = rng.standard_normal((B, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    ref_s, ref_i = numpy_topk(q, x, k)
    s, i = exact_topk(q, x, k)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_merge_topk(rng):
    B, k = 2, 4
    s_a = np.array([[9.0, 7.0, 5.0, 3.0], [8.0, 6.0, 4.0, 2.0]], np.float32)
    i_a = np.array([[0, 1, 2, 3], [4, 5, 6, 7]], np.int32)
    s_b = np.array([[10.0, 6.0, 1.0, 0.0], [7.0, 5.0, 3.0, 1.0]], np.float32)
    i_b = np.array([[10, 11, 12, 13], [14, 15, 16, 17]], np.int32)
    s, i = merge_topk(s_a, i_a, s_b, i_b, k)
    np.testing.assert_array_equal(np.asarray(s)[0], [10.0, 9.0, 7.0, 6.0])
    np.testing.assert_array_equal(np.asarray(i)[0], [10, 0, 1, 11])


@pytest.mark.parametrize("B,N,D,k", [(8, 512, 128, 10)])
def test_pallas_topk_matches_oracle(rng, B, N, D, k):
    q = rng.standard_normal((B, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    bias = np.zeros(N, np.float32)
    ref_s, ref_i = numpy_topk(q, x, k)
    s, i = streaming_topk_pallas(q, x, bias, k, tile_n=256, tile_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=8e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_pallas_topk_bias_and_multitile(rng):
    B, N, D, k = 16, 768, 64, 6
    q = rng.standard_normal((B, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    bias = np.zeros(N, np.float32)
    bias[100:300] = float(NEG_INF)
    ref_s, ref_i = numpy_topk(q, x, k, bias)
    s, i = streaming_topk_pallas(q, x, bias, k, tile_n=256, tile_b=8, interpret=True)
    i = np.asarray(i)
    assert not ((i >= 100) & (i < 300)).any()  # dead rows never surface
    # precision-induced near-tie swaps allowed: every picked id's true score
    # must be within tolerance of the k-th best true score
    sr = q @ x.T + bias[None, :]
    picked_true = np.take_along_axis(sr, i, axis=1)
    kth_true = ref_s[:, -1:]
    assert (picked_true >= kth_true - 0.06).all()


def test_qmajor_pallas_matches_exact(rng):
    import jax.numpy as jnp

    from codegraph_tpu.ops.topk import exact_topk, streaming_topk_pallas_qmajor

    N, D, B, k = 768, 64, 64, 7
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    bias = np.zeros((N,), np.float32)
    bias[:100] = -1e30  # tombstones respected
    se, ie = exact_topk(jnp.asarray(q), jnp.asarray(x), k, jnp.asarray(bias))
    sp, ip = streaming_topk_pallas_qmajor(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(bias), k,
        tile_n=256, tile_b=16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(ip))
    np.testing.assert_allclose(np.asarray(se), np.asarray(sp), atol=1e-4)


def test_qmajor_xt_pallas_matches_exact(rng):
    import jax.numpy as jnp

    from codegraph_tpu.ops.topk import (
        exact_topk,
        streaming_topk_pallas_qmajor_xt,
    )

    N, D, B, k = 768, 64, 64, 7
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    bias = np.zeros((N,), np.float32)
    bias[:100] = -1e30
    se, ie = exact_topk(jnp.asarray(q), jnp.asarray(x), k, jnp.asarray(bias))
    sp, ip = streaming_topk_pallas_qmajor_xt(
        jnp.asarray(q), jnp.asarray(np.ascontiguousarray(x.T)),
        jnp.asarray(bias), k, tile_n=256, tile_b=16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(ip))
    np.testing.assert_allclose(np.asarray(se), np.asarray(sp), atol=1e-4)


def test_pallas_topk_same_lane_position_collisions(rng):
    """Adversarial case for the lane-reduced merge: multiple top-k entries
    share a 128-lane position inside ONE tile (ids congruent mod 128), so
    the per-lane maxima alone cannot cover them and the kernel must take
    the hidden-candidate (m2) fallback to stay exact."""
    from codegraph_tpu.ops.topk import streaming_topk_pallas_qmajor

    N, D, B, k = 1024, 64, 8, 8
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    x = 0.001 * rng.standard_normal((N, D)).astype(np.float32)
    mults = [10.0, 9.5, 9.0, 8.5, 8.0, 7.5, 7.0, 6.5]
    for b in range(B):
        for j, mult in enumerate(mults):
            # lane position b in every 128-slice; ids b and 128+b fall in
            # the SAME 256-wide tile
            x[(j * 128 + b) % N] += mult * q[b]
    bias = np.zeros(N, np.float32)
    ref_s, ref_i = numpy_topk(q, x, k)
    s, i = streaming_topk_pallas(q, x, bias, k, tile_n=256, tile_b=8,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=8e-3, atol=2e-3)
    s, i = streaming_topk_pallas_qmajor(q, x, bias, k, tile_n=256, tile_b=8,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_pallas_topk_underfilled_rows(rng):
    """Fewer live rows than k: dead rows never surface, ids pad with -1."""
    N, D, B, k = 256, 32, 8, 10
    q = rng.standard_normal((B, D)).astype(np.float32)
    x = rng.standard_normal((N, D)).astype(np.float32)
    bias = np.full(N, float(NEG_INF), np.float32)
    live = [3, 40, 200]
    for r in live:
        bias[r] = 0.0
    s, i = streaming_topk_pallas(q, x, bias, k, tile_n=128, tile_b=8,
                                 interpret=True)
    i = np.asarray(i)
    assert set(i[:, :3].ravel()) <= set(live)
    assert (i[:, 3:] == -1).all()


def test_qres_pallas_matches_exact(rng):
    import jax.numpy as jnp

    from codegraph_tpu.ops.topk import exact_topk, streaming_topk_pallas_qres

    N, D, B, k = 768, 64, 64, 7
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    bias = np.zeros((N,), np.float32)
    bias[:100] = -1e30
    se, ie = exact_topk(jnp.asarray(q), jnp.asarray(x), k, jnp.asarray(bias))
    sp, ip = streaming_topk_pallas_qres(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(bias), k,
        tile_n=256, tile_b=16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(ip))
    np.testing.assert_allclose(np.asarray(se), np.asarray(sp), atol=1e-4)


def test_int8_qres_matches_qmajor(rng):
    import jax.numpy as jnp

    from codegraph_tpu.ops.quantize import (
        quantize_rows,
        streaming_topk_int8_qmajor,
        streaming_topk_int8_qres,
    )

    N, D, B, k = 512, 64, 32, 5
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    bias = np.zeros((N,), np.float32)
    xv, xs = quantize_rows(x)
    qv, qs = quantize_rows(q)
    s1, i1 = streaming_topk_int8_qmajor(qv, qs, xv, xs, jnp.asarray(bias),
                                        k, tile_n=256, tile_b=16,
                                        interpret=True)
    s2, i2 = streaming_topk_int8_qres(qv, qs, xv, xs, jnp.asarray(bias),
                                      k, tile_n=256, tile_b=16,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
