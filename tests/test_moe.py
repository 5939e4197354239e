"""Top-k-routed MoE with all-to-all dispatch (parallel/moe.py):
exact-match vs the dense top-k oracle at capacity -> infinity, a2a path
on the 8-device mesh, capacity dropping, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codegraph_tpu.parallel.mesh import make_mesh
from codegraph_tpu.parallel.moe import (
    init_moe_params,
    make_sharded_topk_moe,
    topk_moe_dense,
    topk_moe_dispatch,
)


@pytest.fixture
def setup(rng):
    H, F, E, T = 32, 64, 8, 64
    params = init_moe_params(jax.random.PRNGKey(0), H, F, E)
    x = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32))
    return x, params, (H, F, E, T)


def test_dispatch_matches_dense_at_high_capacity(setup):
    x, params, _ = setup
    dense = topk_moe_dense(x, params, k=2)
    disp = topk_moe_dispatch(x, params, k=2, capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_sharded_a2a_matches_dense(setup):
    """8-way ep: tokens and experts sharded, dispatch crosses the
    all_to_all — results must equal the dense oracle exactly."""
    x, params, (H, F, E, T) = setup
    mesh = make_mesh((8,), ("ep",))
    fwd = make_sharded_topk_moe(mesh, "ep", k=2, capacity_factor=8.0)
    out = fwd(x, params)
    dense = topk_moe_dense(x, params, k=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)


def test_sharded_k1_switch_routing(setup):
    x, params, _ = setup
    mesh = make_mesh((4,), ("ep",))
    fwd = make_sharded_topk_moe(mesh, "ep", k=1, capacity_factor=8.0)
    out = fwd(x, params)
    dense = topk_moe_dense(x, params, k=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)


def test_capacity_drops_tokens_not_correctness(setup):
    """Tiny capacity: overflowing tokens lose expert contributions
    (Switch semantics) — outputs stay finite and under-capacity routing
    still matches where nothing dropped."""
    x, params, (H, F, E, T) = setup
    tight = topk_moe_dispatch(x, params, k=2, capacity_factor=0.25)
    assert np.isfinite(np.asarray(tight)).all()
    dense = topk_moe_dense(x, params, k=2)
    # with drops the outputs differ
    assert not np.allclose(np.asarray(tight), np.asarray(dense))
    # dropped-token outputs are partial sums: norms bounded by dense path
    tn = np.linalg.norm(np.asarray(tight), axis=1)
    dn = np.linalg.norm(np.asarray(dense), axis=1)
    assert (tn <= dn + 1e-3).all()


def test_sharded_moe_gradients_flow(setup):
    x, params, _ = setup
    mesh = make_mesh((4,), ("ep",))
    fwd = make_sharded_topk_moe(mesh, "ep", k=2, capacity_factor=4.0)

    def loss(p):
        return jnp.sum(jnp.square(fwd(x, p)))

    g = jax.grad(loss)(params)
    for name in ("gate", "w_up_e", "w_down_e"):
        arr = np.asarray(g[name])
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0, name


# ---- in-encoder GSPMD routed MoE (models/encoder.py _moe_mlp_routed) ----

def _enc_layer_params(key, H, F, E):
    """Single-layer expert params in the encoder's per-layer shapes."""
    p = init_moe_params(key, H, F, E)
    return p


def test_encoder_routed_matches_dense_oracle(rng):
    """GShard-style grouped dispatch == dense top-k oracle per batch row
    at capacity -> inf."""
    from codegraph_tpu.models.encoder import _moe_mlp_routed

    H, F, E, B, L = 32, 64, 8, 3, 16
    params = _enc_layer_params(jax.random.PRNGKey(1), H, F, E)
    x = jnp.asarray(rng.standard_normal((B, L, H)).astype(np.float32))
    got = _moe_mlp_routed(
        x, params["gate"], params["w_up_e"], params["b_up_e"],
        params["w_down_e"], params["b_down_e"],
        top_k=2, capacity_factor=float(E),  # C = k*L: nothing drops
    )
    for b in range(B):
        want = topk_moe_dense(x[b], params, k=2)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_encoder_routed_capacity_drops(rng):
    from codegraph_tpu.models.encoder import _moe_mlp_routed

    H, F, E, B, L = 32, 64, 8, 2, 32
    params = _enc_layer_params(jax.random.PRNGKey(2), H, F, E)
    x = jnp.asarray(rng.standard_normal((B, L, H)).astype(np.float32))
    args = (x, params["gate"], params["w_up_e"], params["b_up_e"],
            params["w_down_e"], params["b_down_e"])
    tight = _moe_mlp_routed(*args, top_k=2, capacity_factor=0.25)
    loose = _moe_mlp_routed(*args, top_k=2, capacity_factor=float(E))
    assert np.isfinite(np.asarray(tight)).all()
    assert not np.allclose(np.asarray(tight), np.asarray(loose))
    # tokens that lost BOTH experts to capacity output exactly zero
    tn = np.linalg.norm(np.asarray(tight).reshape(-1, H), axis=1)
    assert (tn == 0.0).any()


def test_encoder_routed_end_to_end_sharded(rng):
    """Full encoder with moe_top_k on a dp x ep mesh == unsharded run;
    exercises the GSPMD all-to-all lowering inside lax.scan."""
    from codegraph_tpu.models.encoder import (
        EncoderConfig, encode, init_encoder_params,
    )

    cfg = EncoderConfig(vocab_size=64, hidden=32, n_layers=2, n_heads=4,
                        max_len=32, n_experts=8, moe_top_k=2,
                        moe_capacity=8.0, dtype=jnp.float32)
    params = init_encoder_params(jax.random.PRNGKey(3), cfg)
    B, L = 4, 16
    ids = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), bool)

    ref = encode(params, ids, mask, cfg)
    mesh = make_mesh((2, 4), ("dp", "ep"))
    with mesh:
        got = jax.jit(
            lambda p, i, m: encode(p, i, m, cfg, mesh=mesh,
                                   dp_axis="dp", ep_axis="ep")
        )(params, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_encoder_routed_gradients_flow(rng):
    from codegraph_tpu.models.encoder import (
        EncoderConfig, encode, init_encoder_params,
    )

    cfg = EncoderConfig(vocab_size=64, hidden=32, n_layers=1, n_heads=4,
                        max_len=16, n_experts=4, moe_top_k=2,
                        moe_capacity=4.0, dtype=jnp.float32)
    params = init_encoder_params(jax.random.PRNGKey(4), cfg)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), bool)

    g = jax.grad(lambda p: jnp.sum(encode(p, ids, mask, cfg)))(params)
    for name in ("gate", "w_up_e", "w_down_e"):
        arr = np.asarray(g["layers"][name])
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0, name
