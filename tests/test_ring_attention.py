"""Ring attention (parallel/ring_attention.py): exactness vs the dense
encoder, dp x sp composition, and gradient flow through the ppermute
ring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codegraph_tpu.models.encoder import (
    EncoderConfig,
    encode,
    init_encoder_params,
)
from codegraph_tpu.parallel.mesh import make_mesh
from codegraph_tpu.parallel.ring_attention import sp_ring_encode

CFG = EncoderConfig(
    vocab_size=64, hidden=64, n_layers=2, n_heads=4, max_len=32,
    dtype=jnp.float32,
)


def _batch(rng, B, L, max_len):
    ids = rng.integers(0, 64, (B, L)).astype(np.int32)
    # ragged padding: row i keeps L - i valid tokens (min 4)
    mask = np.zeros((B, L), bool)
    for i in range(B):
        mask[i, : max(L - 3 * i, 4)] = True
    ids[~mask] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


def test_sp_ring_matches_dense():
    rng = np.random.default_rng(0)
    params = init_encoder_params(jax.random.PRNGKey(0), CFG)
    ids, mask = _batch(rng, 4, 32, CFG.max_len)
    mesh = make_mesh((4,), ("sp",))
    dense = encode(params, ids, mask, CFG)
    ring = sp_ring_encode(params, ids, mask, CFG, mesh, sp_axis="sp")
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_sp_ring_dp_composition():
    rng = np.random.default_rng(1)
    params = init_encoder_params(jax.random.PRNGKey(1), CFG)
    ids, mask = _batch(rng, 4, 32, CFG.max_len)
    mesh = make_mesh((2, 4), ("dp", "sp"))
    dense = encode(params, ids, mask, CFG)
    ring = sp_ring_encode(params, ids, mask, CFG, mesh,
                          sp_axis="sp", dp_axis="dp")
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_sp_ring_gradients_match_dense():
    rng = np.random.default_rng(2)
    params = init_encoder_params(jax.random.PRNGKey(2), CFG)
    ids, mask = _batch(rng, 2, 32, CFG.max_len)
    mesh = make_mesh((4,), ("sp",))
    tgt = jnp.asarray(rng.standard_normal((2, CFG.hidden)).astype(np.float32))

    def loss_dense(p):
        return jnp.sum(encode(p, ids, mask, CFG) * tgt)

    def loss_ring(p):
        return jnp.sum(sp_ring_encode(p, ids, mask, CFG, mesh) * tgt)

    from jax.flatten_util import ravel_pytree

    gd = jax.grad(loss_dense)(params)
    gr = jax.grad(loss_ring)(params)
    flat_d, _ = ravel_pytree(gd)
    flat_r, _ = ravel_pytree(gr)
    np.testing.assert_allclose(np.asarray(flat_r), np.asarray(flat_d),
                               atol=5e-5, rtol=5e-4)
    assert float(jnp.linalg.norm(flat_d)) > 0


def test_sp_ring_rejects_unsupported():
    params = init_encoder_params(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh((4,), ("sp",))
    moe_cfg = EncoderConfig(vocab_size=64, hidden=64, n_layers=2, n_heads=4,
                            max_len=32, n_experts=2, dtype=jnp.float32)
    ids = jnp.zeros((2, 32), jnp.int32)
    mask = jnp.ones((2, 32), bool)
    with pytest.raises(NotImplementedError):
        sp_ring_encode(init_encoder_params(jax.random.PRNGKey(0), moe_cfg),
                       ids, mask, moe_cfg, mesh)
