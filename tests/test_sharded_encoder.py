"""Sharded-encoder equivalence: sp/ep layouts must not change the math."""

import numpy as np
import pytest


def test_sequence_parallel_matches_dense(rng):
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_encoder_params,
    )
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE, ByteTokenizer
    from codegraph_tpu.parallel.mesh import make_mesh

    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=64, n_layers=2,
                        n_heads=4, max_len=32, dtype=jnp.float32)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(max_len=32)
    ids, mask = tok.encode_batch(["alpha beta gamma", "def foo(): pass",
                                  "x", "longer text with words"])
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    plain = np.asarray(encode(params, ids, mask, cfg))

    mesh = make_mesh((2, 2, 2), ("dp", "sp", "tp"))
    sharded = jax.jit(
        lambda p, i, m: encode(p, i, m, cfg, mesh=mesh,
                               dp_axis="dp", sp_axis="sp")
    )(params, ids, mask)
    np.testing.assert_allclose(plain, np.asarray(sharded), atol=1e-5)


def test_moe_encoder_forward_and_ep_equivalence(rng):
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_encoder_params,
    )
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE, ByteTokenizer
    from codegraph_tpu.parallel.mesh import make_mesh

    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=64, n_layers=2,
                        n_heads=4, mlp_ratio=2, max_len=32, n_experts=4,
                        dtype=jnp.float32)
    params = init_encoder_params(jax.random.PRNGKey(1), cfg)
    tok = ByteTokenizer(max_len=32)
    ids, mask = tok.encode_batch(["moe input one", "and another"])
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    plain = np.asarray(encode(params, ids, mask, cfg))
    assert plain.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(plain, axis=1), 1.0, atol=1e-3)

    # place params with ep/tp shardings; same output
    from jax.sharding import NamedSharding
    from codegraph_tpu.models.encoder import encoder_param_shardings

    mesh = make_mesh((2, 2, 2), ("dp", "ep", "tp"))
    sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), encoder_param_shardings(cfg),
        is_leaf=lambda x: hasattr(x, "_partitions") or type(x).__name__ == "PartitionSpec",
    )
    params_sharded = jax.device_put(params, sh)
    out = jax.jit(lambda p, i, m: encode(p, i, m, cfg, mesh=mesh,
                                         dp_axis="dp"))(params_sharded, ids, mask)
    np.testing.assert_allclose(plain, np.asarray(out), atol=1e-5)


def test_pipeline_parallel_matches_dense(rng):
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_encoder_params,
    )
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE, ByteTokenizer
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.pipeline import pp_encode

    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=64, n_layers=4,
                        n_heads=4, max_len=32, dtype=jnp.float32)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(max_len=32)
    ids, mask = tok.encode_batch([f"microbatch {i}" for i in range(8)])
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    dense = np.asarray(encode(params, ids, mask, cfg))
    mesh = make_mesh((4,), ("pp",))
    pp = np.asarray(pp_encode(params, ids, mask, cfg, mesh, n_micro=4))
    np.testing.assert_allclose(dense, pp, atol=1e-5)

    # gradients flow through ppermute (all stages train)
    def loss(p):
        return jnp.sum(pp_encode(p, ids, mask, cfg, mesh, n_micro=4))

    g = jax.grad(loss)(params)
    per_layer = np.abs(np.asarray(g["layers"]["wqkv"])).sum(axis=(1, 2))
    assert (per_layer > 0).all()  # every pipeline stage received gradient


def test_pipeline_tensor_composite_matches_dense(rng):
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_encoder_params,
    )
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE, ByteTokenizer
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.pipeline import pp_encode

    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=64, n_layers=2,
                        n_heads=4, max_len=32, dtype=jnp.float32)
    params = init_encoder_params(jax.random.PRNGKey(3), cfg)
    tok = ByteTokenizer(max_len=32)
    ids, mask = tok.encode_batch([f"composite stage {i}" for i in range(8)])
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    dense = np.asarray(encode(params, ids, mask, cfg))
    mesh = make_mesh((2, 4), ("pp", "tp"))
    out = np.asarray(pp_encode(params, ids, mask, cfg, mesh,
                               n_micro=4, tp_axis="tp"))
    np.testing.assert_allclose(dense, out, atol=1e-5)

    # gradients reach every stage through the composite layout too
    def loss(p):
        return jnp.sum(pp_encode(p, ids, mask, cfg, mesh,
                                 n_micro=4, tp_axis="tp"))

    g = jax.grad(loss)(params)
    per_layer = np.abs(np.asarray(g["layers"]["wqkv"])).sum(axis=(1, 2))
    assert (per_layer > 0).all()
