"""Multi-chip shard/merge + sharded training on the 8-device CPU mesh."""

import numpy as np
import pytest


def cosine_oracle(q, x, k):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    s = qn @ xn.T
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_mesh_shapes():
    from codegraph_tpu.parallel.mesh import default_mesh_shape, make_mesh

    assert default_mesh_shape(8, 1) == (8,)
    assert default_mesh_shape(8, 2) == (4, 2)
    assert default_mesh_shape(7, 2) == (7, 1)
    m = make_mesh((4, 2), ("dp", "tp"))
    assert m.shape == {"dp": 4, "tp": 2}


def test_sharded_search_matches_oracle(rng):
    import jax

    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_search import ShardedFlatIndex

    assert len(jax.devices()) >= 8
    mesh = make_mesh((8,), ("data",))
    N, D, B, k = 700, 64, 6, 10
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    idx = ShardedFlatIndex(D, mesh, tile_n=64)
    idx.build(x)
    s, i = idx.search(q, k)
    ref_s, ref_i = cosine_oracle(q, x, k)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, rtol=1e-4, atol=1e-5)


def test_sharded_search_add_delete(rng):
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_search import ShardedFlatIndex

    mesh = make_mesh((8,), ("data",))
    D = 32
    idx = ShardedFlatIndex(D, mesh, tile_n=64)
    a = rng.standard_normal((100, D)).astype(np.float32)
    b = rng.standard_normal((50, D)).astype(np.float32)
    idx.build(a)
    rows_b = idx.add(b)
    np.testing.assert_array_equal(rows_b, np.arange(100, 150))
    idx.delete(np.arange(0, 100))
    s, i = idx.search(b[:3], 5)
    assert (i[:, 0] == rows_b[:3]).all()
    assert (i[i >= 0] >= 100).all()


def test_sharded_train_step_runs_and_learns(rng):
    import jax

    from codegraph_tpu.models.encoder import EncoderConfig
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE, ByteTokenizer
    from codegraph_tpu.models.training import TrainConfig, make_sharded_train_step
    from codegraph_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 2), ("dp", "tp"))
    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=64, n_layers=2,
                        n_heads=4, max_len=32)
    tcfg = TrainConfig(learning_rate=1e-3)
    step_fn, init_fn = make_sharded_train_step(mesh, cfg, tcfg)
    params, opt_state = init_fn(jax.random.PRNGKey(0))

    tok = ByteTokenizer(max_len=32)
    B = 8
    anchors = [f"def func_{i}(x): return x + {i}" for i in range(B)]
    positives = [f"adds {i} to x" for i in range(B)]
    a_ids, a_mask = tok.encode_batch(anchors)
    p_ids, p_mask = tok.encode_batch(positives)
    batch = {"anchor_ids": a_ids, "anchor_mask": a_mask,
             "positive_ids": p_ids, "positive_mask": p_mask}

    losses = []
    for _ in range(5):
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # memorizes the tiny batch


def test_graft_entry_contract():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 8
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-2
    )


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_int8_index_recall(rng):
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_search import ShardedInt8Index

    mesh = make_mesh((8,), ("data",))
    N, D, B, k = 900, 64, 6, 10
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    idx = ShardedInt8Index(D, mesh, tile_n=64, rescore_k=50)
    idx.build(x)
    s, i = idx.search(q, k)
    _, ref_i = cosine_oracle(q, x, k)
    hits = sum(len(set(a) & set(b)) for a, b in zip(i, ref_i))
    assert hits / ref_i.size >= 0.95  # int8 scan + f32 rescore

    idx.delete(np.arange(0, 450))
    s, i = idx.search(x[450:453], 5)
    assert (i[:, 0] == np.arange(450, 453)).all()
    assert (i[i >= 0] >= 450).all()


def test_sharded_ivf_full_probe_exact(rng):
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_ivf import ShardedIVFIndex

    mesh = make_mesh((8,), ("data",))
    N, D, B, k = 800, 48, 5, 10
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    idx = ShardedIVFIndex(D, mesh, nlist=16, nprobe=16, kmeans_iters=4,
                          dtype="float32")
    idx.train(x)
    idx.add(x)
    # full local probe (nlist/shards = 2 cells per shard) == exact
    s, i = idx.search(q, k, nprobe=16)
    _, ref_i = cosine_oracle(q, x, k)
    np.testing.assert_array_equal(np.sort(i, axis=1), np.sort(ref_i, axis=1))


def test_sharded_ivf_partial_probe_recall(rng):
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_ivf import ShardedIVFIndex

    mesh = make_mesh((8,), ("data",))
    D = 32
    centers = rng.standard_normal((16, D)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 16, 1600)]
         + rng.standard_normal((1600, D)).astype(np.float32) * 0.3)
    q = x[rng.choice(1600, 6, replace=False)] + 0.01
    idx = ShardedIVFIndex(D, mesh, nlist=32, nprobe=2, kmeans_iters=6,
                          dtype="float32")
    idx.train(x)
    rows = idx.add(x)
    s, i = idx.search(q, 10)
    _, ref_i = cosine_oracle(q, x, 10)
    hits = sum(len(set(a) & set(b)) for a, b in zip(i, ref_i))
    assert hits / ref_i.size >= 0.85  # nprobe=2 per shard = 16 cells total
    # deletes tombstone through to the sharded tensors
    idx.delete(rows[:800])
    s, i = idx.search(x[800:803], 5)
    assert (i[i >= 0] >= 800).all()


def test_hybrid_search_over_sharded_index(rng):
    """The full hybrid pipeline runs unchanged over a mesh-sharded index."""
    from codegraph_tpu.core.types import (CodeChunk, CodeNode, Language,
                                          Location, NodeType)
    from codegraph_tpu.graph.store import GraphStore
    from codegraph_tpu.models.providers import HashProvider
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_search import ShardedFlatIndex
    from codegraph_tpu.search.bm25 import BM25Index
    from codegraph_tpu.search.hybrid import HybridSearch

    mesh = make_mesh((8,), ("data",))
    store = GraphStore()
    provider = HashProvider(64)
    texts = {f"handler_{i}": f"def handler_{i}(req): processes request type {i}"
             for i in range(40)}
    nodes = [CodeNode.make("p", n, NodeType.FUNCTION, Language.PYTHON,
                           Location(f"{n}.py", 1, 3), content=t)
             for n, t in texts.items()]
    store.upsert_nodes(nodes)
    chunks = [CodeChunk.make(n.id, texts[n.name], 0, 1) for n in nodes]
    rows = store.upsert_chunks(chunks)
    index = ShardedFlatIndex(64, mesh, tile_n=64)
    got = index.build(provider.embed_texts([c.text for c in chunks]))
    np.testing.assert_array_equal(got, rows)
    bm25 = BM25Index()
    for n in nodes:
        bm25.add(n.row, f"{n.name} {n.content}")

    hs = HybridSearch(store, index, provider, bm25)
    results = hs.search_text("processes request type 7", limit=3)
    assert results and results[0].name == "handler_7"


def test_sharded_ivfpq_recall_and_refine(rng):
    import numpy as np

    from codegraph_tpu.index.ivfpq import IVFPQIndex
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_ivfpq import ShardedIVFPQIndex
    from tests.test_ivf_index import clustered_data, recall_at_k

    x = clustered_data(rng, 16, 48, 32)  # 768 rows
    q = x[rng.choice(len(x), 8, replace=False)] + 0.005
    mesh = make_mesh((8,), ("data",))

    sharded = ShardedIVFPQIndex(32, mesh, nlist=16, nprobe=4, m=8,
                                kmeans_iters=5, pq_iters=6)
    sharded.train(x)
    sharded.add(x)
    s_sh, i_sh = sharded.search(q, 10)

    # per-shard probing at nprobe=4 covers >= the single-chip candidates:
    # recall vs the single-chip full-probe index must not regress
    single = IVFPQIndex(32, nlist=16, nprobe=16, m=8, kmeans_iters=5,
                        pq_iters=6)
    single.train(x)
    single.add(x)
    _, i_ref = single.search(q, 10)
    assert recall_at_k(i_sh, i_ref) >= 0.9
    assert sharded.stats()["shards"] == 8

    # refine composes across the merge (ids are global rows)
    refined = ShardedIVFPQIndex(32, mesh, nlist=16, nprobe=4, m=8,
                                kmeans_iters=5, pq_iters=6,
                                refine="f32", refine_factor=8)
    refined.train(x)
    rows = refined.add(x)
    s_r, i_r = refined.search(q, 10)
    assert (i_r[:, 0] == np.array([np.argmax(
        (x / np.linalg.norm(x, axis=1, keepdims=True)) @ (
            qq / np.linalg.norm(qq))) for qq in q])).mean() >= 0.8

    refined.delete(rows[:1])
    _, i_d = refined.search(x[:1] + 0.001, 5)
    assert 0 not in i_d


def test_sharded_ivfpq_int8_device_refine(rng):
    """refine="int8_device" on the mesh (VERDICT r4 item 4): the row
    bank shards by global row range, candidates rescore on-device via
    the psum-of-disjoint-ranges kernel, and the result matches the
    single-chip int8_device index bit-for-bit on ids when both probe
    every cell (same base training seed => same codes/banks)."""
    import numpy as np

    from codegraph_tpu.index.ivfpq import IVFPQIndex
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_ivfpq import ShardedIVFPQIndex
    from tests.test_ivf_index import clustered_data

    x = clustered_data(rng, 16, 48, 32)  # 768 rows, dim 32
    q = x[rng.choice(len(x), 8, replace=False)] + 0.01
    mesh = make_mesh((8,), ("data",))

    sharded = ShardedIVFPQIndex(32, mesh, nlist=16, nprobe=16, m=8,
                                kmeans_iters=5, pq_iters=6,
                                refine="int8_device", refine_factor=8)
    sharded.train(x)
    sharded.add(x)
    s_sh, i_sh = sharded.search(q, 10)

    single = IVFPQIndex(32, nlist=16, nprobe=16, m=8, kmeans_iters=5,
                        pq_iters=6, refine="int8_device", refine_factor=8)
    single.train(x)
    single.add(x)
    s_si, i_si = single.search(q, 10)

    # both probe all cells and refine exactly (int8): identical ranking
    np.testing.assert_array_equal(i_sh, i_si)
    np.testing.assert_allclose(s_sh, s_si, rtol=1e-5, atol=1e-5)

    # and the refined ranking is the exact int8-rescored oracle:
    # top-1 must be each query's true nearest row
    _, i_or = cosine_oracle(q, x, 1)
    assert (i_sh[:, 0] == i_or[:, 0]).mean() >= 0.9

    # tombstones propagate into the device-refined path
    sharded.delete(np.array([int(i_or[0, 0])]))
    _, i_d = sharded.search(q[:1], 5)
    assert int(i_or[0, 0]) not in i_d


def test_sharded_ivfpq_opq_rotation(rng):
    """OPQ trains a global rotation folded into the index space; the
    sharded query path must rotate queries too (r5 fix — it previously
    searched rotated centroids with unrotated queries)."""
    import numpy as np

    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_ivfpq import ShardedIVFPQIndex
    from tests.test_ivf_index import clustered_data

    x = clustered_data(rng, 16, 48, 32)
    q = x[rng.choice(len(x), 8, replace=False)] + 0.01
    mesh = make_mesh((8,), ("data",))
    idx = ShardedIVFPQIndex(32, mesh, nlist=16, nprobe=16, m=8,
                            kmeans_iters=5, pq_iters=4, opq=True,
                            refine="int8_device", refine_factor=8)
    idx.train(x)
    idx.add(x)
    assert idx._base._rot is not None, "opq did not train a rotation"
    _, i_sh = idx.search(q, 5)
    _, i_or = cosine_oracle(q, x, 1)
    assert (i_sh[:, 0] == i_or[:, 0]).mean() >= 0.9


def test_sharded_topk_2d_matches_oracle(rng):
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.ops.topk import exact_topk
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_search import sharded_topk_2d

    mesh = make_mesh((2, 4), ("q", "data"))
    N, D, B, k = 4 * 256, 64, 16, 7
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    bias = np.zeros((N,), np.float32)
    bias[:32] = -1e30  # tombstones
    s2, i2 = sharded_topk_2d(jnp.asarray(q), jnp.asarray(x),
                             jnp.asarray(bias), k, mesh, tile_n=128)
    se, ie = exact_topk(jnp.asarray(q), jnp.asarray(x), k, jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(se), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ie))


def test_sharded_topk_hier_matches_oracle(rng):
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.ops.topk import exact_topk
    from codegraph_tpu.parallel.mesh import make_mesh
    from codegraph_tpu.parallel.sharded_search import sharded_topk_hier

    # 2 "hosts" x 4 chips: the hierarchical ICI->DCN merge must equal
    # the flat oracle exactly
    mesh = make_mesh((2, 4), ("dcn", "ici"))
    N, D, B, k = 8 * 128, 64, 8, 7
    x = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    bias = np.zeros((N,), np.float32)
    bias[100:140] = -1e30
    sh, ih = sharded_topk_hier(jnp.asarray(q), jnp.asarray(x),
                               jnp.asarray(bias), k, mesh, tile_n=128)
    se, ie = exact_topk(jnp.asarray(q), jnp.asarray(x), k, jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(sh), np.asarray(se), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ih), np.asarray(ie))
