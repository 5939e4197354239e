"""Multi-index routing (reference: per-dimension embedding-column routing,
surrealdb_storage.rs:1932, surreal_store.rs:67)."""

import numpy as np
import pytest

from codegraph_tpu.index.flat import FlatIndex
from codegraph_tpu.models.providers import HashProvider
from codegraph_tpu.search.router import IndexRouter, RoutingError


def _backend(dim, n=64, seed=0):
    rng = np.random.default_rng(seed)
    prov = HashProvider(dim)
    idx = FlatIndex(dim, tile_n=128, backend="xla")
    idx.add(rng.standard_normal((n, dim)).astype(np.float32))
    return prov, idx


def test_router_model_and_dimension_routing():
    router = IndexRouter()
    p32, i32 = _backend(32)
    p64, i64 = _backend(64, seed=1)
    router.register("small", p32, i32)
    router.register("large", p64, i64, default=True)

    assert router.names() == ["large", "small"]
    assert router.dimensions() == {"small": 32, "large": 64}
    assert router.resolve() == "large"                 # default
    assert router.resolve(model="small") == "small"    # explicit
    assert router.resolve(dimension=32) == "small"     # width routing
    with pytest.raises(RoutingError):
        router.resolve(model="nope")
    with pytest.raises(RoutingError):
        router.resolve(dimension=128)

    # raw-vector queries land on the width-matching backend
    q = np.zeros(32, np.float32)
    q[0] = 1.0
    scores, rows = router.search_vector(q, k=3)
    assert scores.shape == (1, 3)

    # text queries embed with the routed provider's width
    s, r = router.search_text("hello", limit=3, model="small")
    assert len(r) == 3

    st = router.stats()
    assert st["large"]["default"] and st["large"]["rows"] == 64


def test_router_through_tool_executor(tmp_path):
    """The MCP `model` parameter routes semantic_code_search to the named
    backend's HybridSearch."""
    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.graph.queries import GraphQueries
    from codegraph_tpu.indexer.indexer import ProjectIndexer
    from codegraph_tpu.mcp.tools import GraphToolExecutor

    (tmp_path / "a.py").write_text("def fetch_user(uid):\n    return uid\n")
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))

    router = IndexRouter()
    router.register("default32", indexer.provider, indexer.search,
                    default=True)
    tools = GraphToolExecutor(GraphQueries(indexer.store), indexer.search,
                              router=router)
    out = tools.execute("semantic_code_search",
                        {"query": "fetch user", "model": "default32"})
    assert out["count"] >= 1
    assert out["results"][0]["name"] == "fetch_user"
    # unknown model -> structured error, not a crash
    bad = tools.execute("semantic_code_search",
                        {"query": "fetch user", "model": "nope"})
    assert "error" in bad
