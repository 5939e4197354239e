import numpy as np
import pytest

from codegraph_tpu.core.types import (
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)
from codegraph_tpu.graph.csr import adjacency_boost, build_csr
from codegraph_tpu.graph.queries import GraphQueries
from codegraph_tpu.graph.store import GraphStore


def make_node(name, file="a.py", line=1, ntype=NodeType.FUNCTION, complexity=1):
    return CodeNode.make(
        "proj", name, ntype, Language.PYTHON,
        Location(file, line, line + 5), content=f"def {name}(): ...",
        complexity=complexity,
    )


def wire(store, edges):
    """edges: list of (src_name, dst_name, EdgeType)."""
    by_name = {n.name: n for n in store.nodes.values()}
    store.add_edges([
        CodeEdge(by_name[s].id, by_name[d].id, t) for s, d, t in edges
    ])


@pytest.fixture
def diamond_store():
    # a -> b -> d, a -> c -> d, d -> a (cycle), plus isolated e
    store = GraphStore()
    store.upsert_nodes([make_node(n, line=i) for i, n in enumerate("abcde")])
    wire(store, [
        ("a", "b", EdgeType.CALLS),
        ("a", "c", EdgeType.USES),
        ("b", "d", EdgeType.CALLS),
        ("c", "d", EdgeType.DEPENDS_ON),
        ("d", "a", EdgeType.CALLS),
    ])
    return store


def test_csr_build_and_neighbors(diamond_store):
    csr = diamond_store.csr()
    assert csr.n_nodes == 5
    assert csr.n_edges == 5
    rows = diamond_store.node_rows
    by_name = {n.name: rows[n.id] for n in diamond_store.nodes.values()}
    a, b, c, d = by_name["a"], by_name["b"], by_name["c"], by_name["d"]
    assert set(csr.neighbors(a).tolist()) == {b, c}
    assert set(csr.reverse_neighbors(d).tolist()) == {b, c}
    assert set(csr.neighbors(by_name["e"]).tolist()) == set()


def test_transitive_dependencies(diamond_store):
    q = GraphQueries(diamond_store)
    res = q.transitive_dependencies("a", max_depth=3)
    names = {d["name"]: d["depth"] for d in res["dependencies"]}
    assert names == {"b": 1, "c": 1, "d": 2}


def test_circular_dependencies(diamond_store):
    q = GraphQueries(diamond_store)
    res = q.circular_dependencies()
    assert res["count"] == 1
    members = {m["name"] for m in res["cycles"][0]["members"]}
    assert members == {"a", "b", "c", "d"}


def test_trace_call_chain(diamond_store):
    q = GraphQueries(diamond_store)
    res = q.trace_call_chain("a", "d")
    assert res["count"] >= 1
    chain_names = [n["name"] for n in res["paths"][0]["chain"]]
    assert chain_names[0] == "a" and chain_names[-1] == "d"


def test_coupling_and_hubs(diamond_store):
    q = GraphQueries(diamond_store)
    m = q.coupling_metrics("a")
    assert m["efferent_coupling"] == 2  # b, c
    assert m["afferent_coupling"] == 1  # d
    hubs = q.hub_nodes(limit=2)
    assert hubs["hubs"][0]["name"] in ("a", "d")


def test_reverse_dependencies(diamond_store):
    q = GraphQueries(diamond_store)
    res = q.reverse_dependencies("d", max_depth=2)
    names = {d["name"] for d in res["dependents"]}
    assert names == {"a", "b", "c"}


def test_complexity_hotspots():
    store = GraphStore()
    store.upsert_nodes([
        make_node("simple", complexity=1),
        make_node("gnarly", line=10, complexity=15),
        make_node("medium", line=20, complexity=5),
    ])
    q = GraphQueries(store)
    res = q.complexity_hotspots(limit=2)
    assert res["hotspots"][0]["name"] == "gnarly"


def test_unknown_node_errors(diamond_store):
    q = GraphQueries(diamond_store)
    assert "error" in q.transitive_dependencies("nope")
    assert "error" in q.coupling_metrics("nope")


def test_delete_file_data():
    store = GraphStore()
    store.upsert_nodes([make_node("x", file="f1.py"), make_node("y", file="f2.py")])
    wire(store, [("x", "y", EdgeType.CALLS)])
    store.record_file("f1.py", "h1")
    node_rows, _ = store.delete_file_data("f1.py")
    assert len(node_rows) == 1
    assert len(store.edges) == 0
    assert "x" not in {n.name for n in store.nodes.values()}
    # re-adding the same file reuses deterministic ids but new rows are fine
    store.upsert_nodes([make_node("x", file="f1.py")])
    assert "x" in {n.name for n in store.nodes.values()}


def test_detect_file_changes():
    store = GraphStore()
    store.record_file("a.py", "h1")
    store.record_file("b.py", "h2")
    added, modified, deleted, unchanged = store.detect_file_changes(
        {"a.py": "h1", "b.py": "h3", "c.py": "h4"}
    )
    assert added == ["c.py"] and modified == ["b.py"] and unchanged == ["a.py"]
    assert deleted == []
    _, _, deleted, _ = store.detect_file_changes({"a.py": "h1"})
    assert deleted == ["b.py"]


def test_store_snapshot_roundtrip(tmp_path, diamond_store):
    diamond_store.record_file("a.py", "hash1")
    diamond_store.save(str(tmp_path))
    loaded = GraphStore.load(str(tmp_path))
    assert loaded.stats() == diamond_store.stats()
    assert loaded.file_metadata == {"a.py": "hash1"}
    q = GraphQueries(loaded)
    res = q.transitive_dependencies("a", max_depth=1)
    assert {d["name"] for d in res["dependencies"]} == {"b", "c"}


def test_adjacency_boost_kernel(diamond_store):
    csr = diamond_store.csr()
    nbr, wgt, _et, _dir = csr.padded_adjacency(max_deg=4)
    rows = diamond_store.node_rows
    by_name = {n.name: rows[n.id] for n in diamond_store.nodes.values()}
    # candidates {a, b, e}: a-b are connected (calls), e is isolated
    cand = np.asarray([[by_name["a"], by_name["b"], by_name["e"], -1]], np.int32)
    boost = np.asarray(adjacency_boost(cand, nbr, wgt))
    assert boost.shape == (1, 4)
    assert boost[0, 0] > 0 and boost[0, 1] > 0  # a<->b edge counted both ways
    assert boost[0, 2] == 0.0  # e isolated
    assert boost[0, 3] == 0.0  # padding


def test_find_nodes_by_name_public_query(diamond_store):
    """graph_functions.rs:473 parity: exact-first ordered name lookup."""
    q = GraphQueries(diamond_store)
    out = q.find_nodes_by_name("a")
    assert out["count"] >= 1
    assert out["nodes"][0]["name"] == "a"
    assert out["nodes"][0]["exact"] is True
    # miss
    assert q.find_nodes_by_name("zzz_does_not_exist")["count"] == 0


def test_adjacency_boost_ignores_self_loops():
    """A recursive function's CALLS self-edge must not count as a
    connection to 'another candidate'."""
    import numpy as np

    from codegraph_tpu.graph.csr import adjacency_boost, build_csr

    # node 0 has only a self-loop; nodes 1<->2 call each other
    src = np.array([0, 1, 2], np.int64)
    dst = np.array([0, 2, 1], np.int64)
    et = np.zeros(3, np.int16)
    w = np.ones(3, np.float32)
    csr = build_csr(3, src, dst, et, w)
    from codegraph_tpu.search.hybrid import HybridSearch  # noqa: F401

    # padded adjacency from the csr
    max_deg = 2
    nbr = np.full((3, max_deg), -1, np.int32)
    wgt = np.zeros((3, max_deg), np.float32)
    for r in range(3):
        ns = csr.neighbors(r)
        nbr[r, :len(ns)] = ns
        lo, hi = csr.indptr[r], csr.indptr[r + 1]
        wgt[r, :hi - lo] = csr.weight[lo:hi]
    cand = np.array([[0, 1, 2]], np.int32)
    boost = np.asarray(adjacency_boost(cand, nbr, wgt))[0]
    assert boost[0] == 0.0          # self-loop contributes nothing
    assert boost[1] > 0 and boost[2] > 0


def test_padded_adjacency_edge_evidence_planes():
    """etype/direction planes carry the per-edge evidence the reference
    joins onto search hits (schema/codegraph.surql:481-536)."""
    import numpy as np

    from codegraph_tpu.core.types import EDGE_TYPE_CODES, EdgeType
    from codegraph_tpu.graph.csr import build_csr

    calls = EDGE_TYPE_CODES[EdgeType.CALLS]
    uses = EDGE_TYPE_CODES[EdgeType.USES]
    # a(0) -calls-> b(1) w=1.0 ; c(2) -uses-> a(0) w=2.0
    csr = build_csr(
        3,
        np.array([0, 2]), np.array([1, 0]),
        np.array([calls, uses], np.int16),
        np.array([1.0, 2.0], np.float32),
    )
    nbr, wgt, et, dirn = csr.padded_adjacency(max_deg=4)
    row0 = {int(n): (float(w), int(e), int(d))
            for n, w, e, d in zip(nbr[0], wgt[0], et[0], dirn[0]) if n >= 0}
    assert row0[1] == (1.0, calls, 0)   # outgoing call to b
    assert row0[2] == (2.0, uses, 1)    # incoming use from c
    # b sees the call as incoming
    row1 = {int(n): (float(w), int(e), int(d))
            for n, w, e, d in zip(nbr[1], wgt[1], et[1], dirn[1]) if n >= 0}
    assert row1[0] == (1.0, calls, 1)
