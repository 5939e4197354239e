"""Zero-deserialize graph archives (graph/archive.py): columnar write,
mmap open, lazy node decode, vectorized name lookup, CSR identity, and
GraphQueries parity vs the live GraphStore — including tombstoned rows.

Reference parity: codegraph-zerocopy/src/archived.rs (zero-copy archived
graph access)."""

import numpy as np
import pytest

from codegraph_tpu.core.errors import SnapshotError
from codegraph_tpu.core.types import (
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)
from codegraph_tpu.graph.archive import ArchivedGraphStore, write_graph_archive
from codegraph_tpu.graph.queries import GraphQueries
from codegraph_tpu.graph.store import GraphStore


def _node(name, path="a.py", ntype=NodeType.FUNCTION, line=1,
          content="", complexity=0, meta=None):
    n = CodeNode.make("proj", name, ntype, Language.PYTHON,
                      Location(file_path=path, start_line=line,
                               end_line=line + 4))
    n.content = content
    n.complexity = complexity
    if meta:
        n.metadata = meta
    return n


@pytest.fixture
def store():
    s = GraphStore()
    a = _node("alpha", content="def alpha(): beta()", complexity=3,
              meta={"kind": "entry"})
    b = _node("beta", path="b.py", line=10, complexity=7)
    c = _node("gamma_helper", path="b.py", line=30,
              ntype=NodeType.CLASS, content="class gamma_helper: pass")
    d = _node("doomed", path="dead.py")
    s.upsert_nodes([a, b, c, d])
    s.add_edges([
        CodeEdge(src=a.id, dst=b.id, edge_type=EdgeType.CALLS),
        CodeEdge(src=b.id, dst=c.id, edge_type=EdgeType.USES, weight=0.5),
        CodeEdge(src=a.id, dst=c.id, edge_type=EdgeType.DEPENDS_ON),
    ])
    s.delete_file_data("dead.py")  # tombstone row 3
    return s


def test_archive_roundtrip_nodes(tmp_path, store):
    write_graph_archive(store, str(tmp_path))
    arch = ArchivedGraphStore.open(str(tmp_path))
    assert arch.n_node_rows == store.n_node_rows
    for row in range(store.n_node_rows):
        live = store.node_by_row(row)
        got = arch.node_by_row(row)
        if live is None:
            assert got is None
            continue
        assert got.id == live.id
        assert got.name == live.name
        assert got.node_type == live.node_type
        assert got.language == live.language
        assert got.location.file_path == live.location.file_path
        assert got.location.start_line == live.location.start_line
        assert got.content == live.content
        assert got.complexity == live.complexity
        assert got.metadata == live.metadata
        assert got.row == row
    assert len(arch.nodes) == len(store.nodes)


def test_archive_is_mmap_backed(tmp_path, store):
    write_graph_archive(store, str(tmp_path))
    arch = ArchivedGraphStore.open(str(tmp_path))
    assert isinstance(arch.a["name_pool"], np.memmap)
    assert isinstance(arch.a["indptr"], np.memmap)


def test_archive_row_lookup(tmp_path, store):
    write_graph_archive(store, str(tmp_path))
    arch = ArchivedGraphStore.open(str(tmp_path))
    for nid, row in store.node_rows.items():
        if store.row_nodes[row] is None:
            continue
        assert arch.node_rows.get(nid) == row
    assert arch.node_rows.get("no-such-id") is None
    # tombstoned id resolves to None
    dead = [nid for nid, r in store.node_rows.items()
            if store.row_nodes[r] is None]
    # delete_file_data pops node_rows, so look directly by the dead row
    assert arch.node_by_row(3) is None


def test_archive_find_by_name(tmp_path, store):
    write_graph_archive(store, str(tmp_path))
    arch = ArchivedGraphStore.open(str(tmp_path))
    exact = arch.find_nodes_by_name("beta", fuzzy=False)
    assert [n.name for n in exact] == ["beta"]
    fuzzy = arch.find_nodes_by_name("gamma", fuzzy=True)
    assert [n.name for n in fuzzy] == ["gamma_helper"]
    # GraphStore semantics: case-insensitive substring when no exact hit
    ci = arch.find_nodes_by_name("GAMMA", fuzzy=True)
    assert [n.name for n in ci] == ["gamma_helper"]
    # exact matches suppress substring hits (store.py:167)
    assert [n.name for n in store.find_nodes_by_name("beta")] == \
        [n.name for n in arch.find_nodes_by_name("beta")]
    assert arch.find_nodes_by_name("doomed", fuzzy=True) == []
    # substring that crosses entry boundaries must not match
    assert arch.find_nodes_by_name("alphabeta", fuzzy=True) == []


def test_archive_csr_identity(tmp_path, store):
    write_graph_archive(store, str(tmp_path))
    arch = ArchivedGraphStore.open(str(tmp_path))
    live, got = store.csr(), arch.csr()
    np.testing.assert_array_equal(got.indptr, live.indptr)
    np.testing.assert_array_equal(got.indices, live.indices)
    np.testing.assert_array_equal(got.etype, live.etype)
    np.testing.assert_array_equal(got.r_indices, live.r_indices)


def test_graph_queries_parity(tmp_path, store):
    """All analytics identical through the archive."""
    write_graph_archive(store, str(tmp_path))
    arch = ArchivedGraphStore.open(str(tmp_path))
    q_live = GraphQueries(store)
    q_arch = GraphQueries(arch)
    assert (q_arch.find_nodes_by_name("alpha")
            == q_live.find_nodes_by_name("alpha"))
    assert (q_arch.transitive_dependencies("alpha")
            == q_live.transitive_dependencies("alpha"))
    assert (q_arch.coupling_metrics("beta")
            == q_live.coupling_metrics("beta"))
    assert q_arch.hub_nodes() == q_live.hub_nodes()
    assert (q_arch.reverse_dependencies("gamma_helper")
            == q_live.reverse_dependencies("gamma_helper"))
    assert q_arch.complexity_hotspots() == q_live.complexity_hotspots()
    assert q_arch.top_directories() == q_live.top_directories()
    assert (q_arch.trace_call_chain("alpha", "beta")
            == q_live.trace_call_chain("alpha", "beta"))


def test_archive_rejects_wrong_manifest(tmp_path, store):
    from codegraph_tpu.index.snapshot import save_arrays

    save_arrays(str(tmp_path), {"x": np.zeros(3)}, {"kind": "other"})
    with pytest.raises(SnapshotError):
        ArchivedGraphStore.open(str(tmp_path))


def test_empty_store_archives(tmp_path):
    s = GraphStore()
    write_graph_archive(s, str(tmp_path))
    arch = ArchivedGraphStore.open(str(tmp_path))
    assert arch.n_node_rows == 0
    assert arch.find_nodes_by_name("x") == []
    assert len(arch.nodes) == 0
