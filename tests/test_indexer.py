import json
import os
import textwrap

import numpy as np
import pytest

from codegraph_tpu.core.config import CodeGraphConfig
from codegraph_tpu.indexer.indexer import ProjectIndexer
from codegraph_tpu.indexer.estimation import RepositoryEstimator
from codegraph_tpu.indexer.resolve import EdgeResolver
from codegraph_tpu.core.types import (
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)


@pytest.fixture
def project(tmp_path):
    (tmp_path / "math_utils.py").write_text(textwrap.dedent('''
        def add_numbers(a, b):
            return a + b

        def multiply_numbers(a, b):
            total = 0
            for _ in range(b):
                total = add_numbers(total, a)
            return total
    '''))
    (tmp_path / "server.rs").write_text(textwrap.dedent('''
        pub struct HttpServer {
            port: u16,
        }

        pub fn start_server(port: u16) -> HttpServer {
            HttpServer { port }
        }
    '''))
    return tmp_path


def make_cfg(tmp_path, **emb):
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.data_dir = str(tmp_path / ".codegraph")
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 64
    for k, v in emb.items():
        setattr(cfg.embedding, k, v)
    return cfg


def test_index_project_end_to_end(project):
    cfg = make_cfg(project)
    indexer = ProjectIndexer(cfg)
    stats = indexer.index_project(str(project))
    assert stats.files_parsed == 2
    assert stats.nodes >= 4
    assert stats.chunks >= 4
    assert len(indexer.index) == stats.chunks
    # resolved call edge multiply_numbers -> add_numbers
    assert stats.edges_resolved_exact >= 1
    # search finds the adder
    results = indexer.search.search_text("add two numbers together", limit=3)
    assert results
    assert any("add_numbers" == r.name for r in results)


def test_incremental_reindex_unchanged(project):
    cfg = make_cfg(project)
    indexer = ProjectIndexer(cfg)
    s1 = indexer.index_project(str(project))
    s2 = indexer.index_project(str(project))
    assert s2.files_unchanged == 2
    assert s2.files_parsed == 0
    assert s2.chunks == 0  # nothing re-embedded


def test_incremental_modify_and_delete(project):
    cfg = make_cfg(project)
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(project))
    n_before = len(indexer.index)

    # modify one file
    (project / "math_utils.py").write_text(
        "def subtract_numbers(a, b):\n    return a - b\n"
    )
    s = indexer.index_project(str(project))
    assert s.files_parsed == 1
    results = indexer.search.search_text("subtract numbers", limit=3)
    assert any(r.name == "subtract_numbers" for r in results)
    # old symbols are gone from the store
    assert not any(n.name == "add_numbers" for n in indexer.store.nodes.values())

    # delete the file entirely
    (project / "math_utils.py").unlink()
    s = indexer.index_project(str(project))
    assert s.files_deleted == 1
    assert not any(
        n.name == "subtract_numbers" for n in indexer.store.nodes.values()
    )


def test_index_single_file_watch_path(project):
    cfg = make_cfg(project)
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(project))
    path = str(project / "math_utils.py")
    (project / "math_utils.py").write_text("def renamed_fn(x):\n    return x\n")
    stats = indexer.index_single_file(path)
    assert stats is not None and stats.nodes >= 1
    results = indexer.search.search_text("renamed fn", limit=3)
    assert any(r.name == "renamed_fn" for r in results)


def test_save_load_roundtrip(project):
    cfg = make_cfg(project)
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(project))
    q = "start the http server"
    before = [r.node_id for r in indexer.search.search_text(q, limit=3)]
    directory = indexer.save()

    indexer2 = ProjectIndexer(make_cfg(project))
    indexer2.load(directory)
    after = [r.node_id for r in indexer2.search.search_text(q, limit=3)]
    assert before == after
    # change detection survives the reload
    s = indexer2.index_project(str(project))
    assert s.files_unchanged == 2


def test_edge_resolver_ladder():
    def mk(name, file="a.py"):
        return CodeNode.make(
            "p", name, NodeType.FUNCTION, Language.PYTHON, Location(file, 1, 2)
        )

    nodes = [mk("parse_file"), mk("HttpServer"), mk("compute_sum")]
    edges = [
        CodeEdge(nodes[0].id, "parse_file", EdgeType.CALLS, resolved=False),
        CodeEdge(nodes[0].id, "ParseFile", EdgeType.CALLS, resolved=False),  # camel variant
        CodeEdge(nodes[0].id, "totally_unknown_xyz", EdgeType.CALLS, resolved=False),
    ]
    resolver = EdgeResolver(provider=None)
    unresolved, n_exact, n_sem, n_ext = resolver.resolve(edges, nodes)
    assert n_exact == 2
    assert len(unresolved) == 1 and unresolved[0].dst == "totally_unknown_xyz"


def test_edge_resolver_semantic_match():
    from codegraph_tpu.models.providers import HashProvider

    def mk(name):
        return CodeNode.make(
            "p", name, NodeType.FUNCTION, Language.PYTHON, Location("a.py", 1, 2)
        )

    nodes = [mk("compute_checksum"), mk("render_page")]
    # trigram-similar but not an exact/normalized match
    edges = [CodeEdge(nodes[1].id, "compute_checksums", EdgeType.CALLS,
                      resolved=False)]
    resolver = EdgeResolver(provider=HashProvider(64), semantic_threshold=0.5)
    unresolved, n_exact, n_sem, n_ext = resolver.resolve(edges, nodes)
    assert n_sem == 1
    assert edges[0].resolved and edges[0].dst == nodes[0].id


def test_estimator(project):
    cfg = make_cfg(project)
    est = RepositoryEstimator(cfg).analyze(str(project))
    assert est.files == 2
    assert est.nodes >= 4
    assert est.chunks >= 4
    assert est.embed_eta_seconds >= 0
    d = est.to_dict()
    assert d["provider"] == "hash"


def test_index_project_int8_config(project):
    cfg = make_cfg(project)
    cfg.index.dtype = "int8"
    cfg.index.rescore_k = 20
    indexer = ProjectIndexer(cfg)
    from codegraph_tpu.index.int8_flat import Int8FlatIndex

    assert isinstance(indexer.index, Int8FlatIndex)
    indexer.index_project(str(project))
    results = indexer.search.search_text("add two numbers", limit=3)
    assert any(r.name == "add_numbers" for r in results)


def test_index_project_ivfpq_config(project):
    cfg = make_cfg(project)
    cfg.index.kind = "ivfpq"
    cfg.index.pq_m = 16
    cfg.index.pq_refine = "f32"
    indexer = ProjectIndexer(cfg)
    from codegraph_tpu.index.ivfpq import IVFPQIndex

    assert isinstance(indexer.index, IVFPQIndex)
    indexer.index_project(str(project))
    # tiny corpus: nlist shrank and codebooks clamped below 2^8
    assert indexer.index.nlist <= len(indexer.index)
    assert indexer.index._books.shape[1] <= 256
    results = indexer.search.search_text("add two numbers", limit=3)
    assert any(r.name == "add_numbers" for r in results)


def test_save_load_roundtrip_ivfpq(project):
    def mk():
        cfg = make_cfg(project)
        cfg.index.kind = "ivfpq"
        cfg.index.pq_m = 16
        cfg.index.pq_refine = "f32"
        return cfg

    indexer = ProjectIndexer(mk())
    indexer.index_project(str(project))
    q = "start the http server"
    before = [r.node_id for r in indexer.search.search_text(q, limit=3)]
    directory = indexer.save()

    indexer2 = ProjectIndexer(mk())
    indexer2.load(directory)
    # codes stay uint8 and codebooks + refine store survive the reload
    import numpy as np

    assert np.asarray(indexer2.index._x).dtype == np.uint8
    assert indexer2.index._books is not None
    assert indexer2.index._raw_chunks
    after = [r.node_id for r in indexer2.search.search_text(q, limit=3)]
    assert before == after


def test_incremental_delete_cleans_bm25(tmp_path):
    """Modified/deleted files' nodes must leave the BM25 postings —
    regression: dead rows crowded the prefetch budget and postings grew
    without bound across incremental updates."""
    from codegraph_tpu.core.config import CodeGraphConfig

    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    f = tmp_path / "mod.py"
    f.write_text("def zanzibar_unique():\n    return 1\n")
    idx = ProjectIndexer(cfg)
    idx.index_project(str(tmp_path))
    n0 = idx.bm25.n_docs
    assert idx.bm25.search("zanzibar_unique")
    # modify: the old node text must leave BM25 (new row replaces it)
    f.write_text("def other_name():\n    return 2\n")
    idx.index_project(str(tmp_path))
    assert not [d for d, _ in idx.bm25.search("zanzibar_unique")
                if idx.store.node_by_row(d) is not None]
    # deleted file drops its docs entirely
    f.unlink()
    idx.index_project(str(tmp_path))
    assert idx.bm25.n_docs < n0 + 4  # no unbounded growth


def test_local_dataflow_edges_never_resolve_globally():
    """Edges flagged metadata={'local': True} (dataflow variables) must
    stay unresolved instead of binding to trigram-similar project
    symbols."""
    from codegraph_tpu.core.types import (
        CodeEdge, CodeNode, EdgeType, Language, Location, NodeType,
    )
    from codegraph_tpu.indexer.resolve import EdgeResolver
    from codegraph_tpu.models.providers import HashProvider

    cls = CodeNode.make("p", "Config", NodeType.CLASS, Language.PYTHON,
                        Location("a.py", 1, 10))
    fn = CodeNode.make("p", "loader", NodeType.FUNCTION, Language.PYTHON,
                       Location("b.py", 1, 5))
    local_edge = CodeEdge(src=fn.id, dst="config", edge_type=EdgeType.USES,
                          resolved=False, metadata={"local": True})
    real_edge = CodeEdge(src=fn.id, dst="Config", edge_type=EdgeType.USES,
                         resolved=False)
    r = EdgeResolver(HashProvider(dimension=32))
    unresolved, n_exact, n_sem, _ = r.resolve([local_edge, real_edge],
                                           [cls, fn])
    assert not local_edge.resolved
    assert real_edge.resolved and real_edge.dst == cls.id


def test_symbol_level_incremental_reembeds_only_changed_symbol(project):
    """watch/mod.rs:46,772 parity: a one-function edit re-embeds ONLY
    that function's chunks; unchanged symbols keep their rows, chunks,
    and incoming edges."""
    cfg = make_cfg(project)
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(project))
    store = indexer.store
    add_before = next(n for n in store.nodes.values()
                      if n.name == "add_numbers")
    add_row = add_before.row
    add_chunk_rows = sorted(
        c.row for c in store.chunks.values()
        if c.parent_node == add_before.id
    )
    assert add_chunk_rows
    live_before = len(indexer.index)

    # edit ONLY multiply_numbers' body (line count preserved so
    # add_numbers keeps its start_line -> same deterministic id)
    path = project / "math_utils.py"
    path.write_text(path.read_text().replace(
        "            total = add_numbers(total, a)",
        "            total = add_numbers(a, total)",
    ))
    stats = indexer.index_single_file(str(path))
    assert stats is not None
    # add_numbers (and the file node) survived untouched
    assert stats.nodes_reused >= 1
    add_after = next(n for n in store.nodes.values()
                     if n.name == "add_numbers")
    assert add_after.id == add_before.id and add_after.row == add_row
    assert sorted(
        c.row for c in store.chunks.values()
        if c.parent_node == add_after.id
    ) == add_chunk_rows
    # only the changed symbol's chunks were re-embedded
    mult = next(n for n in store.nodes.values()
                if n.name == "multiply_numbers")
    mult_chunks = [c for c in store.chunks.values()
                   if c.parent_node == mult.id]
    assert stats.chunks <= len(mult_chunks) + 1  # + possible file node chunk
    assert stats.chunks < len(
        [c for c in store.chunks.values()
         if store.nodes.get(c.parent_node) is not None
         and store.nodes[c.parent_node].location.file_path == str(path)]
    )
    # index live count: changed chunks tombstoned + re-added, net stable
    assert len(indexer.index) == live_before
    # the calls edge from multiply -> add was re-resolved after the edit
    assert any(
        e.src == mult.id and e.dst == add_after.id
        and e.edge_type == EdgeType.CALLS for e in store.edges
    )
    # and search still works end-to-end
    results = indexer.search.search_text("multiply numbers", limit=3)
    assert any(r.name == "multiply_numbers" for r in results)


def test_symbol_level_keep_preserves_incoming_edges(project):
    """Incoming edges from OTHER files to kept symbols survive a
    symbol-level update (the all-or-nothing delete severed them)."""
    cfg = make_cfg(project)
    indexer = ProjectIndexer(cfg)
    (project / "caller.py").write_text(
        "from math_utils import add_numbers\n\n"
        "def run_sum(xs):\n"
        "    t = 0\n"
        "    for x in xs:\n"
        "        t = add_numbers(t, x)\n"
        "    return t\n"
    )
    indexer.index_project(str(project))
    store = indexer.store
    add_node = next(n for n in store.nodes.values()
                    if n.name == "add_numbers")
    run_node = next(n for n in store.nodes.values() if n.name == "run_sum")
    assert any(e.src == run_node.id and e.dst == add_node.id
               for e in store.edges)
    # touch math_utils.py WITHOUT changing add_numbers
    path = project / "math_utils.py"
    path.write_text(path.read_text().replace(
        "            total = add_numbers(total, a)",
        "            total = add_numbers(a, total)",
    ))
    indexer.index_single_file(str(path))
    add_after = next(n for n in store.nodes.values()
                     if n.name == "add_numbers")
    assert any(e.src == run_node.id and e.dst == add_after.id
               for e in store.edges), "incoming edge to kept symbol lost"


def test_edge_resolver_receiver_and_external(tmp_path):
    """Round-5 ladder additions: self-receiver binding inside the
    enclosing type, import-alias expansion, enum-variant binding, and
    external classification of std/dependency targets (VERDICT r4
    item 6; reference indexer.rs:2113 labels these
    '(external dependencies/dynamic calls)')."""
    src = tmp_path / "svc.rs"
    src.write_text(
        "use std::sync::Arc;\n"
        "use tokio::time::sleep as snooze;\n"
        "pub enum Mode { Fast(u8), Careful { retries: u8 } }\n"
        "pub struct Svc { n: u32 }\n"
        "impl Svc {\n"
        "    pub fn helper(&self) -> u32 { self.n }\n"
        "    pub fn run(&self) -> u32 {\n"
        "        let m = Mode::Fast(1);\n"
        "        let v: Vec<u32> = (0..3).collect();\n"
        "        let _ = Careful(2);\n"
        "        snooze(d);\n"
        "        std::mem::take(&mut x);\n"
        "        self.helper()\n"
        "    }\n"
        "}\n"
    )
    from codegraph_tpu.parser.parser import SourceParser

    fp = SourceParser(str(tmp_path)).parse_file(str(src))
    nodes, edges = fp.result.nodes, fp.result.edges
    resolver = EdgeResolver(provider=None)
    unresolved, n_exact, n_sem, n_ext = resolver.resolve(edges, nodes)

    by_id = {n.id: n for n in nodes}
    run = next(n for n in nodes if n.name == "run")
    helper = next(n for n in nodes if n.name == "helper")
    enum_node = next(n for n in nodes if n.name == "Mode")

    resolved = {(by_id[e.src].name, by_id.get(e.dst).name)
                for e in edges
                if e.resolved and e.edge_type == EdgeType.CALLS
                and e.dst in by_id}
    # self.helper() bound inside the impl
    assert ("run", "helper") in resolved
    # Mode::Fast(..) owner-bound and bare Careful(..) variant-bound
    assert ("run", "Mode") in resolved
    # std/dep calls classified external, NOT left unresolved:
    ext = {e.dst: e.metadata.get("external") for e in edges
           if e.metadata.get("external")}
    assert any(v == "std" for v in ext.values())      # collect / mem::take
    assert n_ext >= 2
    # imports to std/tokio are external; none of the remaining
    # unresolved targets should be std noise
    leftover = {e.dst for e in unresolved}
    assert "collect" not in leftover
    assert "std::mem::take" not in leftover


def test_edge_resolver_import_alias_expansion():
    from codegraph_tpu.indexer.resolve import parse_import_aliases

    imp = CodeNode.make(
        "p", "serde::ser", NodeType.IMPORT, Language.RUST,
        Location("a.rs", 1, 1),
    )
    imp.content = "use serde::ser::{Serialize, SerializeStruct as SS};"
    pairs = dict(parse_import_aliases(imp))
    assert pairs["Serialize"] == "serde::ser::Serialize"
    assert pairs["SS"] == "serde::ser::SerializeStruct"

    pyimp = CodeNode.make(
        "p", "np", NodeType.IMPORT, Language.PYTHON, Location("b.py", 1, 1),
    )
    pyimp.content = "from numpy.linalg import norm as l2, svd"
    pairs = dict(parse_import_aliases(pyimp))
    assert pairs["l2"] == "numpy.linalg.norm"
    assert pairs["svd"] == "numpy.linalg.svd"
