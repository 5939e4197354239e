import textwrap

import pytest

from codegraph_tpu.core.types import (
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)
from codegraph_tpu.indexer.analyzers import (
    AnalyzerSettings,
    ArchitectureAnalyzer,
    BuildContextAnalyzer,
    DataflowAnalyzer,
    DocsContractsAnalyzer,
    EnrichmentAnalyzer,
    ModuleLinker,
    run_analyzers,
)
from codegraph_tpu.parser.extractors import extract_file


def test_settings_tiers():
    fast = AnalyzerSettings.for_tier("fast")
    assert not fast.modules and not fast.dataflow
    balanced = AnalyzerSettings.for_tier("balanced")
    assert balanced.modules and not balanced.dataflow
    full = AnalyzerSettings.for_tier("full")
    assert full.dataflow and full.architecture


def _nodes_from(path, src, lang):
    return extract_file("proj", path, src, lang)


def test_module_linker_creates_module_graph():
    py = _nodes_from("web/server.py", "import parser\n\ndef serve(): pass\n",
                     Language.PYTHON)
    py2 = _nodes_from("parser/lex.py", "def lex(): pass\n", Language.PYTHON)
    nodes = py.nodes + py2.nodes
    out = ModuleLinker().run("proj", nodes)
    mods = [n for n in out.nodes if n.node_type == NodeType.MODULE]
    assert {m.name for m in mods} == {"web", "parser"}
    # web imports parser -> module-level imports edge
    mod_edges = [e for e in out.edges if e.edge_type == EdgeType.IMPORTS]
    assert len(mod_edges) == 1


def test_dataflow_analyzer_edges():
    src = textwrap.dedent('''
        def compute(data):
            total = 0
            for x in data:
                total += x
            return total
    ''')
    r = _nodes_from("a.py", src, Language.PYTHON)
    out = DataflowAnalyzer().run("proj", r.nodes)
    kinds = {e.edge_type for e in out.edges}
    assert EdgeType.RETURNS in kinds
    assert EdgeType.MUTATES in kinds
    fn = next(n for n in r.nodes if n.name == "compute")
    assert "total" in fn.metadata["dataflow"]["locals"]


def test_docs_analyzer_python_and_rust():
    py = _nodes_from("a.py", 'def f():\n    """Adds things up."""\n    return 1\n',
                     Language.PYTHON)
    out = DocsContractsAnalyzer().run("proj", py.nodes)
    assert out.counters["doc_nodes"] == 1
    assert out.nodes[0].content == "Adds things up."

    rs = _nodes_from("a.rs", "/// Parses a file.\npub fn parse() {}\n",
                     Language.RUST)
    # rust extractor span starts at fn line; attach doc comment into content
    rs.nodes[0].content = "/// Parses a file.\n" + rs.nodes[0].content
    out = DocsContractsAnalyzer().run("proj", rs.nodes)
    assert out.counters["doc_nodes"] >= 1


def test_build_context_analyzer(tmp_path):
    (tmp_path / "pyproject.toml").write_text(textwrap.dedent('''
        [project]
        name = "mypkg"
        dependencies = ["numpy>=1.0", "requests"]
    '''))
    sub = tmp_path / "frontend"
    sub.mkdir()
    (sub / "package.json").write_text('{"name": "web", "dependencies": {"react": "^18"}}')
    out = BuildContextAnalyzer().run("proj", str(tmp_path))
    pkgs = {n.name for n in out.nodes if n.node_type == NodeType.PACKAGE}
    assert pkgs == {"mypkg", "web"}
    deps = {e.dst for e in out.edges if e.edge_type == EdgeType.DEPENDS_ON}
    assert {"numpy", "requests", "react"} <= deps


def test_architecture_boundary_violation():
    def mk(name, path):
        return CodeNode.make("p", name, NodeType.FUNCTION, Language.PYTHON,
                             Location(path, 1, 2))

    a = mk("user", "appa/main.py")
    b = mk("internal", "libb/internal/deep.py")
    edges = [CodeEdge(a.id, b.id, EdgeType.IMPORTS, resolved=True)]
    out = ArchitectureAnalyzer().run("p", [a, b], edges)
    assert out.counters["boundary_violations"] == 1
    v = out.edges[0]
    assert v.edge_type == EdgeType.VIOLATES_BOUNDARY
    assert v.metadata["into"] == "libb"


def test_enrichment_reference_counts():
    def mk(name):
        return CodeNode.make("p", name, NodeType.FUNCTION, Language.PYTHON,
                             Location("a.py", 1, 2), content=f"def {name}(): ...")

    a, b = mk("caller"), mk("callee")
    edges = [CodeEdge(a.id, b.id, EdgeType.CALLS)]
    out = EnrichmentAnalyzer().run("p", [a, b], edges)
    assert out.counters["symbols_enriched"] == 2
    assert b.metadata["references"] == 1
    assert a.metadata["references"] == 0


def test_run_analyzers_integration(tmp_path):
    (tmp_path / "pyproject.toml").write_text(
        '[project]\nname = "x"\ndependencies = []\n'
    )
    r = _nodes_from("pkg/mod.py", 'def f():\n    """doc."""\n    v = 1\n    return v\n',
                    Language.PYTHON)
    out = run_analyzers("proj", str(tmp_path), r.nodes, r.edges)
    assert out.counters.get("packages") == 1
    assert out.counters.get("doc_nodes") == 1
    assert out.counters.get("module_nodes", 0) >= 1


def test_indexer_runs_analyzers(tmp_path):
    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.indexer.indexer import ProjectIndexer

    (tmp_path / "app.py").write_text(
        'def f():\n    """Docstring."""\n    return 1\n'
    )
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    cfg.indexing.tier = "full"
    indexer = ProjectIndexer(cfg)
    stats = indexer.index_project(str(tmp_path))
    assert stats.analyzer_counters.get("doc_nodes") == 1
    assert any(n.node_type == NodeType.DOC for n in indexer.store.nodes.values())


def test_pipeline_reaches_lsp_analyzer(tmp_path, monkeypatch):
    """index_project must hand the parsed files to the LSP analyzer when
    CODEGRAPH_LSP=1 + tier=full — round-2 regression: run_analyzers
    gated on `files` but the pipeline never passed them."""
    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.indexer.indexer import ProjectIndexer
    import codegraph_tpu.indexer.lsp as lspmod

    (tmp_path / "m.py").write_text("def f():\n    return 1\n")
    seen = {}

    class StubAnalyzer:
        def run(self, root, files, nodes):
            seen["files"] = dict(files)
            from codegraph_tpu.indexer.lsp import LSPEnrichment

            return LSPEnrichment()

    monkeypatch.setattr(lspmod, "LSPAnalyzer", StubAnalyzer)
    monkeypatch.setenv("CODEGRAPH_LSP", "1")
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.indexing.tier = "full"
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    idx = ProjectIndexer(cfg)
    idx.index_project(str(tmp_path))
    assert seen, "LSP analyzer was never invoked"
    paths = list(seen["files"])
    assert any(p.endswith("m.py") for p in paths)
    lang, text = seen["files"][paths[0]]
    assert "def f" in text
