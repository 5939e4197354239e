"""External-LSP client (indexer/lsp.py) against the scripted fake server
(tests/fake_lsp_server.py): handshake, framing, documentSymbol-driven
enrichment, and failure modes. Round-1 VERDICT item 7 exit criteria."""

import os
import sys

import pytest

from codegraph_tpu.core.types import (
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)
from codegraph_tpu.indexer.lsp import (
    LSPAnalyzer,
    LSPClient,
    LSPError,
    available_servers,
)

FAKE = [sys.executable,
        os.path.join(os.path.dirname(__file__), "fake_lsp_server.py")]

SRC = """class Greeter:
    def greet(self):
        return 1

def standalone():
    return 2
"""


@pytest.fixture
def client(tmp_path):
    c = LSPClient(FAKE, str(tmp_path), timeout=60.0)
    yield c
    c.shutdown()


def test_initialize_handshake(client):
    result = client.initialize()
    assert result["serverInfo"]["name"] == "fake-lsp"
    assert result["capabilities"]["documentSymbolProvider"] is True


def test_document_symbols_hierarchy(client, tmp_path):
    client.initialize()
    path = str(tmp_path / "m.py")
    client.did_open(path, "python", SRC)
    syms = client.document_symbols(path)
    names = {s["name"] for s in syms}
    assert names == {"Greeter", "standalone"}
    greeter = next(s for s in syms if s["name"] == "Greeter")
    assert [c["name"] for c in greeter["children"]] == ["greet"]
    assert greeter["kind"] == 5


def test_references(client, tmp_path):
    client.initialize()
    path = str(tmp_path / "m.py")
    client.did_open(path, "python", SRC)
    refs = client.references(path, 1, 8)
    assert len(refs) == 1 and "uri" in refs[0]


def test_request_timeout_unknown_server(tmp_path):
    # a server that never replies -> timeout, not hang
    c = LSPClient(["sleep", "30"], str(tmp_path), timeout=0.5)
    with pytest.raises(LSPError):
        c.request("initialize", {})
    c.shutdown()


def test_analyzer_enrichment_end_to_end(tmp_path):
    """LSPAnalyzer drives the full flow: spawn, handshake, didOpen,
    documentSymbol, node matching, CONTAINS edges + metadata."""
    path = str(tmp_path / "m.py")
    (tmp_path / "m.py").write_text(SRC)

    def make_node(name, ntype, line):
        return CodeNode.make("p", name, ntype, Language.PYTHON,
                             Location(path, line, line + 2), content="")

    greeter = make_node("Greeter", NodeType.CLASS, 1)
    greet = make_node("greet", NodeType.METHOD, 2)
    standalone = make_node("standalone", NodeType.FUNCTION, 5)

    def factory(lang, root):
        c = LSPClient(FAKE, root, timeout=60.0)
        c.initialize()
        return c

    analyzer = LSPAnalyzer(client_factory=factory)
    out = analyzer.run(
        str(tmp_path),
        {path: (Language.PYTHON, SRC)},
        [greeter, greet, standalone],
    )
    assert out.files_processed == 1
    assert out.symbols_enriched == 3
    assert greeter.metadata["lsp_kind"] == "class"
    assert greet.metadata["lsp_kind"] == "method"
    assert standalone.metadata["lsp_kind"] == "function"
    # hierarchy edge from the server's symbol tree
    assert any(e.src == greeter.id and e.dst == greet.id
               and e.edge_type == EdgeType.CONTAINS for e in out.edges)


def test_available_servers_probes_path():
    # no language servers in this image: must return {} without raising
    assert isinstance(available_servers(), dict)
