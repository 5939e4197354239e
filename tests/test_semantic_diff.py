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
from codegraph_tpu.graph.propagation import PropagationManager
from codegraph_tpu.graph.store import GraphStore
from codegraph_tpu.parser.diff import DiffBasedParser, changed_line_ranges
from codegraph_tpu.parser.extractors import extract_file
from codegraph_tpu.parser.semantic import SemanticAnalyzer


SRC_V1 = textwrap.dedent('''
    def helper(x):
        return x + 1

    def main():
        return helper(1)
''')

SRC_V2 = textwrap.dedent('''
    def helper(x):
        return x + 2

    def main():
        return helper(1)
''')


def test_changed_line_ranges():
    ranges = changed_line_ranges(SRC_V1, SRC_V2)
    assert len(ranges) == 1
    assert ranges[0].start <= 3 <= ranges[0].end  # "return x + 2" line


def test_diff_parser_reuses_unchanged_nodes():
    old = extract_file("p", "a.py", SRC_V1, Language.PYTHON)
    inc = DiffBasedParser().parse_incremental(
        "p", "a.py", SRC_V1, SRC_V2, old, Language.PYTHON
    )
    names_affected = {
        n.name for n in inc.result.nodes if n.id in inc.affected_node_ids
    }
    names_reused = {
        n.name for n in inc.result.nodes if n.id in inc.reused_node_ids
    }
    assert "helper" in names_affected
    assert "main" in names_reused


def test_diff_parser_identical_text_all_reused():
    old = extract_file("p", "a.py", SRC_V1, Language.PYTHON)
    inc = DiffBasedParser().parse_incremental(
        "p", "a.py", SRC_V1, SRC_V1, old, Language.PYTHON
    )
    assert not inc.changed_ranges
    assert not inc.affected_node_ids
    assert len(inc.reused_node_ids) == len(old.nodes)


def test_semantic_scope_resolution_shadowing():
    src = textwrap.dedent('''
        def target():
            return 1

        class Widget:
            def target(self):
                return 2

            def caller(self):
                return target()
    ''')
    r = extract_file("p", "a.py", src, Language.PYTHON)
    model = SemanticAnalyzer().build(r.nodes, r.edges)
    by_name = {}
    for n in r.nodes:
        by_name.setdefault(n.name, []).append(n)
    # caller's scope is inside Widget: "target" resolves to the METHOD
    refs = [ref for ref in model.references if ref.to_symbol == "target"]
    assert refs
    method_target = next(
        n.id for n in by_name["target"] if n.node_type == NodeType.METHOD
    )
    assert refs[0].resolved_to == method_target


def test_semantic_change_impact():
    def mk(name):
        return CodeNode.make("p", name, NodeType.FUNCTION, Language.PYTHON,
                             Location("a.py", 1, 2))

    a, b, c = mk("a"), mk("b"), mk("c")
    edges = [
        CodeEdge(b.id, a.id, EdgeType.CALLS),  # b calls a
        CodeEdge(c.id, b.id, EdgeType.CALLS),  # c calls b
    ]
    impact = SemanticAnalyzer().compute_change_impact([a.id], [a, b, c], edges)
    assert impact == {b.id: 1, c.id: 2}


def test_propagation_manager():
    store = GraphStore()

    def mk(name, path):
        return CodeNode.make("p", name, NodeType.FUNCTION, Language.PYTHON,
                             Location(path, 1, 2))

    core = mk("core_fn", "core.py")
    user1 = mk("user1", "app/a.py")
    user2 = mk("user2", "app/b.py")
    store.upsert_nodes([core, user1, user2])
    store.add_edges([
        CodeEdge(user1.id, core.id, EdgeType.CALLS),
        CodeEdge(user2.id, user1.id, EdgeType.USES),
    ])
    store.file_nodes.setdefault("core.py", [core.id])
    plan = PropagationManager(store).plan_for_files(["core.py"])
    names = {(i.name, i.distance) for i in plan.impacted}
    assert ("user1", 1) in names and ("user2", 2) in names
    assert plan.impacted[0].name == "user1"  # closer = higher priority
    assert set(plan.files_to_reanalyze) == {"app/a.py", "app/b.py"}
