import os
import textwrap

import pytest

from codegraph_tpu.core.types import EdgeType, Language, NodeType
from codegraph_tpu.parser.chunker import ChunkerConfig, build_chunk_plan, split_text
from codegraph_tpu.parser.complexity import cyclomatic_complexity
from codegraph_tpu.parser.extractors import extract_file
from codegraph_tpu.parser.files import collect_source_files
from codegraph_tpu.parser.parser import SourceParser
from codegraph_tpu.parser.watcher import FileWatcher


PY_SRC = textwrap.dedent('''
    import os
    from typing import List

    def helper(x):
        return x * 2

    class Greeter:
        def greet(self, name):
            if name:
                return helper(len(name))
            return 0

    def main():
        g = Greeter()
        return g.greet("world")
''')

RUST_SRC = textwrap.dedent('''
    use std::collections::HashMap;

    pub struct Config {
        pub name: String,
    }

    pub fn load_config(path: &str) -> Config {
        let map = parse_toml(path);
        Config { name: map.get("name") }
    }

    fn parse_toml(path: &str) -> HashMap<String, String> {
        HashMap::new()
    }
''')

GO_SRC = textwrap.dedent('''
    package main

    import "fmt"

    type Server struct {
        port int
    }

    func NewServer(port int) *Server {
        return &Server{port: port}
    }

    func (s *Server) Run() {
        fmt.Println(s.port)
    }
''')


def test_python_extraction_exact():
    r = extract_file("proj", "app.py", PY_SRC, Language.PYTHON)
    by_name = {n.name: n for n in r.nodes}
    assert by_name["helper"].node_type == NodeType.FUNCTION
    assert by_name["Greeter"].node_type == NodeType.CLASS
    assert by_name["greet"].node_type == NodeType.METHOD
    assert by_name["main"].node_type == NodeType.FUNCTION
    # calls edges (unresolved): greet -> helper, main -> Greeter/greet
    calls = [(e.src, e.dst) for e in r.edges
             if e.edge_type == EdgeType.CALLS and not e.resolved]
    assert (by_name["greet"].id, "helper") in calls
    # contains: class contains method
    contains = [(e.src, e.dst) for e in r.edges if e.edge_type == EdgeType.CONTAINS]
    assert (by_name["Greeter"].id, by_name["greet"].id) in contains
    # imports extracted
    assert any(n.node_type == NodeType.IMPORT for n in r.nodes)
    # complexity: greet has an if -> >= 2
    assert by_name["greet"].complexity >= 2


def test_rust_extraction_patterns():
    r = extract_file("proj", "lib.rs", RUST_SRC, Language.RUST)
    by_name = {n.name: n for n in r.nodes}
    assert by_name["Config"].node_type == NodeType.STRUCT
    assert by_name["load_config"].node_type == NodeType.FUNCTION
    assert by_name["parse_toml"].node_type == NodeType.FUNCTION
    calls = [e.dst for e in r.edges if e.edge_type == EdgeType.CALLS]
    assert "parse_toml" in calls
    # span covers the function body
    assert by_name["load_config"].location.end_line > by_name["load_config"].location.start_line


def test_go_extraction_patterns():
    r = extract_file("proj", "main.go", GO_SRC, Language.GO)
    names = {(n.name, n.node_type) for n in r.nodes}
    assert ("Server", NodeType.STRUCT) in names
    assert ("NewServer", NodeType.FUNCTION) in names
    # receiver funcs are METHODs, CONTAINS-linked to their struct
    assert ("Run", NodeType.METHOD) in names
    by_name = {n.name: n for n in r.nodes}
    contains = {(e.src, e.dst) for e in r.edges
                if e.edge_type == EdgeType.CONTAINS}
    assert (by_name["Server"].id, by_name["Run"].id) in contains


def test_all_13_languages_extract_something():
    samples = {
        Language.RUST: ("x.rs", "pub fn alpha() { beta(); }"),
        Language.PYTHON: ("x.py", "def alpha():\n    return beta()\n"),
        Language.JAVASCRIPT: ("x.js", "function alpha() { return beta(); }"),
        Language.TYPESCRIPT: ("x.ts", "export function alpha(): number { return beta(); }"),
        Language.GO: ("x.go", "func alpha() { beta() }"),
        Language.JAVA: ("X.java", "public class Alpha { public int alpha() { return beta(); } }"),
        Language.CPP: ("x.cpp", "int alpha() { return beta(); }"),
        Language.CSHARP: ("X.cs", "public class Alpha { public int Alpha2() { return Beta(); } }"),
        Language.RUBY: ("x.rb", "def alpha\n  beta\nend\n"),
        Language.PHP: ("x.php", "<?php function alpha() { return beta(); }"),
        Language.SWIFT: ("x.swift", "func alpha() { beta() }"),
        Language.KOTLIN: ("x.kt", "fun alpha(): Int { return beta() }"),
        Language.DART: ("x.dart", "int alpha() { return beta(); }"),
    }
    for lang, (path, src) in samples.items():
        r = extract_file("proj", path, src, lang)
        non_file = [n for n in r.nodes if n.node_type != NodeType.FILE]
        assert non_file, f"{lang.value} extracted nothing"


def test_collect_source_files(tmp_path):
    (tmp_path / "a.py").write_text("x = 1\n")
    (tmp_path / "big.py").write_text("y = 2\n" * 100)
    (tmp_path / "README.md").write_text("docs")
    sub = tmp_path / "node_modules"
    sub.mkdir()
    (sub / "dep.js").write_text("ignored")
    (tmp_path / ".gitignore").write_text("secret.py\n")
    (tmp_path / "secret.py").write_text("password = 'x'\n")
    files = collect_source_files(str(tmp_path))
    names = [os.path.basename(p) for p, _ in files]
    assert "a.py" in names and "big.py" in names
    assert "README.md" not in names
    assert "dep.js" not in names
    assert "secret.py" not in names
    # largest-first scheduling
    assert names[0] == "big.py"


def test_source_parser_directory_and_cache(tmp_path):
    (tmp_path / "m.py").write_text(PY_SRC)
    (tmp_path / "l.rs").write_text(RUST_SRC)
    parser = SourceParser(project=str(tmp_path), workers=2)
    parses, stats = parser.parse_directory(str(tmp_path))
    assert stats.parsed == 2
    assert stats.nodes > 5
    # re-parse hits the content-hash cache (same object returned)
    fp1 = parser.parse_file(str(tmp_path / "m.py"))
    fp2 = parser.parse_file(str(tmp_path / "m.py"))
    assert fp1 is fp2


def test_chunker_overlap_and_budget():
    text = "\n".join(f"line {i} with some content here" for i in range(100))
    chunks = split_text(text, max_tokens=400, overlap=60, count=lambda s: len(s.encode()))
    assert len(chunks) > 1
    for c in chunks:
        assert len(c.encode()) <= 400 + 40  # small slack for line granularity
    # consecutive chunks share overlap content
    assert chunks[0].splitlines()[-1] in chunks[1]


def test_chunk_plan_links_parents():
    r = extract_file("proj", "app.py", PY_SRC, Language.PYTHON)
    plan = build_chunk_plan(r.nodes, ChunkerConfig(max_tokens=128, overlap_tokens=16))
    assert plan.stats.n_chunks == len(plan.chunks) > 0
    node_ids = {n.id for n in r.nodes}
    assert all(c.parent_node in node_ids for c in plan.chunks)


def test_complexity_counts():
    assert cyclomatic_complexity("return 1") == 1
    assert cyclomatic_complexity("if a: pass\nelif b: pass") >= 3
    assert cyclomatic_complexity("while x && y || z: f()") >= 4


def test_watcher_detects_changes(tmp_path):
    (tmp_path / "w.py").write_text("a = 1\n")
    watcher = FileWatcher(str(tmp_path), debounce_s=0.0)
    (tmp_path / "new.py").write_text("b = 2\n")
    os.utime(tmp_path / "w.py", (0, 9_999_999_999))
    watcher.poll_once()
    batch = watcher.next_batch()
    assert str(tmp_path / "new.py") in batch.created
    assert str(tmp_path / "w.py") in batch.modified
    (tmp_path / "new.py").unlink()
    watcher.poll_once()
    batch = watcher.next_batch()
    assert str(tmp_path / "new.py") in batch.deleted


def test_watcher_simulate_event(tmp_path):
    watcher = FileWatcher(str(tmp_path), debounce_s=0.0)
    watcher.simulate_event("/x/y.py", "modified")
    batch = watcher.next_batch()
    assert batch.modified == ["/x/y.py"]
