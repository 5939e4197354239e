"""Per-language node/edge extraction (13 languages).

Reference: crates/codegraph-parser/src/languages/*.rs (13 tree-sitter
extractors producing ExtractionResult{nodes, edges}) + the FastML
pattern/symbol pass (src/fast_ml/pattern_matcher.rs:29,
symbol_resolver.rs:36-81). Python extraction is exact (stdlib `ast`);
the other 12 languages use declaration patterns + brace/indent span
scanning. Call/use edges are emitted *unresolved* (dst = symbol name);
the indexer's resolution stage maps them to node ids
(reference: indexer.rs:2673 edge resolution).
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Pattern, Sequence, Tuple

from codegraph_tpu.core.types import (
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)
from codegraph_tpu.parser.complexity import cyclomatic_complexity

MAX_NODE_LINES = 500


@dataclass
class ExtractionResult:
    nodes: List[CodeNode] = field(default_factory=list)
    edges: List[CodeEdge] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Python: exact AST extraction
# ---------------------------------------------------------------------------

_PY_BUILTINS = frozenset((
    "print", "len", "range", "str", "int", "float", "list", "dict", "set",
    "tuple", "isinstance", "super", "type", "enumerate", "zip", "map",
    "filter", "sorted", "min", "max", "sum", "abs", "open", "getattr",
    "setattr", "hasattr", "repr", "iter", "next", "vars", "id", "bool",
))


def _extract_python(project: str, path: str, text: str) -> ExtractionResult:
    result = ExtractionResult()
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return result
    lines = text.splitlines()

    def node_text(a: ast.AST) -> str:
        start = a.lineno - 1
        end = getattr(a, "end_lineno", a.lineno)
        return "\n".join(lines[start:end][:MAX_NODE_LINES])

    def calls_in(a: ast.AST) -> List[str]:
        names = []
        for sub in ast.walk(a):
            if isinstance(sub, ast.Call):
                fn = sub.func
                if isinstance(fn, ast.Name) and fn.id not in _PY_BUILTINS:
                    names.append(fn.id)
                elif isinstance(fn, ast.Attribute):
                    names.append(fn.attr)
        return names

    def add_def(a, ntype: NodeType, parent: Optional[CodeNode]) -> CodeNode:
        loc = Location(path, a.lineno, getattr(a, "end_lineno", a.lineno))
        node = CodeNode.make(
            project, a.name, ntype, Language.PYTHON, loc,
            content=node_text(a), complexity=cyclomatic_complexity(node_text(a)),
        )
        result.nodes.append(node)
        if parent is not None:
            result.edges.append(CodeEdge(parent.id, node.id, EdgeType.CONTAINS))
        for callee in set(calls_in(a)):
            if callee != a.name:
                result.edges.append(
                    CodeEdge(node.id, callee, EdgeType.CALLS, resolved=False)
                )
        return node

    def visit_body(body, parent: Optional[CodeNode]):
        for a in body:
            if isinstance(a, (ast.FunctionDef, ast.AsyncFunctionDef)):
                ntype = NodeType.METHOD if parent and parent.node_type in (
                    NodeType.CLASS,
                ) else NodeType.FUNCTION
                fn = add_def(a, ntype, parent)
                visit_body(a.body, fn)
            elif isinstance(a, ast.ClassDef):
                cls = add_def(a, NodeType.CLASS, parent)
                for base in a.bases:
                    base_name = (
                        base.id if isinstance(base, ast.Name)
                        else base.attr if isinstance(base, ast.Attribute) else None
                    )
                    if base_name:
                        result.edges.append(CodeEdge(
                            cls.id, base_name, EdgeType.EXTENDS, resolved=False
                        ))
                visit_body(a.body, cls)
            elif isinstance(a, (ast.Import, ast.ImportFrom)):
                mod = (
                    a.module if isinstance(a, ast.ImportFrom) and a.module
                    else ",".join(n.name for n in a.names)
                )
                loc = Location(path, a.lineno, a.lineno)
                imp = CodeNode.make(
                    project, mod or "import", NodeType.IMPORT, Language.PYTHON,
                    loc, content=node_text(a),
                )
                result.nodes.append(imp)
                result.edges.append(CodeEdge(
                    imp.id, mod or "", EdgeType.IMPORTS, resolved=False
                ))

    visit_body(tree.body, None)
    return result


# ---------------------------------------------------------------------------
# Pattern-based extraction for the other 12 languages
# ---------------------------------------------------------------------------

@dataclass
class LangSpec:
    """Declaration patterns: list of (regex with a `name` group, NodeType)."""

    decls: List[Tuple[Pattern, NodeType]]
    import_re: Optional[Pattern] = None
    block: str = "brace"  # brace | end | indent
    keywords: frozenset = frozenset()


_COMMON_KEYWORDS = frozenset((
    "if", "else", "for", "while", "switch", "case", "return", "break",
    "continue", "new", "delete", "sizeof", "typeof", "match", "try",
    "catch", "throw", "do", "in", "of", "not", "and", "or", "assert",
    "yield", "await", "async", "let", "var", "const", "fn", "func",
    "function", "def", "class", "struct", "enum", "trait", "impl",
    "interface", "public", "private", "static", "void", "int", "this",
    "self", "super", "true", "false", "null", "nil", "None",
))


def _spec(decls, import_re=None, block="brace"):
    return LangSpec(
        decls=[(re.compile(p, re.M), t) for p, t in decls],
        import_re=re.compile(import_re, re.M) if import_re else None,
        block=block,
    )


_LANG_SPECS: Dict[Language, LangSpec] = {
    Language.RUST: _spec(
        [
            (r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:async\s+)?(?:unsafe\s+)?fn\s+(?P<name>\w+)", NodeType.FUNCTION),
            (r"^\s*(?:pub(?:\([^)]*\))?\s+)?struct\s+(?P<name>\w+)", NodeType.STRUCT),
            (r"^\s*(?:pub(?:\([^)]*\))?\s+)?enum\s+(?P<name>\w+)", NodeType.ENUM),
            (r"^\s*(?:pub(?:\([^)]*\))?\s+)?trait\s+(?P<name>\w+)", NodeType.TRAIT),
            (r"^\s*(?:pub(?:\([^)]*\))?\s+)?mod\s+(?P<name>\w+)", NodeType.MODULE),
            (r"^\s*(?:pub(?:\([^)]*\))?\s+)?type\s+(?P<name>\w+)\s*=", NodeType.TYPE_ALIAS),
            (r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:const|static)\s+(?P<name>\w+)\s*:", NodeType.CONSTANT),
            (r"^\s*macro_rules!\s+(?P<name>\w+)", NodeType.MACRO),
        ],
        import_re=r"^\s*use\s+(?P<name>[\w:]+)",
    ),
    Language.JAVASCRIPT: _spec(
        [
            (r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*(?P<name>\w+)", NodeType.FUNCTION),
            (r"^\s*(?:export\s+)?(?:const|let|var)\s+(?P<name>\w+)\s*=\s*(?:async\s+)?(?:\([^)]*\)|\w+)\s*=>", NodeType.FUNCTION),
            (r"^\s*(?:export\s+)?(?:default\s+)?class\s+(?P<name>\w+)", NodeType.CLASS),
        ],
        import_re=r"^\s*import\s+.*?from\s+['\"](?P<name>[^'\"]+)['\"]|^\s*(?:const|let|var)\s+\w+\s*=\s*require\(['\"](?P<name2>[^'\"]+)['\"]\)",
    ),
    Language.TYPESCRIPT: _spec(
        [
            (r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*(?P<name>\w+)", NodeType.FUNCTION),
            (r"^\s*(?:export\s+)?(?:const|let|var)\s+(?P<name>\w+)\s*(?::[^=]+)?=\s*(?:async\s+)?(?:\([^)]*\)|\w+)\s*(?::\s*[\w<>\[\], ]+)?\s*=>", NodeType.FUNCTION),
            (r"^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*(?:export\s+)?interface\s+(?P<name>\w+)", NodeType.INTERFACE),
            (r"^\s*(?:export\s+)?enum\s+(?P<name>\w+)", NodeType.ENUM),
            (r"^\s*(?:export\s+)?type\s+(?P<name>\w+)\s*=", NodeType.TYPE_ALIAS),
        ],
        import_re=r"^\s*import\s+.*?from\s+['\"](?P<name>[^'\"]+)['\"]",
    ),
    Language.GO: _spec(
        [
            (r"^\s*func\s+(?:\([^)]*\)\s+)?(?P<name>\w+)\s*\(", NodeType.FUNCTION),
            (r"^\s*type\s+(?P<name>\w+)\s+struct\b", NodeType.STRUCT),
            (r"^\s*type\s+(?P<name>\w+)\s+interface\b", NodeType.INTERFACE),
        ],
        import_re=r"^\s*import\s+(?:\w+\s+)?\"(?P<name>[^\"]+)\"",
    ),
    Language.JAVA: _spec(
        [
            (r"^\s*(?:@\w+\s+)*(?:public|protected|private)?\s*(?:static\s+)?(?:final\s+)?(?:abstract\s+)?class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*(?:public|protected|private)?\s*interface\s+(?P<name>\w+)", NodeType.INTERFACE),
            (r"^\s*(?:public|protected|private)?\s*enum\s+(?P<name>\w+)", NodeType.ENUM),
            (r"^\s*(?:@\w+(?:\([^)]*\))?\s+)*(?:public|protected|private)\s+(?:static\s+)?(?:final\s+)?(?:synchronized\s+)?[\w<>\[\], ]+\s+(?P<name>\w+)\s*\([^;]*\)\s*(?:throws\s+[\w, ]+)?\s*\{", NodeType.METHOD),
        ],
        import_re=r"^\s*import\s+(?:static\s+)?(?P<name>[\w.]+)",
    ),
    Language.CPP: _spec(
        [
            (r"^\s*(?:template\s*<[^>]*>\s*)?class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*(?:template\s*<[^>]*>\s*)?struct\s+(?P<name>\w+)", NodeType.STRUCT),
            (r"^\s*enum\s+(?:class\s+)?(?P<name>\w+)", NodeType.ENUM),
            (r"^\s*namespace\s+(?P<name>\w+)", NodeType.MODULE),
            (r"^[\w:*&<>,~ ]+?\b(?P<name>[\w~]+)\s*\([^;{]*\)\s*(?:const\s*)?(?:noexcept\s*)?(?:override\s*)?\{", NodeType.FUNCTION),
        ],
        import_re=r"^\s*#include\s+[<\"](?P<name>[^>\"]+)[>\"]",
    ),
    Language.CSHARP: _spec(
        [
            (r"^\s*(?:\[[^\]]*\]\s*)*(?:public|internal|private|protected)?\s*(?:static\s+|sealed\s+|abstract\s+|partial\s+)*class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*(?:public|internal)?\s*interface\s+(?P<name>\w+)", NodeType.INTERFACE),
            (r"^\s*(?:public|internal)?\s*enum\s+(?P<name>\w+)", NodeType.ENUM),
            (r"^\s*(?:public|internal)?\s*(?:readonly\s+)?struct\s+(?P<name>\w+)", NodeType.STRUCT),
            (r"^\s*(?:\[[^\]]*\]\s*)*(?:public|private|protected|internal)\s+(?:static\s+|async\s+|virtual\s+|override\s+|sealed\s+)*[\w<>\[\], ?]+\s+(?P<name>\w+)\s*\([^;]*\)\s*\{", NodeType.METHOD),
        ],
        import_re=r"^\s*using\s+(?P<name>[\w.]+)\s*;",
    ),
    Language.RUBY: _spec(
        [
            (r"^\s*def\s+(?:self\.)?(?P<name>[\w?!]+)", NodeType.METHOD),
            (r"^\s*class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*module\s+(?P<name>\w+)", NodeType.MODULE),
        ],
        import_re=r"^\s*require(?:_relative)?\s+['\"](?P<name>[^'\"]+)['\"]",
        block="end",
    ),
    Language.PHP: _spec(
        [
            (r"(?:^|\s)(?:public\s+|private\s+|protected\s+)?(?:static\s+)?function\s+(?P<name>\w+)", NodeType.FUNCTION),
            (r"^\s*(?:abstract\s+|final\s+)?class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*interface\s+(?P<name>\w+)", NodeType.INTERFACE),
            (r"^\s*trait\s+(?P<name>\w+)", NodeType.TRAIT),
        ],
        import_re=r"^\s*use\s+(?P<name>[\w\\]+)",
    ),
    Language.SWIFT: _spec(
        [
            (r"^\s*(?:public\s+|private\s+|internal\s+|open\s+)?(?:static\s+)?func\s+(?P<name>\w+)", NodeType.FUNCTION),
            (r"^\s*(?:public\s+|open\s+)?(?:final\s+)?class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*(?:public\s+)?struct\s+(?P<name>\w+)", NodeType.STRUCT),
            (r"^\s*(?:public\s+)?enum\s+(?P<name>\w+)", NodeType.ENUM),
            (r"^\s*(?:public\s+)?protocol\s+(?P<name>\w+)", NodeType.INTERFACE),
            (r"^\s*(?:public\s+)?extension\s+(?P<name>\w+)", NodeType.TRAIT),
        ],
        import_re=r"^\s*import\s+(?P<name>\w+)",
    ),
    Language.KOTLIN: _spec(
        [
            (r"^\s*(?:public\s+|private\s+|internal\s+)?(?:suspend\s+)?fun\s+(?:<[^>]*>\s*)?(?:[\w.]+\.)?(?P<name>\w+)\s*\(", NodeType.FUNCTION),
            (r"^\s*(?:public\s+|internal\s+)?(?:data\s+|sealed\s+|abstract\s+|open\s+)*class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*(?:public\s+)?interface\s+(?P<name>\w+)", NodeType.INTERFACE),
            (r"^\s*(?:public\s+)?object\s+(?P<name>\w+)", NodeType.MODULE),
            (r"^\s*(?:public\s+)?enum\s+class\s+(?P<name>\w+)", NodeType.ENUM),
        ],
        import_re=r"^\s*import\s+(?P<name>[\w.]+)",
    ),
    Language.DART: _spec(
        [
            (r"^\s*(?:abstract\s+)?class\s+(?P<name>\w+)", NodeType.CLASS),
            (r"^\s*enum\s+(?P<name>\w+)", NodeType.ENUM),
            (r"^\s*(?:static\s+)?(?:Future<[^>]*>|Stream<[^>]*>|void|[\w<>\[\], ?]+)\s+(?P<name>\w+)\s*\([^;]*\)\s*(?:async\s*\*?\s*)?\{", NodeType.FUNCTION),
        ],
        import_re=r"^\s*import\s+['\"](?P<name>[^'\"]+)['\"]",
    ),
}

_CALL_RE = re.compile(r"\b([A-Za-z_]\w*)\s*\(")


def _block_end(lines: Sequence[str], start: int, block: str) -> int:
    """Find the end line (1-based, inclusive) of a block starting at
    `start` (0-based). Brace matching for C-family, `end` counting for
    ruby; falls back to single line."""
    n = min(len(lines), start + MAX_NODE_LINES)
    if block == "brace":
        depth = 0
        opened = False
        for i in range(start, n):
            for ch in lines[i]:
                if ch == "{":
                    depth += 1
                    opened = True
                elif ch == "}":
                    depth -= 1
                    if opened and depth <= 0:
                        return i + 1
            if not opened and i > start + 3:
                break  # declaration without a body (e.g. prototype)
        return min(start + 1, len(lines))
    if block == "end":
        depth = 0
        starters = re.compile(
            r"^\s*(def|class|module|if|unless|while|until|for|case|do|begin)\b"
        )
        for i in range(start, n):
            if starters.match(lines[i]) or re.search(r"\bdo\s*(\|[^|]*\|)?\s*$", lines[i]):
                depth += 1
            if re.match(r"^\s*end\b", lines[i]):
                depth -= 1
                if depth <= 0:
                    return i + 1
        return min(start + 1, len(lines))
    return start + 1


def _extract_pattern(
    project: str, path: str, text: str, language: Language
) -> ExtractionResult:
    result = ExtractionResult()
    spec = _LANG_SPECS.get(language)
    if spec is None:
        return result
    lines = text.splitlines()
    line_starts = [0]
    for ln in lines:
        line_starts.append(line_starts[-1] + len(ln) + 1)

    def line_of(pos: int) -> int:
        import bisect

        return bisect.bisect_right(line_starts, pos) - 1  # 0-based

    for pattern, ntype in spec.decls:
        for m in pattern.finditer(text):
            name = m.group("name")
            if not name or name in _COMMON_KEYWORDS:
                continue
            start = line_of(m.start())
            end = _block_end(lines, start, spec.block)
            body = "\n".join(lines[start:end])
            loc = Location(path, start + 1, end)
            node = CodeNode.make(
                project, name, ntype, language, loc,
                content=body[: MAX_NODE_LINES * 120],
                complexity=cyclomatic_complexity(body),
            )
            result.nodes.append(node)
            if ntype in (NodeType.FUNCTION, NodeType.METHOD):
                callees = set()
                for cm in _CALL_RE.finditer(body):
                    cal = cm.group(1)
                    if cal not in _COMMON_KEYWORDS and cal != name:
                        callees.add(cal)
                for cal in sorted(callees)[:40]:
                    result.edges.append(
                        CodeEdge(node.id, cal, EdgeType.CALLS, resolved=False)
                    )

    if spec.import_re is not None:
        for m in spec.import_re.finditer(text):
            name = next((g for g in m.groups() if g), None)
            if not name:
                continue
            start = line_of(m.start()) + 1
            loc = Location(path, start, start)
            imp = CodeNode.make(
                project, name, NodeType.IMPORT, language, loc,
                content=m.group(0).strip(),
            )
            result.nodes.append(imp)
            result.edges.append(CodeEdge(imp.id, name, EdgeType.IMPORTS, resolved=False))
    return result


def extract_file(
    project: str, path: str, text: str, language: Language
) -> ExtractionResult:
    """Extract nodes + (possibly unresolved) edges from one file, plus a
    FILE node that CONTAINS every top-level entity."""
    if language == Language.PYTHON:
        result = _extract_python(project, path, text)
    else:
        result = _extract_pattern(project, path, text, language)

    n_lines = text.count("\n") + 1
    file_node = CodeNode.make(
        project, path.rsplit("/", 1)[-1], NodeType.FILE, language,
        Location(path, 1, n_lines), content="",
    )
    contained = {e.dst for e in result.edges if e.edge_type == EdgeType.CONTAINS}
    for node in result.nodes:
        if node.id not in contained:
            result.edges.append(CodeEdge(file_node.id, node.id, EdgeType.CONTAINS))
    result.nodes.append(file_node)
    return result


__all__ = ["ExtractionResult", "extract_file"]
