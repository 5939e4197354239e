"""Edge resolution: symbol names -> node ids.

Re-implements the reference's resolution ladder (indexer.rs:2673-2900):
normalize symbol variants -> exact symbol-map lookup -> simple-name
match -> "AI semantic match" = stop-word filter + trigram-jaccard
preselection + cosine over precomputed symbol embeddings with a 0.75
threshold. The embedding stage batches all unresolved targets through
the provider once (indexer.rs:2282,2452 precompute), then scores them
against all symbol embeddings in one device matmul instead of the
reference's per-pair rayon loop.
"""

from __future__ import annotations

import logging
import re
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from codegraph_tpu.core.types import CodeEdge, CodeNode, NodeType

logger = logging.getLogger("codegraph_tpu.resolve")

SEMANTIC_THRESHOLD = 0.75  # indexer.rs:2890 cosine threshold

_RESOLVABLE_TYPES = {
    NodeType.FUNCTION, NodeType.METHOD, NodeType.CLASS, NodeType.STRUCT,
    NodeType.TRAIT, NodeType.INTERFACE, NodeType.ENUM, NodeType.MODULE,
    NodeType.TYPE_ALIAS, NodeType.CONSTANT, NodeType.MACRO,
}


def _normalize_variants(name: str) -> List[str]:
    """Symbol normalization (reference: Rust/Python path normalization,
    indexer.rs edge resolution): strip paths, generics, call parens."""
    out = [name]
    base = name.split("::")[-1].split(".")[-1]
    base = re.sub(r"<[^>]*>", "", base).strip()
    if base and base != name:
        out.append(base)
    snake = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", base).lower()
    if snake != base:
        out.append(snake)
    return out


def _trigrams(s: str) -> Set[str]:
    s = s.lower()
    return {s[i : i + 3] for i in range(len(s) - 2)} if len(s) > 2 else {s}


def _trigram_jaccard(a: str, b: str) -> float:
    ta, tb = _trigrams(a), _trigrams(b)
    if not ta or not tb:
        return 0.0
    return len(ta & tb) / len(ta | tb)


class EdgeResolver:
    """Resolves unresolved edges against the project's symbol map."""

    def __init__(self, provider=None, semantic_threshold: float = SEMANTIC_THRESHOLD):
        self.provider = provider
        self.semantic_threshold = semantic_threshold

    def build_symbol_map(
        self, nodes: Sequence[CodeNode]
    ) -> Dict[str, List[CodeNode]]:
        """name (and normalized variants) -> candidate nodes
        (reference: build_symbol_index, estimation.rs:159)."""
        symbols: Dict[str, List[CodeNode]] = defaultdict(list)
        for node in nodes:
            if node.node_type not in _RESOLVABLE_TYPES:
                continue
            for variant in _normalize_variants(node.name):
                symbols[variant].append(node)
        return dict(symbols)

    def resolve(
        self,
        edges: Sequence[CodeEdge],
        nodes: Sequence[CodeNode],
    ) -> Tuple[List[CodeEdge], int, int]:
        """Resolve in place. Returns (still_unresolved, n_exact, n_semantic)."""
        symbols = self.build_symbol_map(nodes)
        by_id = {n.id: n for n in nodes}
        unresolved_after: List[CodeEdge] = []
        n_exact = 0
        pending: List[CodeEdge] = []

        for edge in edges:
            if edge.resolved:
                continue
            if edge.metadata.get("local"):
                # dataflow's local-variable edges (dst = a variable name
                # inside one function, analyzers.py) must never bind to
                # global symbols — "config = ..." is not a reference to
                # some class Config elsewhere in the project
                unresolved_after.append(edge)
                continue
            target = edge.dst
            hit: Optional[CodeNode] = None
            for variant in _normalize_variants(target):
                cands = symbols.get(variant)
                if cands:
                    # prefer same-file candidates, then first
                    src_node = by_id.get(edge.src)
                    if src_node is not None:
                        same = [
                            c for c in cands
                            if c.location.file_path == src_node.location.file_path
                        ]
                        hit = same[0] if same else cands[0]
                    else:
                        hit = cands[0]
                    break
            if hit is not None:
                edge.dst = hit.id
                edge.resolved = True
                n_exact += 1
            else:
                pending.append(edge)

        n_semantic = 0
        if pending and self.provider is not None:
            n_semantic = self._semantic_match(pending, symbols)
        unresolved_after = [e for e in pending if not e.resolved]
        return unresolved_after, n_exact, n_semantic

    def _semantic_match(
        self, pending: List[CodeEdge], symbols: Dict[str, List[CodeNode]]
    ) -> int:
        """Embedding-cosine fallback with trigram preselection
        (indexer.rs:2673-2900 ai_semantic_match_sync)."""
        symbol_names = list(symbols.keys())
        if not symbol_names:
            return 0
        targets = sorted({e.dst for e in pending})
        # trigram preselection: only embed targets with a plausible candidate
        # (native cghost kernel with inverted trigram index when available)
        presel: Dict[str, List[str]] = {}
        from codegraph_tpu.native import trigram_preselect_native

        native = trigram_preselect_native(targets, symbol_names, 0.3, 8)
        if native is not None:
            idx, _score = native
            for ti, t in enumerate(targets):
                cands = [symbol_names[j] for j in idx[ti] if j >= 0]
                if cands:
                    presel[t] = cands
        else:
            for t in targets:
                cands = [s for s in symbol_names if _trigram_jaccard(t, s) >= 0.3]
                if cands:
                    presel[t] = sorted(
                        cands, key=lambda s: -_trigram_jaccard(t, s)
                    )[:8]
        if not presel:
            return 0

        embed_names = sorted({s for cands in presel.values() for s in cands})
        try:
            target_embs = self.provider.embed_texts(list(presel.keys()))
            symbol_embs = self.provider.embed_texts(embed_names)
        except Exception as exc:
            logger.warning("semantic match embedding failed: %s", exc)
            return 0
        sym_idx = {name: i for i, name in enumerate(embed_names)}
        tgt_idx = {name: i for i, name in enumerate(presel.keys())}

        resolved_names: Dict[str, Optional[CodeNode]] = {}
        for t, cands in presel.items():
            te = target_embs[tgt_idx[t]]
            best, best_score = None, self.semantic_threshold
            for s in cands:
                score = float(te @ symbol_embs[sym_idx[s]])
                if score >= best_score:
                    best, best_score = s, score
            resolved_names[t] = symbols[best][0] if best else None

        n = 0
        for edge in pending:
            node = resolved_names.get(edge.dst)
            if node is not None:
                edge.dst = node.id
                edge.resolved = True
                n += 1
        return n


__all__ = ["EdgeResolver", "SEMANTIC_THRESHOLD"]
