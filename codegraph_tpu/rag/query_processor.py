"""Query classification + expansion.

Reference: crates/codegraph-vector/src/rag/query_processor.rs:27-410 —
QueryType enum (:17-26), intent detection, expansion with synonyms.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List

from codegraph_tpu.search.bm25 import tokenize


class QueryType(str, Enum):
    CODE_SEARCH = "code_search"
    EXPLANATION = "explanation"
    DEBUGGING = "debugging"
    ARCHITECTURE = "architecture"
    USAGE = "usage"
    GENERAL = "general"


_TYPE_SIGNALS: Dict[QueryType, List[str]] = {
    QueryType.EXPLANATION: ["what", "explain", "how does", "why", "describe",
                            "meaning", "purpose"],
    QueryType.DEBUGGING: ["bug", "error", "crash", "fix", "fail", "broken",
                          "exception", "wrong", "panic"],
    QueryType.ARCHITECTURE: ["architecture", "structure", "design", "depend",
                             "coupling", "module", "layer", "overview"],
    QueryType.USAGE: ["how to", "usage", "use", "example", "call", "invoke"],
    QueryType.CODE_SEARCH: ["where", "find", "locate", "search", "which file",
                            "definition", "defined"],
}

_EXPANSIONS: Dict[str, List[str]] = {
    "function": ["method", "fn", "func"],
    "class": ["struct", "type"],
    "error": ["exception", "failure"],
    "config": ["configuration", "settings"],
    "test": ["spec", "unit test"],
    "delete": ["remove", "drop"],
    "create": ["new", "make", "init"],
}


@dataclass
class ProcessedQuery:
    raw: str
    query_type: QueryType
    keywords: List[str] = field(default_factory=list)
    expanded_terms: List[str] = field(default_factory=list)
    entities: List[str] = field(default_factory=list)  # code-like tokens

    @property
    def expanded_query(self) -> str:
        return " ".join([self.raw, *self.expanded_terms])


_CODE_ENTITY_RE = re.compile(
    r"\b\w+\.\w+\(\)|\b\w+\(\)|\b\w+::\w+\b|\b[a-z]+_\w+\b|\b[A-Z][a-z]+[A-Z]\w*\b"
)


class QueryProcessor:
    def process(self, query: str) -> ProcessedQuery:
        low = query.lower()
        scores = {
            qt: sum(1 for sig in sigs if sig in low)
            for qt, sigs in _TYPE_SIGNALS.items()
        }
        best = max(scores.items(), key=lambda kv: kv[1])
        qtype = best[0] if best[1] > 0 else QueryType.GENERAL
        keywords = tokenize(query)
        expanded = []
        for kw in keywords:
            expanded.extend(_EXPANSIONS.get(kw, []))
        entities = _CODE_ENTITY_RE.findall(query)
        return ProcessedQuery(
            raw=query, query_type=qtype, keywords=keywords,
            expanded_terms=expanded[:6], entities=entities,
        )


__all__ = ["QueryProcessor", "QueryType", "ProcessedQuery"]
