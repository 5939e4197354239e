"""Answer synthesis: template-based with optional LLM polish.

Reference: crates/codegraph-vector/src/rag/response_generator.rs:59-934 —
template+LLM generation, source references, response validation (:146).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List

from codegraph_tpu.core.types import SearchResult
from codegraph_tpu.rag.query_processor import ProcessedQuery, QueryType

logger = logging.getLogger("codegraph_tpu.rag")


@dataclass
class GeneratedResponse:
    answer: str
    sources: List[dict] = field(default_factory=list)
    used_llm: bool = False
    valid: bool = True
    validation: dict = field(default_factory=dict)  # per-check detail


_TEMPLATES = {
    QueryType.CODE_SEARCH: "Most relevant code for {q!r}:\n{listing}",
    QueryType.EXPLANATION: "Context gathered for {q!r}:\n{listing}",
    QueryType.DEBUGGING: "Code paths likely involved in {q!r}:\n{listing}",
    QueryType.ARCHITECTURE: "Structural context for {q!r}:\n{listing}",
    QueryType.USAGE: "Usage sites and definitions for {q!r}:\n{listing}",
    QueryType.GENERAL: "Results for {q!r}:\n{listing}",
}


class ResponseGenerator:
    def __init__(self, llm=None):
        self.llm = llm

    def generate(
        self, pq: ProcessedQuery, results: List[SearchResult]
    ) -> GeneratedResponse:
        if not results:
            return GeneratedResponse(
                answer=f"No relevant code found for {pq.raw!r}.",
                valid=False,
            )
        sources = [
            {"name": r.name, "file": r.file_path, "line": r.start_line,
             "score": round(float(r.score), 4)}
            for r in results
        ]
        listing = "\n".join(
            f"- {r.name} ({r.file_path}:{r.start_line}) — {r.snippet[:120]}"
            for r in results[:8]
        )
        answer = _TEMPLATES[pq.query_type].format(q=pq.raw, listing=listing)
        used_llm = False
        if self.llm is not None and getattr(self.llm, "is_available", lambda: False)():
            try:
                answer = self.llm.complete(
                    f"Question: {pq.raw}\nEvidence:\n{listing}\n\n"
                    "Answer the question grounded ONLY in the evidence, "
                    "citing file:line."
                )
                used_llm = True
            except Exception as exc:
                logger.warning("LLM generation failed: %s", exc)
        checks = self._validate(answer, results)
        return GeneratedResponse(
            answer=answer, sources=sources, used_llm=used_llm,
            valid=all(checks.values()), validation=checks,
        )

    @staticmethod
    def _validate(answer: str, results: List[SearchResult]) -> dict:
        """Response validation (response_generator.rs:146): grounding
        (the answer mentions retrieved sources), citation coverage, and
        basic well-formedness. Returned per-check so callers can decide
        what to do with partially-valid answers."""
        grounded = any(
            r.name in answer or r.file_path in answer for r in results
        )
        cited = sum(
            1 for r in results if r.name in answer or r.file_path in answer
        )
        return {
            "grounded": grounded,
            "citation_coverage": cited / max(1, min(len(results), 8)) >= 0.25,
            "nonempty": len(answer.strip()) >= 20,
        }


__all__ = ["ResponseGenerator", "GeneratedResponse"]
