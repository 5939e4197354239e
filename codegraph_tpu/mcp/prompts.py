"""Tier-aware prompt library for the agentic analysis types.

Reference: codegraph-mcp-server/src/*_prompts.rs (~3000 LoC of
Small/Medium/Large/Massive prompt variants per analysis type:
semantic_question, code_search, complexity_analysis, dependency_analysis,
call_chain, agentic_api_surface, context_builder, architecture_analysis;
selected by prompt_selector.rs:490). Re-design: one template per
analysis type parameterized by the tier's budget knobs instead of four
hand-written copies — the tier controls evidence volume, citation
richness, and answer length.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Dict

from codegraph_tpu.mcp.tiers import ContextTier, tier_limits


class AnalysisType(str, Enum):
    SEMANTIC_QUESTION = "semantic_question"
    CODE_SEARCH = "code_search"
    COMPLEXITY = "complexity_analysis"
    DEPENDENCIES = "dependency_analysis"
    CALL_CHAIN = "call_chain"
    API_SURFACE = "api_surface"
    CONTEXT_BUILDER = "context_builder"
    ARCHITECTURE = "architecture_analysis"


_TASK_BRIEFS: Dict[AnalysisType, str] = {
    AnalysisType.SEMANTIC_QUESTION:
        "Answer the user's question about this codebase.",
    AnalysisType.CODE_SEARCH:
        "Locate the code most relevant to the query and explain each hit.",
    AnalysisType.COMPLEXITY:
        "Identify complexity hotspots and justify why each is risky.",
    AnalysisType.DEPENDENCIES:
        "Map the dependency structure around the target, flagging cycles.",
    AnalysisType.CALL_CHAIN:
        "Trace how control flows from the source (to the target if given).",
    AnalysisType.API_SURFACE:
        "Enumerate the public API surface relevant to the query.",
    AnalysisType.CONTEXT_BUILDER:
        "Assemble the minimal context a developer needs for this task.",
    AnalysisType.ARCHITECTURE:
        "Describe the architecture: layers, hubs, boundaries, violations.",
}

_TIER_STYLE: Dict[ContextTier, str] = {
    ContextTier.SMALL:
        "Be terse: at most {limit} findings, one line each, top citations only.",
    ContextTier.MEDIUM:
        "Report up to {limit} findings with a short justification and a "
        "file:line citation each.",
    ContextTier.LARGE:
        "Report up to {limit} findings; include code snippets for the top 3 "
        "and full file:line citations.",
    ContextTier.MASSIVE:
        "Be exhaustive: up to {limit} findings with snippets, citations, and "
        "a summary table; cross-reference related findings.",
}


@dataclass
class PromptSelector:
    """analysis type + tier -> system prompt (prompt_selector.rs:490)."""

    tier: ContextTier = ContextTier.MEDIUM

    def select(self, analysis: AnalysisType, query: str = "") -> str:
        limits = tier_limits(self.tier)
        brief = _TASK_BRIEFS[analysis]
        style = _TIER_STYLE[self.tier].format(limit=limits.search_limit)
        depth_note = (
            f"Limit graph traversals to depth {limits.graph_depth}; retrieve "
            f"up to {limits.search_limit * limits.over_retrieve} candidates "
            f"before truncating to {limits.search_limit}."
        )
        prompt = (
            f"{brief}\nYou have graph tools over a code knowledge graph "
            "(semantic search, dependencies, call chains, coupling, hubs, "
            f"hotspots). {depth_note}\n{style}\n"
            "Ground every claim in tool evidence; never invent file paths."
        )
        if query:
            prompt += f"\nTask: {query}"
        return prompt


FOCUS_TO_ANALYSIS: Dict[str, AnalysisType] = {
    # official_server.rs:306-312 focus -> AnalysisType mapping
    "context": AnalysisType.CONTEXT_BUILDER,
    "search": AnalysisType.CODE_SEARCH,
    "question": AnalysisType.SEMANTIC_QUESTION,
    "impact": AnalysisType.DEPENDENCIES,
    "dependencies": AnalysisType.DEPENDENCIES,
    "calls": AnalysisType.CALL_CHAIN,
    "architecture": AnalysisType.ARCHITECTURE,
    "quality": AnalysisType.COMPLEXITY,
    "api": AnalysisType.API_SURFACE,
}


__all__ = ["AnalysisType", "PromptSelector", "FOCUS_TO_ANALYSIS"]
