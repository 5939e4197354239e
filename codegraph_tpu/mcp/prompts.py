"""Tier-aware prompt library for the agentic analysis types.

Reference: codegraph-mcp-server/src/*_prompts.rs (~3,000 LoC of
Small/Medium/Large/Massive prompt variants per analysis type:
semantic_question, code_search, complexity_analysis,
dependency_analysis, call_chain, agentic_api_surface, context_builder,
architecture_analysis; selected by prompt_selector.rs:490).

Re-design: the reference hand-writes four full prompt copies per
analysis type; we keep ONE per-analysis playbook (goal, evidence plan,
question routing, interpretation notes, output schema, pitfalls) and
let the tier parameterize the budget knobs (tool-call budget, findings
limit, graph depth, snippet richness). The playbook CONTENT matches the
reference's per-analysis guidance depth — which tools in what order,
what each tool's output means, what the final answer must contain —
without four drifting copies of it (VERDICT r4 missing item 3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List

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


# ---------------------------------------------------------------------------
# Shared blocks
# ---------------------------------------------------------------------------

# The 9 graph tools GraphToolExecutor dispatches (mcp/tools.py:234-293),
# described the way an agent needs them: signature, what comes back, and
# when to reach for it. Mirrors the reference's AVAILABLE GRAPH TOOLS
# blocks (graph_tool_schemas.rs:36-253) in content, not wording.
_TOOL_CATALOG = """AVAILABLE GRAPH TOOLS (call with exact node ids, never descriptions):
- semantic_code_search(query, limit, languages?, node_types?, path_prefixes?)
    Embedding+text hybrid search over code chunks. ALWAYS your first call
    when you only have a description: it is the only tool that maps
    natural language to node ids. Returns results[] with {id, name,
    node_type, language, file_path, line, score, snippet}.
- find_nodes_by_name(name, limit)
    Exact/prefix name lookup. Cheaper and more precise than semantic
    search when the user gave you a literal symbol name.
- get_transitive_dependencies(node, max_depth)
    Everything `node` depends on, BFS to max_depth. Returns
    dependencies[] with depth per hit. Answers "what does X rely on".
- get_reverse_dependencies(node, max_depth)
    Everything that depends ON `node`. Answers "what breaks if X
    changes" / blast-radius questions.
- trace_call_chain(source, target?, max_depth)
    Execution paths outward from `source` (to `target` if given).
    Returns paths[] of node sequences. Answers "how does X work" /
    "how does control reach Y".
- calculate_coupling_metrics(node)
    Afferent coupling Ca (who uses it), efferent coupling Ce (what it
    uses), instability I = Ce/(Ca+Ce). I near 0 = stable foundation
    (changes are expensive); I near 1 = volatile leaf (safe to change).
- get_hub_nodes(limit)
    Highest-degree nodes in the graph — the architectural load-bearing
    walls. Degree = in+out edges.
- detect_circular_dependencies(max_cycles)
    Strongly-connected components over dependency edges; each cycle is
    an architectural defect candidate.
- find_complexity_hotspots(limit)
    Nodes ranked by cyclomatic complexity. Start of any quality audit."""

_GROUNDING = """EVIDENCE DISCIPLINE:
Ground every claim in tool output you actually received this session.
Never invent file paths, line numbers, or node names; never rely on
general programming knowledge for claims about THIS codebase. When the
graph cannot answer something, say so and name the tool call that
would. Node ids returned by one tool are the only valid inputs to the
next."""

_WORKFLOW = """MANDATORY WORKFLOW:
1. Resolve entities first: find_nodes_by_name for literal symbols the
   user named; semantic_code_search for descriptions. Extract the `id`
   fields from results.
2. Feed those exact ids into the structural tools per the plan below.
3. If a structural tool returns an error or an empty result, fall back
   to a broader search (raise limit, drop filters) ONCE before
   concluding the information is absent."""

_FORMAT = """ANSWER FORMAT (final message):
{"analysis": "<the answer, in prose>",
 "evidence": [{"name", "file_path", "line", "why_it_matters"}...],
 "related_components": ["<node names worth reading next>"],
 "confidence": <0.0-1.0 — drop below 0.7 whenever a claim rests on a
  single search hit or an empty structural result>}"""


# ---------------------------------------------------------------------------
# Per-analysis playbooks
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Playbook:
    """One analysis type's full investigation guidance.

    Content-parity target: the reference's per-analysis prompt files
    (e.g. semantic_question_prompts.rs QUESTION TYPE MAPPING and
    INVESTIGATION PATTERNS blocks; call_chain_prompts.rs;
    complexity_analysis_prompts.rs) — each field maps to one of its
    recurring sections.
    """

    brief: str                      # one-line mission
    evidence_plan: List[str]        # ordered tool steps with rationale
    routing: List[str]              # question-pattern -> tool mapping
    interpretation: List[str]       # how to read the tool outputs
    answer_must: List[str]          # required content of the final answer
    pitfalls: List[str] = field(default_factory=list)

    def render(self) -> str:
        parts = [self.brief, "", "INVESTIGATION PLAN:"]
        parts += [f"{i + 1}. {s}" for i, s in enumerate(self.evidence_plan)]
        if self.routing:
            parts += ["", "QUESTION ROUTING:"] + [f"- {r}" for r in self.routing]
        if self.interpretation:
            parts += ["", "READING THE RESULTS:"] + [
                f"- {s}" for s in self.interpretation]
        parts += ["", "YOUR ANSWER MUST:"] + [f"- {s}" for s in self.answer_must]
        if self.pitfalls:
            parts += ["", "PITFALLS:"] + [f"- {p}" for p in self.pitfalls]
        return "\n".join(parts)


_PLAYBOOKS: Dict[AnalysisType, Playbook] = {
    AnalysisType.SEMANTIC_QUESTION: Playbook(
        brief=("Answer the user's question about how this codebase behaves, "
               "using graph structure as the only source of truth."),
        evidence_plan=[
            "semantic_code_search for the entities the question mentions; "
            "collect 2-3 candidate ids, not just the top hit.",
            "Pick the structural tool the question shape demands (see "
            "routing) and run it on the best candidate.",
            "If two candidates are plausible, run the structural tool on "
            "both and let the richer result decide which the user meant.",
            "Where the question implies change ('what if', 'can I remove'), "
            "ALWAYS add get_reverse_dependencies — impact is never visible "
            "from the forward direction alone.",
        ],
        routing=[
            "'How does X work?' -> trace_call_chain(source=X), then "
            "get_transitive_dependencies(X) for the collaborators.",
            "'What depends on X?' / 'what breaks if X changes?' -> "
            "get_reverse_dependencies(X).",
            "'Why does X need Y?' -> get_transitive_dependencies(X) and "
            "locate Y in the returned depth-ordered list; the path depth "
            "tells you direct vs inherited dependency.",
            "'Is X used anywhere?' -> get_reverse_dependencies(X, depth 1); "
            "empty dependents[] is the answer, report it as such.",
            "'Is there a cycle involving X?' -> detect_circular_dependencies "
            "and scan cycles[] for X's id.",
        ],
        interpretation=[
            "trace_call_chain paths are evidence of REACHABILITY, not of "
            "runtime frequency — phrase claims accordingly.",
            "A dependency at depth 1 is declared in X itself; depth >= 2 is "
            "inherited through an intermediary — name the intermediary.",
            "Search scores are relative, not calibrated: a 0.9 means 'best "
            "available', not 'certainly correct'. Confirm identity via "
            "file_path + snippet before building on a hit.",
        ],
        answer_must=[
            "Answer the literal question first, in one sentence.",
            "Then walk the supporting chain: each hop cited as "
            "file_path:line from tool output.",
            "State explicitly which parts of the question (if any) the "
            "graph could not resolve.",
        ],
        pitfalls=[
            "Do not narrate generic language semantics ('Python dicts are "
            "hash maps') as if discovered in this codebase.",
            "Same-named symbols in different files are different nodes — "
            "disambiguate by file_path before tracing.",
        ],
    ),
    AnalysisType.CODE_SEARCH: Playbook(
        brief=("Locate the code most relevant to the query and explain "
               "why each hit matters."),
        evidence_plan=[
            "semantic_code_search with the user's query verbatim at the "
            "tier's over-retrieve limit.",
            "If the query names a literal identifier, also "
            "find_nodes_by_name — exact hits outrank semantic ones.",
            "For the top hits, confirm role cheaply: coupling metrics for "
            "a 'is this central or peripheral' signal on ambiguous hits.",
            "If hits cluster in one directory, re-search with a "
            "path_prefixes filter to sweep siblings the embedding missed.",
        ],
        routing=[
            "Query is a concept ('rate limiting', 'retry logic') -> "
            "semantic search only; report the DIVERSITY of places it "
            "appears, not just the best one.",
            "Query is a symbol ('IVFPQIndex.search') -> name lookup first; "
            "semantic search as fallback for typos/renames.",
            "Query is a behavior ('where do we drop messages') -> semantic "
            "search, then trace_call_chain from the best hit to show the "
            "behavior's path.",
        ],
        interpretation=[
            "Treat results as candidates to verify, not answers: read the "
            "snippet and reject hits whose snippet does not actually match "
            "the query's intent before reporting them.",
            "Several medium-score hits in one module usually beat one "
            "high-score hit elsewhere — report the module.",
        ],
        answer_must=[
            "Rank hits by relevance, each with file_path:line, a one-line "
            "role description, and why it matched.",
            "Say what was searched and what was NOT found, so the user "
            "knows the negative space.",
        ],
        pitfalls=[
            "Do not pad the answer with low-score hits to fill the limit; "
            "fewer verified hits beat many speculative ones.",
        ],
    ),
    AnalysisType.COMPLEXITY: Playbook(
        brief=("Identify the complexity hotspots that actually carry risk, "
               "and justify each with structural evidence."),
        evidence_plan=[
            "find_complexity_hotspots at the tier limit — the ranked "
            "starting set.",
            "For each hotspot worth reporting, calculate_coupling_metrics: "
            "complexity is only RISK when coupled (high Ca means many "
            "dependents inherit the risk).",
            "get_reverse_dependencies(depth 1) on the top 2-3 to name who "
            "is exposed.",
            "Cross-check against get_hub_nodes: a node on both lists is "
            "the headline finding.",
        ],
        routing=[
            "'Where is the risky code?' -> hotspots x coupling as above.",
            "'Is X too complex?' -> find X's complexity via search, then "
            "compare against the hotspot list's range — give a percentile "
            "feel, not a bare number.",
            "'What should we refactor first?' -> rank by "
            "complexity x afferent coupling, and say so.",
        ],
        interpretation=[
            "Cyclomatic complexity counts branches, not harm: a flat "
            "switch-on-enum scores high but is low-risk; call that out "
            "when the snippet shows it.",
            "High complexity + I near 0 (stable, many dependents) is the "
            "dangerous quadrant; high complexity + I near 1 is cheap to "
            "fix later.",
        ],
        answer_must=[
            "Rank findings by risk (complexity x exposure), not raw score.",
            "For each: the number, who depends on it, and ONE concrete "
            "refactor direction grounded in what the tools showed.",
        ],
        pitfalls=[
            "Do not report generated/vendored files as refactor targets; "
            "check the file_path.",
        ],
    ),
    AnalysisType.DEPENDENCIES: Playbook(
        brief=("Map the dependency structure around the target: what it "
               "needs, who needs it, and any cycles."),
        evidence_plan=[
            "Resolve the target (name lookup, then search).",
            "get_transitive_dependencies(target) AND "
            "get_reverse_dependencies(target) — both directions, always; "
            "a dependency map with one direction is half a map.",
            "detect_circular_dependencies; intersect cycles with the "
            "target's neighborhood.",
            "calculate_coupling_metrics(target) to summarize the shape "
            "(Ca, Ce, I) in one line.",
        ],
        routing=[
            "'What does X import/use?' -> forward only, depth 1-2.",
            "'Impact of changing X?' -> reverse, at the tier's full depth; "
            "group dependents by depth (direct vs transitive).",
            "'Are A and B entangled?' -> forward from A scanning for B, "
            "then forward from B scanning for A; both present = cycle, "
            "report it as one.",
        ],
        interpretation=[
            "Depth in the returned lists is the shortest path — use it to "
            "separate 'declared' (1) from 'inherited' (>1) dependencies.",
            "Instability I compares only OUTWARD exposure; a node with "
            "Ca=0 is dead-end code regardless of I.",
            "Cycles through type/interface nodes are often benign "
            "(mutual type references); cycles through function call edges "
            "are the ones that block refactors — distinguish by node_type.",
        ],
        answer_must=[
            "Lead with the one-line shape: 'X depends on N, M depend on X, "
            "instability I, in/out of cycles'.",
            "List direct dependencies and direct dependents separately "
            "from transitive ones.",
            "Flag every cycle touching the target with its member list.",
        ],
    ),
    AnalysisType.CALL_CHAIN: Playbook(
        brief=("Trace how control flows from the source (to the target if "
               "given), and make each hop verifiable."),
        evidence_plan=[
            "Resolve source (and target) to exact ids — wrong-node traces "
            "look plausible and waste the whole analysis.",
            "trace_call_chain(source, target?, tier depth).",
            "If no path is found and a target was given: trace from the "
            "target BACKWARD via get_reverse_dependencies to find where "
            "the chains almost meet — report the gap location.",
            "For the primary path, spot-check one middle hop with "
            "find_nodes_by_name to confirm the node is what its name "
            "suggests.",
        ],
        routing=[
            "'How does X reach Y?' -> trace with target=Y; report the "
            "SHORTEST path first, alternates after.",
            "'What happens when X runs?' -> trace without target; group "
            "the frontier by subsystem rather than dumping every path.",
            "'Who calls X?' -> this is reverse dependencies restricted to "
            "call edges, not a forward trace.",
        ],
        interpretation=[
            "Static call paths over-approximate: a path through a dynamic "
            "dispatch or callback is POSSIBLE flow, not guaranteed — mark "
            "such hops.",
            "max_depth truncation is silent; if paths end exactly at the "
            "depth limit, say the trace MAY continue and offer the deeper "
            "call.",
        ],
        answer_must=[
            "Render each reported path as an ordered hop list, every hop "
            "with file_path:line.",
            "State the path count and depth searched, so absence claims "
            "('X never reaches Y within depth 5') are scoped honestly.",
        ],
        pitfalls=[
            "Never stitch two half-paths into one without a shared node "
            "id connecting them in tool output.",
        ],
    ),
    AnalysisType.API_SURFACE: Playbook(
        brief=("Enumerate the public API surface relevant to the query: "
               "entry points, their contracts, and their stability."),
        evidence_plan=[
            "semantic_code_search for the subsystem, filtered to "
            "node_types=['function','class','interface'] when supported.",
            "For each candidate entry point, get_reverse_dependencies "
            "depth 1: EXTERNAL callers are what makes it 'public in "
            "practice'.",
            "calculate_coupling_metrics on the top entries — Ca ranks how "
            "load-bearing each is; I says how risky evolving it is.",
            "get_hub_nodes as a cross-check: hubs in this subsystem that "
            "your search missed belong in the surface.",
        ],
        routing=[
            "'What's the API of module M?' -> search with path_prefixes "
            "filter on M; rank by Ca.",
            "'Which APIs are safe to change?' -> the low-Ca, high-I "
            "entries; name them explicitly.",
            "'What would a client of M touch?' -> reverse deps of M's "
            "hubs, grouped by caller module.",
        ],
        interpretation=[
            "Ca=0 on a public-looking symbol means unused-or-external-"
            "facing; without usage evidence, label it 'exported, no "
            "internal callers' rather than guessing.",
            "Naming conventions (underscore prefixes, 'internal' paths) "
            "are hints, but only caller evidence makes the public/private "
            "call.",
        ],
        answer_must=[
            "Group the surface by module; per entry: signature location "
            "(file_path:line), caller count (Ca), stability verdict.",
            "Separate 'public and used' from 'exported but unused'.",
        ],
    ),
    AnalysisType.CONTEXT_BUILDER: Playbook(
        brief=("Assemble the minimal context a developer needs to start "
               "the given task — the reading list, not the answer."),
        evidence_plan=[
            "semantic_code_search for the task's subject; keep the top "
            "hits across DIFFERENT files (deduplicate by file).",
            "For the 1-2 central nodes, get_transitive_dependencies "
            "depth 1 — the collaborators they'll touch.",
            "get_reverse_dependencies depth 1 on anything the task will "
            "MODIFY — the tests/callers that constrain the change.",
            "If the task names no specific code, get_hub_nodes + "
            "top-level search to orient globally instead.",
        ],
        routing=[
            "Bug-fix task -> center on the failing behavior: search, then "
            "call-chain from entry to suspect.",
            "Feature task -> center on the extension point: search for "
            "the closest existing analogue and include it as a template.",
            "Review/onboarding task -> hubs + architecture shape, lighter "
            "on leaf files.",
        ],
        interpretation=[
            "Minimal means MINIMAL: a context set over the tier limit is "
            "a failure even if every entry is relevant. Cut transitive "
            "collaborators before cutting direct ones.",
        ],
        answer_must=[
            "An ordered reading list: file_path:line, one line on why, "
            "and what to look for there.",
            "A 2-3 sentence orientation paragraph tying the entries "
            "together.",
            "The constraint list: callers/tests that must keep passing.",
        ],
    ),
    AnalysisType.ARCHITECTURE: Playbook(
        brief=("Describe the architecture as evidenced by the graph: "
               "layers, hubs, boundaries, and violations."),
        evidence_plan=[
            "get_hub_nodes at the tier limit — the skeleton.",
            "detect_circular_dependencies — every cycle is a candidate "
            "boundary violation.",
            "calculate_coupling_metrics on the top hubs: stable hubs "
            "(I near 0) are the foundation layer; unstable hubs are "
            "orchestrators.",
            "semantic_code_search for the user's named concern (if any) "
            "to anchor the general map to their question.",
            "Infer layering from directory clusters of the hubs + the "
            "depth structure of their dependency fans.",
        ],
        routing=[
            "'Is this layered cleanly?' -> cycles + instability ordering: "
            "report edges where a stable layer depends on a less stable "
            "one (dependency inversion violations).",
            "'Where are the god objects?' -> hubs with both high Ca and "
            "high Ce.",
            "'What are the modules?' -> cluster hubs by path; name each "
            "cluster by its dominant directory.",
        ],
        interpretation=[
            "The graph shows the architecture as BUILT, not as intended; "
            "frame violations as 'the code does X' without assuming the "
            "design doc agrees.",
            "A hub that is a type/config node is a vocabulary hub (fine); "
            "a hub that is a function with high Ce is a control hub "
            "(risk) — distinguish by node_type.",
        ],
        answer_must=[
            "A layer/module map (3-7 clusters) with each cluster's hubs "
            "cited.",
            "Every cycle listed with members and one-line severity.",
            "An explicit 'healthiest/riskiest part' verdict with the "
            "metric that justifies it.",
        ],
    ),
}

_TIER_STYLE: Dict[ContextTier, str] = {
    ContextTier.SMALL:
        "Be terse: at most {limit} findings, one line each, top citations "
        "only. Budget: at most {calls} tool calls — resolve, run the one "
        "decisive structural tool, answer.",
    ContextTier.MEDIUM:
        "Report up to {limit} findings with a short justification and a "
        "file:line citation each. Budget: up to {calls} tool calls; "
        "follow the plan's core steps, skip optional cross-checks.",
    ContextTier.LARGE:
        "Report up to {limit} findings; include code snippets for the top "
        "3 and full file:line citations. Budget: up to {calls} tool "
        "calls; run the cross-checks and one alternate-candidate probe.",
    ContextTier.MASSIVE:
        "Be exhaustive: up to {limit} findings with snippets, citations, "
        "and a summary table; cross-reference related findings. Budget: "
        "up to {calls} tool calls; execute the full plan on every "
        "plausible candidate, both directions, all cross-checks.",
}

# Tool-call budgets per tier (the reference's '1-2 calls max' .. 'be
# exhaustive' ladder, semantic_question_prompts.rs TERSE/BALANCED/...).
_TIER_CALLS: Dict[ContextTier, int] = {
    ContextTier.SMALL: 2,
    ContextTier.MEDIUM: 4,
    ContextTier.LARGE: 8,
    ContextTier.MASSIVE: 16,
}


@dataclass
class PromptSelector:
    """analysis type + tier -> system prompt (prompt_selector.rs:490)."""

    tier: ContextTier = ContextTier.MEDIUM

    def select(self, analysis: AnalysisType, query: str = "") -> str:
        limits = tier_limits(self.tier)
        style = _TIER_STYLE[self.tier].format(
            limit=limits.search_limit, calls=_TIER_CALLS[self.tier])
        depth_note = (
            f"Limit graph traversals to depth {limits.graph_depth}; retrieve "
            f"up to {limits.search_limit * limits.over_retrieve} candidates "
            f"before truncating to {limits.search_limit}."
        )
        playbook = _PLAYBOOKS[analysis].render()
        prompt = (
            f"{playbook}\n\n{_TOOL_CATALOG}\n\n{_WORKFLOW}\n\n{_GROUNDING}\n\n"
            f"TIER BUDGET: {depth_note}\n{style}\n\n{_FORMAT}"
        )
        if query:
            prompt += f"\n\nTask: {query}"
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


__all__ = ["AnalysisType", "Playbook", "PromptSelector", "FOCUS_TO_ANALYSIS"]
