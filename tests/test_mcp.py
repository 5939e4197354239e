import io
import json
import textwrap

import pytest

from codegraph_tpu.core.config import CodeGraphConfig
from codegraph_tpu.graph.queries import GraphQueries
from codegraph_tpu.indexer.indexer import ProjectIndexer
from codegraph_tpu.mcp.agents import LatsAgent, ReActAgent, ReflexionAgent
from codegraph_tpu.mcp.llm import ChatResponse, LLMProvider, ToolCall, create_llm
from codegraph_tpu.mcp.server import AGENTIC_TOOLS, MCPServer
from codegraph_tpu.mcp.tiers import ContextTier, tier_limits
from codegraph_tpu.mcp.tools import TOOL_SCHEMAS, GraphToolExecutor


@pytest.fixture
def indexed(tmp_path):
    (tmp_path / "calc.py").write_text(textwrap.dedent('''
        def add_numbers(a, b):
            return a + b

        def compute_total(values):
            total = 0
            for v in values:
                total = add_numbers(total, v)
            return total
    '''))
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 64
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))
    return indexer, cfg


def make_executor(indexer):
    return GraphToolExecutor(GraphQueries(indexer.store), indexer.search)


def test_tier_buckets():
    assert ContextTier.from_context_window(30_000) == ContextTier.SMALL
    assert ContextTier.from_context_window(128_000) == ContextTier.MEDIUM
    assert ContextTier.from_context_window(200_000) == ContextTier.LARGE
    assert ContextTier.from_context_window(1_000_000) == ContextTier.MASSIVE
    assert tier_limits(ContextTier.SMALL).search_limit < tier_limits(
        ContextTier.MASSIVE
    ).search_limit


def test_tool_executor_all_tools(indexed):
    indexer, _ = indexed
    ex = make_executor(indexer)
    r = ex.execute("semantic_code_search", {"query": "add numbers", "limit": 5})
    assert r["count"] >= 1
    assert any(x["name"] == "add_numbers" for x in r["results"])

    r = ex.execute("get_transitive_dependencies", {"node": "compute_total"})
    assert any(d["name"] == "add_numbers" for d in r["dependencies"])

    r = ex.execute("get_reverse_dependencies", {"node": "add_numbers"})
    assert any(d["name"] == "compute_total" for d in r["dependents"])

    r = ex.execute("trace_call_chain", {"source": "compute_total"})
    assert r["count"] >= 1

    r = ex.execute("calculate_coupling_metrics", {"node": "add_numbers"})
    assert r["afferent_coupling"] >= 1

    r = ex.execute("get_hub_nodes", {"limit": 3})
    assert r["count"] >= 1

    r = ex.execute("detect_circular_dependencies", {})
    assert "count" in r

    r = ex.execute("find_complexity_hotspots", {})
    assert "hotspots" in r

    r = ex.execute("nonexistent_tool", {})
    assert "error" in r

    assert ex.stats()["calls"]["semantic_code_search"] == 1


def test_tool_executor_cache(indexed):
    indexer, _ = indexed
    ex = make_executor(indexer)
    ex.execute("get_hub_nodes", {"limit": 3})
    ex.execute("get_hub_nodes", {"limit": 3})
    assert ex.cache.hits >= 1


class ScriptedLLM(LLMProvider):
    """Deterministic fake driving the agent loops."""

    name = "scripted"

    def __init__(self, script):
        self.script = list(script)
        self.prompts = []
        self.messages_seen = []

    def is_available(self):
        return True

    def chat_with_tools(self, messages, tools):
        self.prompts.append(messages[-1]["content"])
        self.messages_seen = [dict(m) for m in messages]
        if not self.script:
            return ChatResponse(text="done")
        item = self.script.pop(0)
        if isinstance(item, str):
            return ChatResponse(text=item)
        return ChatResponse(text="", tool_calls=[item])


def test_react_agent_tool_loop(indexed):
    indexer, _ = indexed
    ex = make_executor(indexer)
    llm = ScriptedLLM([
        ToolCall("semantic_code_search", {"query": "add numbers", "limit": 3}),
        "add_numbers at calc.py adds two values.",
    ])
    agent = ReActAgent(llm, ex)
    result = agent.run("how are numbers added?")
    assert result.succeeded
    assert result.traces and result.traces[0].tool == "semantic_code_search"
    assert "add_numbers" in json.dumps(result.structured())


def test_react_agent_max_turns(indexed):
    indexer, _ = indexed
    ex = make_executor(indexer)
    llm = ScriptedLLM([
        ToolCall("get_hub_nodes", {"limit": 2}) for _ in range(10)
    ])
    agent = ReActAgent(llm, ex, max_turns=3)
    result = agent.run("loop forever")
    assert not result.succeeded
    assert result.turns == 3


def test_lats_agent(indexed):
    indexer, _ = indexed
    ex = make_executor(indexer)

    class LatsLLM(LLMProvider):
        name = "lats-fake"

        def __init__(self):
            pass

        def is_available(self):
            return True

        def chat_with_tools(self, messages, tools):
            prompt = messages[-1]["content"]
            if "Propose" in prompt:
                return ChatResponse(text=json.dumps([
                    {"tool": "semantic_code_search",
                     "params": {"query": "add numbers"}},
                    {"tool": "get_hub_nodes", "params": {"limit": 2}},
                ]))
            if "Rate 0-10" in prompt:
                return ChatResponse(text="7")
            return ChatResponse(text="final: numbers are added in add_numbers")

    agent = LatsAgent(LatsLLM(), ex, max_iterations=2)
    result = agent.run("how are numbers added?")
    assert result.traces
    assert "add" in result.answer


def test_reflexion_agent_retries(indexed):
    indexer, _ = indexed
    ex = make_executor(indexer)

    class Critic(LLMProvider):
        name = "critic"

        def __init__(self):
            self.calls = 0

        def is_available(self):
            return True

        def chat_with_tools(self, messages, tools):
            self.calls += 1
            prompt = messages[-1]["content"]
            if "complete and grounded" in prompt:
                # reject the first answer, accept the second
                return ChatResponse(
                    text="OK" if self.calls > 2 else "missing citations"
                )
            return ChatResponse(text=f"answer v{self.calls}")

    critic = Critic()
    agent = ReflexionAgent(ReActAgent(critic, ex), critic, max_attempts=2)
    result = agent.run("explain add_numbers")
    assert result.succeeded


def test_mcp_server_protocol(indexed):
    indexer, cfg = indexed
    server = MCPServer(make_executor(indexer), cfg)

    init = server.handle_message(
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}}
    )
    assert init["result"]["serverInfo"]["name"] == "codegraph-tpu"

    tools = server.handle_message(
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"}
    )
    names = {t["name"] for t in tools["result"]["tools"]}
    assert set(AGENTIC_TOOLS) <= names
    assert set(TOOL_SCHEMAS) <= names

    call = server.handle_message({
        "jsonrpc": "2.0", "id": 3, "method": "tools/call",
        "params": {"name": "semantic_code_search",
                   "arguments": {"query": "add numbers"}},
    })
    payload = json.loads(call["result"]["content"][0]["text"])
    assert payload["count"] >= 1

    # agentic tool falls back to the direct pipeline (llm.provider=none)
    call = server.handle_message({
        "jsonrpc": "2.0", "id": 4, "method": "tools/call",
        "params": {"name": "agentic_context",
                   "arguments": {"query": "add numbers"}},
    })
    payload = json.loads(call["result"]["content"][0]["text"])
    assert payload["agent"] == "pipeline"
    assert payload["evidence"]

    bad = server.handle_message({"jsonrpc": "2.0", "id": 5, "method": "nope"})
    assert "error" in bad


def test_mcp_server_stdio_transport(indexed):
    indexer, cfg = indexed
    server = MCPServer(make_executor(indexer), cfg)
    stdin = io.StringIO(
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}) + "\n"
        + json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}) + "\n"
    )
    stdout = io.StringIO()
    server.serve_stdio(stdin, stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert lines[0]["id"] == 1 and lines[1]["id"] == 2


def test_create_llm_factory():
    cfg = CodeGraphConfig()
    cfg.llm.provider = "none"
    assert not create_llm(cfg).is_available()
    cfg.llm.provider = "anthropic"
    llm = create_llm(cfg)
    assert llm.name == "anthropic"


def test_progress_notifications(indexed):
    indexer, cfg = indexed
    server = MCPServer(make_executor(indexer), cfg)
    notes = []
    reply = server.handle_message({
        "jsonrpc": "2.0", "id": 9, "method": "tools/call",
        "params": {"name": "agentic_quality",
                   "arguments": {"query": "complexity"},
                   "_meta": {"progressToken": "tok1"}},
    }, notify=notes.append)
    assert reply["id"] == 9
    assert [n["params"]["progress"] for n in notes] == [10, 40, 100]
    assert all(n["params"]["progressToken"] == "tok1" for n in notes)


def test_agent_executor_history(indexed):
    from codegraph_tpu.mcp.executor import AgentExecutor

    indexer, _ = indexed
    ex = make_executor(indexer)
    llm = ScriptedLLM(["first answer about add_numbers", "second answer"])
    exec_ = AgentExecutor(llm, ex, architecture="react")
    r1 = exec_.execute("what does add_numbers do?")
    assert r1.answer.startswith("first")
    r2 = exec_.execute("and who calls it?")
    # second turn's prompt includes the prior Q/A transcript
    assert "Prior conversation" in llm.prompts[-1]
    assert "add_numbers" in llm.prompts[-1]
    s = exec_.stats()
    assert s["turns"] == 2
    exec_.reset()
    assert exec_.stats()["turns"] == 0


def test_mcp_prompts_endpoints(indexed):
    indexer, cfg = indexed
    server = MCPServer(make_executor(indexer), cfg)
    lst = server.handle_message(
        {"jsonrpc": "2.0", "id": 1, "method": "prompts/list"}
    )
    names = {p["name"] for p in lst["result"]["prompts"]}
    assert "architecture_analysis" in names and len(names) == 8
    got = server.handle_message({
        "jsonrpc": "2.0", "id": 2, "method": "prompts/get",
        "params": {"name": "code_search",
                   "arguments": {"query": "find the parser"}},
    })
    text = got["result"]["messages"][0]["content"]["text"]
    assert "find the parser" in text and "graph tools" in text.lower()
    bad = server.handle_message({
        "jsonrpc": "2.0", "id": 3, "method": "prompts/get",
        "params": {"name": "nope"},
    })
    assert "error" in bad


def test_mcp_resources_endpoints(indexed):
    indexer, cfg = indexed
    server = MCPServer(make_executor(indexer), cfg)
    lst = server.handle_message(
        {"jsonrpc": "2.0", "id": 1, "method": "resources/list"}
    )
    resources = lst["result"]["resources"]
    assert resources
    uri = resources[0]["uri"]
    assert uri.startswith("codegraph://file/")
    got = server.handle_message({
        "jsonrpc": "2.0", "id": 2, "method": "resources/read",
        "params": {"uri": uri},
    })
    text = got["result"]["contents"][0]["text"]
    assert "add_numbers" in text
    bad = server.handle_message({
        "jsonrpc": "2.0", "id": 3, "method": "resources/read",
        "params": {"uri": "codegraph://file/nope.py"},
    })
    assert "error" in bad


def test_react_assistant_message_never_empty(indexed):
    """A tool-calls-only model turn must not append an empty assistant
    message (the Anthropic API rejects empty content with a 400)."""
    indexer, _ = indexed
    ex = make_executor(indexer)
    llm = ScriptedLLM([
        ToolCall("get_hub_nodes", {"limit": 2}),
        "the hubs are listed.",
    ])
    agent = ReActAgent(llm, ex)
    result = agent.run("what are the hubs?")
    assert result.succeeded
    # every assistant message in the transcript carried content
    assert all(m["content"] for m in llm.messages_seen
               if m["role"] == "assistant")


def test_tool_executor_does_not_cache_errors(indexed):
    """A transient tool failure must not stick for the cache TTL."""
    indexer, _ = indexed
    ex = make_executor(indexer)
    calls = {"n": 0}
    real = ex._dispatch

    def flaky(tool, p):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("index mid-swap")
        return real(tool, p)

    ex._dispatch = flaky
    r1 = ex.execute("get_hub_nodes", {"limit": 2})
    assert "error" in r1
    r2 = ex.execute("get_hub_nodes", {"limit": 2})  # NOT a cached error
    assert "error" not in r2
    ex.invalidate()
    assert ex.cache.hit_rate >= 0.0  # invalidate() exists and runs


def test_semantic_code_search_filters_end_to_end(indexed, tmp_path):
    """MCP-level SearchFilters: agents can scope a search by language /
    node type / path (search.rs:23-28 parity via the tool schema)."""
    indexer, cfg = indexed
    # add a second file in a different subdir to filter against
    sub = tmp_path / "web"
    sub.mkdir(exist_ok=True)
    (sub / "render.py").write_text(
        "def render_totals(values):\n    return str(values)\n")
    indexer.index_project(str(tmp_path))
    ex = make_executor(indexer)
    schema = TOOL_SCHEMAS["semantic_code_search"]["parameters"]["properties"]
    assert "languages" in schema and "node_types" in schema

    unfiltered = ex.execute("semantic_code_search",
                            {"query": "compute the total", "limit": 10})
    assert unfiltered["count"] > 0
    filtered = ex.execute("semantic_code_search", {
        "query": "compute the total", "limit": 10,
        "path_prefixes": ["web/"],
    })
    assert filtered["count"] >= 1
    assert all("/web/" in r["file_path"] for r in filtered["results"])
    typed = ex.execute("semantic_code_search", {
        "query": "compute the total", "limit": 10,
        "languages": ["python"], "node_types": ["function"],
    })
    assert typed["count"] > 0
    assert all(r["node_type"] == "function" for r in typed["results"])
    none = ex.execute("semantic_code_search", {
        "query": "compute the total", "limit": 10,
        "languages": ["rust"],
    })
    assert none["count"] == 0


def test_auto_soft_filters_from_query(indexed):
    """semantic_code_search with no explicit filters classifies the
    query into SOFT filters (language/kind words + discriminative path
    terms) — VERDICT r4 weak 7. Soft filters must never exclude."""
    from codegraph_tpu.rag.query_processor import (
        infer_soft_filters, path_vocabulary)

    indexer, _ = indexed
    vocab = path_vocabulary(indexer.store.nodes.values())
    f = infer_soft_filters("which python function adds numbers", vocab)
    assert f is not None and f.soft
    assert "python" in f.languages and "function" in f.node_types
    assert infer_soft_filters("general prose with no signals at all",
                              vocab) is None

    tools = make_executor(indexer)
    out = tools.execute("semantic_code_search",
                        {"query": "python function that adds numbers",
                         "limit": 5})
    assert out["count"] >= 1  # soft filters exclude nothing
    names = [r["name"] for r in out["results"]]
    assert "add_numbers" in names
    # opt-out path stays clean
    out2 = tools.execute("semantic_code_search",
                         {"query": "python function that adds numbers",
                          "limit": 5, "auto_filters": False})
    assert out2["count"] >= 1


def test_feature_reranker_ties_break_toward_name_match():
    from codegraph_tpu.core.types import SearchResult
    from codegraph_tpu.search.reranker import FeatureReranker

    results = [
        SearchResult(node_id="a", chunk_id="a", score=0.90,
                     name="serialize_output", snippet="fn serialize"),
        SearchResult(node_id="b", chunk_id="b", score=0.901,
                     name="unrelated_helper", snippet="misc"),
    ]
    fr = FeatureReranker()
    ranked = fr.rerank("serialize output record", list(results), 2)
    # near-tie flips toward the name match...
    assert ranked[0].node_id == "a"
    # ...but a decisive retrieval gap cannot be overturned by features
    results = [
        SearchResult(node_id="a", chunk_id="a", score=0.70,
                     name="serialize_output", snippet="fn serialize"),
        SearchResult(node_id="b", chunk_id="b", score=0.90,
                     name="unrelated_helper", snippet="misc"),
    ]
    ranked = fr.rerank("serialize output record", list(results), 2)
    assert ranked[0].node_id == "b"
