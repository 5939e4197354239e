"""Streaming: LLM SSE providers (mcp/llm.py chat_stream) + the
streamable-HTTP MCP transport with session ids (mcp/server.py).

Round-1 VERDICT items 4-5 exit criteria: a streamed tool-call turn over
HTTP end-to-end against a fake LLM, plus provider-level SSE parsing for
the Anthropic and OpenAI dialects.
"""

import json
import socket
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from codegraph_tpu.core.config import CodeGraphConfig, LLMConfig
from codegraph_tpu.graph.queries import GraphQueries
from codegraph_tpu.indexer.indexer import ProjectIndexer
from codegraph_tpu.mcp.llm import (
    AnthropicProvider,
    LLMProvider,
    OpenAICompatibleProvider,
)
from codegraph_tpu.mcp.server import MCPServer
from codegraph_tpu.mcp.tools import GraphToolExecutor


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def sse_server(events):
    """A one-endpoint HTTP server that replies with the given SSE lines."""

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            for ev in events:
                self.wfile.write(f"data: {json.dumps(ev)}\n\n".encode())
            self.wfile.write(b"data: [DONE]\n\n")

        def log_message(self, *a):
            pass

    port = free_port()
    httpd = ThreadingHTTPServer(("127.0.0.1", port), H)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, f"http://127.0.0.1:{port}"


def test_openai_chat_stream_text_and_tools():
    events = [
        {"choices": [{"delta": {"content": "Hel"}}]},
        {"choices": [{"delta": {"content": "lo"}}]},
        {"choices": [{"delta": {"tool_calls": [
            {"index": 0, "id": "c1",
             "function": {"name": "search", "arguments": '{"q": '}}]}}]},
        {"choices": [{
            "delta": {"tool_calls": [
                {"index": 0, "function": {"arguments": '"x"}'}}]},
            "finish_reason": "tool_calls",
        }]},
    ]
    httpd, base = sse_server(events)
    try:
        p = OpenAICompatibleProvider(LLMConfig(base_url=base, model="m"))
        frags = []
        resp = p.chat_stream(
            [{"role": "user", "content": "hi"}], on_text=frags.append)
        assert "".join(frags) == "Hello"
        assert resp.text == "Hello"
        assert resp.stop_reason == "tool_calls"
        assert len(resp.tool_calls) == 1
        assert resp.tool_calls[0].name == "search"
        assert resp.tool_calls[0].arguments == {"q": "x"}
    finally:
        httpd.shutdown()


def test_anthropic_chat_stream_text_and_tools(monkeypatch):
    monkeypatch.setenv("ANTHROPIC_API_KEY", "test-key")
    events = [
        {"type": "message_start"},
        {"type": "content_block_delta", "index": 0,
         "delta": {"type": "text_delta", "text": "I will "}},
        {"type": "content_block_delta", "index": 0,
         "delta": {"type": "text_delta", "text": "search."}},
        {"type": "content_block_start", "index": 1,
         "content_block": {"type": "tool_use", "id": "t1",
                           "name": "semantic_code_search"}},
        {"type": "content_block_delta", "index": 1,
         "delta": {"type": "input_json_delta",
                   "partial_json": '{"query": "ad'}},
        {"type": "content_block_delta", "index": 1,
         "delta": {"type": "input_json_delta", "partial_json": 'd"}'}},
        {"type": "message_delta", "delta": {"stop_reason": "tool_use"},
         "usage": {"output_tokens": 12}},
    ]
    httpd, base = sse_server(events)
    try:
        p = AnthropicProvider(LLMConfig(base_url=base, model="m"))
        frags = []
        resp = p.chat_stream(
            [{"role": "user", "content": "hi"}], on_text=frags.append)
        assert "".join(frags) == "I will search."
        assert resp.stop_reason == "tool_use"
        assert resp.tool_calls[0].name == "semantic_code_search"
        assert resp.tool_calls[0].arguments == {"query": "add"}
        assert resp.usage.get("output_tokens") == 12
    finally:
        httpd.shutdown()


def test_chat_stream_fallback_for_non_streaming_provider():
    class Plain(LLMProvider):
        def chat_with_tools(self, messages, tools):
            from codegraph_tpu.mcp.llm import ChatResponse

            return ChatResponse(text="buffered answer")

    p = Plain(LLMConfig())
    frags = []
    resp = p.chat_stream([{"role": "user", "content": "x"}],
                         on_text=frags.append)
    assert frags == ["buffered answer"]
    assert resp.text == "buffered answer"


# ---------------------------------------------------------------------------
# Streamable-HTTP MCP end-to-end
# ---------------------------------------------------------------------------


class FakeStreamingLLM(LLMProvider):
    """One streamed turn: emits text fragments, then the final answer."""

    name = "fake"
    supports_streaming = True

    def __init__(self):
        super().__init__(LLMConfig())

    def is_available(self):
        return True

    def chat_with_tools(self, messages, tools):
        from codegraph_tpu.mcp.llm import ChatResponse

        return ChatResponse(text="The add_numbers function adds values.")

    def chat_stream(self, messages, tools=(), on_text=None):
        from codegraph_tpu.mcp.llm import ChatResponse

        for frag in ("The add_numbers ", "function ", "adds values."):
            if on_text:
                on_text(frag)
            time.sleep(0.01)
        return ChatResponse(text="The add_numbers function adds values.")


@pytest.fixture
def http_mcp(tmp_path):
    (tmp_path / "calc.py").write_text(
        "def add_numbers(a, b):\n    return a + b\n")
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))
    server = MCPServer(
        GraphToolExecutor(GraphQueries(indexer.store), indexer.search), cfg)
    server.llm = FakeStreamingLLM()
    port = free_port()
    httpd = server.make_http_server("127.0.0.1", port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}/mcp", httpd
    httpd.shutdown()


def _post(url, body, headers=None, timeout=30):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json", **(headers or {})})
    return urllib.request.urlopen(req, timeout=timeout)


def test_streamed_tool_call_over_http(http_mcp):
    url, httpd = http_mcp
    # 1. initialize mints a session id
    with _post(url, {"jsonrpc": "2.0", "id": 1, "method": "initialize",
                     "params": {}}) as resp:
        sid = resp.headers.get("Mcp-Session-Id")
        init = json.loads(resp.read())
    assert sid and init["result"]["serverInfo"]["name"] == "codegraph-tpu"
    assert sid in httpd._mcp_sessions

    # 2. streamed agentic tool call: SSE events arrive incrementally
    body = {"jsonrpc": "2.0", "id": 2, "method": "tools/call",
            "params": {"name": "agentic_context",
                       "arguments": {"query": "add numbers"},
                       "_meta": {"progressToken": "tok1"}}}
    events = []
    with _post(url, body, headers={"Accept": "text/event-stream",
                                   "Mcp-Session-Id": sid}) as resp:
        assert resp.headers.get("Content-Type", "").startswith(
            "text/event-stream")
        for raw in resp:
            line = raw.decode().strip()
            if line.startswith("data:"):
                events.append(json.loads(line[5:].strip()))
    # progress + streamed text notifications + final response
    methods = [e.get("method") for e in events if "method" in e]
    assert "notifications/progress" in methods
    text_frags = [e["params"]["data"] for e in events
                  if e.get("method") == "notifications/message"]
    assert "".join(text_frags) == "The add_numbers function adds values."
    finals = [e for e in events if e.get("id") == 2]
    assert len(finals) == 1
    payload = json.loads(finals[0]["result"]["content"][0]["text"])
    assert payload["answer"] == "The add_numbers function adds values."

    # 3. unknown session id -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, {"jsonrpc": "2.0", "id": 3, "method": "tools/list",
                    "params": {}}, headers={"Mcp-Session-Id": "nope"})
    assert ei.value.code == 404

    # 4. DELETE terminates the session
    req = urllib.request.Request(url, method="DELETE",
                                 headers={"Mcp-Session-Id": sid})
    with urllib.request.urlopen(req, timeout=10) as resp:
        assert resp.status == 204
    assert sid not in httpd._mcp_sessions


def test_http_auth_token(tmp_path):
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))
    server = MCPServer(
        GraphToolExecutor(GraphQueries(indexer.store), indexer.search), cfg)
    port = free_port()
    httpd = server.make_http_server("127.0.0.1", port, auth_token="s3cret")
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{port}/mcp"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, {"jsonrpc": "2.0", "id": 1, "method": "initialize",
                        "params": {}})
        assert ei.value.code == 401
        with _post(url, {"jsonrpc": "2.0", "id": 1, "method": "initialize",
                         "params": {}},
                   headers={"Authorization": "Bearer s3cret"}) as resp:
            assert resp.status == 200
    finally:
        httpd.shutdown()
