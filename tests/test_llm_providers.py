"""LLM provider protocol tests: request/response dialects, no network."""

import json

import pytest

import codegraph_tpu.mcp.llm as llm_mod
from codegraph_tpu.core.config import LLMConfig
from codegraph_tpu.mcp.llm import (
    AnthropicProvider,
    OpenAICompatibleProvider,
    ToolCall,
)


@pytest.fixture
def capture(monkeypatch):
    calls = {}

    def fake_post(url, body, headers, timeout=120.0, retries=2):
        calls["url"] = url
        calls["body"] = body
        calls["headers"] = headers
        return calls["response"]

    monkeypatch.setattr(llm_mod, "_post_json", fake_post)
    return calls


def test_anthropic_dialect(capture, monkeypatch):
    monkeypatch.setenv("ANTHROPIC_API_KEY", "k")
    p = AnthropicProvider(LLMConfig(provider="anthropic", model="m",
                                    max_tokens=128))
    capture["response"] = {
        "content": [
            {"type": "text", "text": "thinking..."},
            {"type": "tool_use", "id": "t1", "name": "semantic_code_search",
             "input": {"query": "x"}},
        ],
        "stop_reason": "tool_use",
        "usage": {"input_tokens": 10},
    }
    resp = p.chat_with_tools(
        [{"role": "system", "content": "sys"},
         {"role": "user", "content": "hi"}],
        [{"name": "semantic_code_search", "description": "d",
          "parameters": {"type": "object"}}],
    )
    assert capture["url"].endswith("/v1/messages")
    assert capture["body"]["system"] == "sys"
    assert capture["body"]["messages"] == [{"role": "user", "content": "hi"}]
    assert capture["body"]["tools"][0]["input_schema"] == {"type": "object"}
    assert capture["headers"]["x-api-key"] == "k"
    assert resp.text == "thinking..."
    assert resp.tool_calls[0].name == "semantic_code_search"
    assert resp.tool_calls[0].arguments == {"query": "x"}


def test_openai_dialect(capture, monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "ok")
    p = OpenAICompatibleProvider(LLMConfig(provider="openai", model="gpt"))
    capture["response"] = {
        "choices": [{
            "message": {
                "content": None,
                "tool_calls": [{
                    "id": "c1",
                    "function": {"name": "get_hub_nodes",
                                 "arguments": json.dumps({"limit": 3})},
                }],
            },
            "finish_reason": "tool_calls",
        }],
        "usage": {},
    }
    resp = p.chat_with_tools(
        [{"role": "user", "content": "hubs?"}],
        [{"name": "get_hub_nodes", "parameters": {"type": "object"}}],
    )
    assert capture["url"].endswith("/chat/completions")
    assert capture["body"]["tools"][0]["type"] == "function"
    assert capture["headers"]["Authorization"] == "Bearer ok"
    assert resp.tool_calls[0].arguments == {"limit": 3}
    assert resp.stop_reason == "tool_calls"


def test_openai_malformed_tool_args(capture, monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "ok")
    p = OpenAICompatibleProvider(LLMConfig(provider="openai", model="gpt"))
    capture["response"] = {
        "choices": [{"message": {
            "content": "text",
            "tool_calls": [{"function": {"name": "t", "arguments": "{bad"}}],
        }, "finish_reason": "stop"}],
    }
    resp = p.chat(["..."] and [{"role": "user", "content": "x"}])
    assert resp.tool_calls[0].arguments == {}  # degrades, no crash


def test_availability_gating(monkeypatch):
    monkeypatch.delenv("ANTHROPIC_API_KEY", raising=False)
    assert not AnthropicProvider(LLMConfig(provider="anthropic")).is_available()
    monkeypatch.setenv("ANTHROPIC_API_KEY", "k")
    assert AnthropicProvider(LLMConfig(provider="anthropic")).is_available()


def test_post_json_no_retry_on_4xx_and_surfaces_body(monkeypatch):
    """400/401 must fail fast with the API's explanatory body; 429 and
    5xx keep retrying."""
    import io
    import urllib.error

    from codegraph_tpu.mcp import llm as llm_mod

    calls = {"n": 0}

    def fake_urlopen(req, timeout=0):
        calls["n"] += 1
        raise urllib.error.HTTPError(
            req.full_url, 400, "Bad Request", {},
            io.BytesIO(b'{"error": {"message": "tools[0] invalid"}}'),
        )

    monkeypatch.setattr(llm_mod.urllib.request, "urlopen", fake_urlopen)
    monkeypatch.setattr(llm_mod.time, "sleep", lambda s: None)
    with pytest.raises(llm_mod.ProviderUnavailable) as e:
        llm_mod._post_json("https://x/v1", {}, {})
    assert calls["n"] == 1                  # no retries on 400
    assert "tools[0] invalid" in str(e.value)  # body surfaced

    calls["n"] = 0

    def fake_429(req, timeout=0):
        calls["n"] += 1
        raise urllib.error.HTTPError(req.full_url, 429, "rate", {},
                                     io.BytesIO(b"slow down"))

    monkeypatch.setattr(llm_mod.urllib.request, "urlopen", fake_429)
    with pytest.raises(llm_mod.ProviderUnavailable):
        llm_mod._post_json("https://x/v1", {}, {}, retries=2)
    assert calls["n"] == 3                  # 429 IS retried


def test_is_alive_eperm_means_alive(monkeypatch):
    import os as _os

    from codegraph_tpu.mcp.process import is_alive

    def kill_eperm(pid, sig):
        raise PermissionError

    monkeypatch.setattr(_os, "kill", kill_eperm)
    assert is_alive(12345)                  # exists, other user

    def kill_esrch(pid, sig):
        raise ProcessLookupError

    monkeypatch.setattr(_os, "kill", kill_esrch)
    assert not is_alive(12345)
