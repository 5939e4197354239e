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
