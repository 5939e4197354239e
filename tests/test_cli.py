"""End-to-end CLI tests: spawn the real CLI as a child process and drive
the MCP server over stdio — the reference's e2e strategy
(crates/codegraph-mcp/tests/e2e_mcp_tools.rs spawns the codegraph binary
and talks rmcp over stdio)."""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, tmp_path, input_text=None, timeout=90):
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["CODEGRAPH_EMBEDDING_PROVIDER"] = "hash"
    env["CODEGRAPH_EMBEDDING_DIMENSION"] = "64"
    env["CODEGRAPH_DATA_DIR"] = str(tmp_path / ".codegraph")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "codegraph_tpu.cli", *args],
        capture_output=True, text=True, input=input_text,
        timeout=timeout, env=env, cwd=str(tmp_path),
    )


@pytest.fixture
def project(tmp_path):
    (tmp_path / "app.py").write_text(textwrap.dedent('''
        def fetch_data(url):
            return url

        def process_data(url):
            data = fetch_data(url)
            return data.upper()
    '''))
    return tmp_path


def test_cli_index_search_status(project):
    r = run_cli(["index", str(project)], project)
    assert r.returncode == 0, r.stderr
    stats = json.loads(r.stdout)
    assert stats["files_parsed"] == 1
    assert stats["nodes"] >= 2

    r = run_cli(["search", "fetch data from url", "--limit", "3"], project)
    assert r.returncode == 0, r.stderr
    results = json.loads(r.stdout)
    assert any(x["name"] == "fetch_data" for x in results)

    r = run_cli(["status"], project)
    status = json.loads(r.stdout)
    assert status["indexed"] is True
    assert status["nodes"] >= 2

    r = run_cli(["check"], project)
    assert json.loads(r.stdout)["ok"] is True


def test_cli_estimate(project):
    r = run_cli(["estimate", str(project)], project)
    assert r.returncode == 0, r.stderr
    est = json.loads(r.stdout)
    assert est["files"] == 1 and est["nodes"] >= 2


def test_cli_mcp_stdio_end_to_end(project):
    run_cli(["index", str(project)], project)
    messages = "\n".join([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {}}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}),
        json.dumps({"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                    "params": {"name": "semantic_code_search",
                               "arguments": {"query": "fetch data"}}}),
    ]) + "\n"
    r = run_cli(["start", "stdio"], project, input_text=messages)
    assert r.returncode == 0, r.stderr
    replies = [json.loads(l) for l in r.stdout.splitlines() if l.strip()]
    assert replies[0]["result"]["serverInfo"]["name"] == "codegraph-tpu"
    tool_names = {t["name"] for t in replies[1]["result"]["tools"]}
    assert "agentic_context" in tool_names
    payload = json.loads(replies[2]["result"]["content"][0]["text"])
    assert payload["count"] >= 1
    assert any(x["name"] == "fetch_data" for x in payload["results"])


def test_cli_config_dump(project):
    r = run_cli(["config"], project)
    cfg = json.loads(r.stdout)
    assert cfg["embedding"]["provider"] == "hash"
    assert cfg["embedding"]["dimension"] == 64


def test_cli_secret_roundtrip(project, tmp_path):
    env_dir = str(tmp_path / "cfgdir")
    import subprocess, sys as _sys

    def run_secret(args, **kw):
        env = os.environ.copy()
        env["JAX_PLATFORMS"] = "cpu"
        env["CODEGRAPH_CONFIG_DIR"] = env_dir
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.run(
            [_sys.executable, "-m", "codegraph_tpu.cli", "secret", *args],
            capture_output=True, text=True, timeout=60, env=env,
        )

    r = run_secret(["set", "TEST_KEY", "abc123"])
    assert r.returncode == 0, r.stderr
    r = run_secret(["get", "TEST_KEY"])
    assert r.stdout.strip() == "abc123"
    r = run_secret(["list"])
    assert "TEST_KEY" in r.stdout
    r = run_secret(["delete", "TEST_KEY"])
    r = run_secret(["get", "TEST_KEY"])
    assert r.returncode == 1
