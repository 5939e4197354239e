import json
import threading
import time
import urllib.request

import pytest

from codegraph_tpu.core.config import CodeGraphConfig
from codegraph_tpu.daemon import SessionMetrics, WatchDaemon
from codegraph_tpu.graph.queries import GraphQueries
from codegraph_tpu.indexer.indexer import ProjectIndexer
from codegraph_tpu.mcp.server import MCPServer
from codegraph_tpu.mcp.tools import GraphToolExecutor
from codegraph_tpu.parser.watcher import BatchedChanges


def make_cfg(tmp_path):
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.data_dir = str(tmp_path / ".cg")
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    return cfg


def test_watch_daemon_process_batch(tmp_path):
    (tmp_path / "a.py").write_text("def one(): return 1\n")
    cfg = make_cfg(tmp_path)
    daemon = WatchDaemon(cfg, str(tmp_path))
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))

    (tmp_path / "b.py").write_text("def two(): return 2\n")
    batch = BatchedChanges(created=[str(tmp_path / "b.py")])
    daemon.process_batch(indexer, batch)
    assert daemon.metrics.files_indexed == 1
    assert any(n.name == "two" for n in indexer.store.nodes.values())

    (tmp_path / "b.py").unlink()
    daemon.process_batch(indexer, BatchedChanges(deleted=[str(tmp_path / "b.py")]))
    assert daemon.metrics.files_deleted == 1
    assert not any(n.name == "two" for n in indexer.store.nodes.values())
    m = daemon.metrics.to_dict()
    assert m["batches"] == 2 and m["failures"] == 0


def test_watch_daemon_circuit_gating(tmp_path):
    cfg = make_cfg(tmp_path)
    cfg.daemon.failure_threshold = 1
    daemon = WatchDaemon(cfg, str(tmp_path))
    daemon.breaker.record_failure()
    assert not daemon.breaker.should_allow_request()


def test_http_transport_end_to_end(tmp_path):
    (tmp_path / "svc.py").write_text(
        "def handle_request(req):\n    return req.body\n"
    )
    cfg = make_cfg(tmp_path)
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))
    server = MCPServer(
        GraphToolExecutor(GraphQueries(indexer.store), indexer.search), cfg
    )

    import socket
    from http.server import ThreadingHTTPServer

    # find a free port, then run serve_http's handler on it
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    t = threading.Thread(
        target=server.serve_http, args=("127.0.0.1", port), daemon=True
    )
    t.start()
    time.sleep(0.3)

    def rpc(method, params=None, mid=1):
        body = json.dumps({"jsonrpc": "2.0", "id": mid, "method": method,
                           "params": params or {}}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/mcp", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            return json.loads(resp.read())

    init = rpc("initialize")
    assert init["result"]["serverInfo"]["name"] == "codegraph-tpu"
    tools = rpc("tools/list", mid=2)
    assert any(t_["name"] == "semantic_code_search"
               for t_ in tools["result"]["tools"])
    call = rpc("tools/call", {"name": "semantic_code_search",
                              "arguments": {"query": "handle request"}}, 3)
    payload = json.loads(call["result"]["content"][0]["text"])
    assert payload["count"] >= 1
    assert payload["results"][0]["name"] == "handle_request"
