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


def test_metrics_endpoint(tmp_path):
    """GET /metrics serves Prometheus text with tool/cache/graph gauges
    (reference ships prometheus for its HTTP server, Cargo.toml:219)."""
    (tmp_path / "m.py").write_text("def compute_total(x):\n    return x\n")
    cfg = make_cfg(tmp_path)
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))
    tools = GraphToolExecutor(GraphQueries(indexer.store), indexer.search)
    server = MCPServer(tools, cfg)
    tools.execute("semantic_code_search", {"query": "compute total"})

    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = server.make_http_server("127.0.0.1", port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=10) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/plain")
            text = resp.read().decode()
        assert "# TYPE codegraph_tool_calls_total counter" in text
        assert 'codegraph_tool_calls_total{tool="semantic_code_search"} 1' \
            in text
        assert "codegraph_graph_nodes " in text
        assert "codegraph_index_rows " in text
        assert "codegraph_search_cache_" in text
    finally:
        httpd.shutdown()


def test_metrics_registry_service_source():
    """QueryService stats (incl. shed/queue depth) export via the
    registry; broken sources don't take down the scrape."""
    import numpy as np

    from codegraph_tpu.index.flat import FlatIndex
    from codegraph_tpu.search.service import QueryService
    from codegraph_tpu.utils.metrics import (
        MetricsRegistry,
        make_service_source,
    )

    index = FlatIndex(16, tile_n=128, backend="xla")
    index.add(np.eye(16, dtype=np.float32))
    svc = QueryService(index, k=2, max_batch=4, max_wait_ms=1.0)
    try:
        svc.search(np.eye(16, dtype=np.float32)[0])
        reg = MetricsRegistry()
        reg.register("qsvc", make_service_source(svc))
        reg.register("broken", lambda: 1 / 0)
        text = reg.render()
        assert "codegraph_service_queries_total 1" in text
        assert "codegraph_service_shed_total 0" in text
        assert "codegraph_service_queue_depth 0" in text
        assert 'codegraph_source_error{source="broken"} 1' in text
    finally:
        svc.close()
