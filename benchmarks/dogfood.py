"""Dogfood: index THIS repository and drive every major feature.

The end-to-end proof on real code: parse + analyze + chunk + embed +
index the codegraph-tpu source tree, then run hybrid searches, graph
analytics, RAG, insights, and MCP tool calls against it.

Usage: python benchmarks/dogfood.py [--root .] [--provider hash]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    parser.add_argument("--provider", default="hash",
                        choices=["hash", "encoder"])
    parser.add_argument("--dim", type=int, default=256)
    args = parser.parse_args()

    import tempfile

    from codegraph_tpu.api import CodeGraph
    from codegraph_tpu.core.config import CodeGraphConfig

    cfg = CodeGraphConfig()
    cfg.data_dir = tempfile.mkdtemp(prefix="cg_dogfood_")
    cfg.embedding.provider = args.provider
    cfg.embedding.dimension = args.dim
    cfg.indexing.tier = "full"

    cg = CodeGraph.open(args.root, config=cfg)
    t0 = time.perf_counter()
    stats = cg.index(force=True)
    build_s = time.perf_counter() - t0
    report = {"index": {**{k: v for k, v in stats.to_dict().items()
                           if k != "stage_seconds"},
                        "build_s": round(build_s, 2)}}

    # hybrid searches a developer would actually run
    queries = [
        "streaming top-k kernel over the corpus",
        "where are edges resolved to node ids",
        "circuit breaker exponential backoff",
        "quantize rows to int8 with per-row scales",
        "MCP server tools list",
    ]
    search_out = []
    lat = []
    for q in queries:
        t0 = time.perf_counter()
        hits = cg.search(q, limit=3)
        lat.append((time.perf_counter() - t0) * 1000)
        search_out.append({
            "q": q,
            "top": [f"{r.name} ({r.file_path.split('/')[-1]}:{r.start_line})"
                    for r in hits],
        })
    report["search"] = {"queries": search_out,
                        "latency_ms_p50": round(sorted(lat)[len(lat) // 2], 2)}

    # graph analytics
    g = cg.graph
    hubs = g.hub_nodes(limit=5)["hubs"]
    report["graph"] = {
        "hubs": [h["name"] for h in hubs],
        "cycles": g.circular_dependencies(max_cycles=3)["count"],
        "hotspots": [h["name"] for h in
                     g.complexity_hotspots(limit=3)["hotspots"]],
    }
    if hubs:
        deps = g.transitive_dependencies(hubs[0]["name"], max_depth=2)
        report["graph"]["hub_deps"] = deps["count"]

    # RAG answer
    ans = cg.ask("how does the hybrid search combine vector and text scores?")
    report["rag"] = {"query_type": ans["query_type"],
                     "latency_ms": ans["latency_ms"],
                     "n_sources": len(ans["sources"]),
                     "answer_head": ans["answer"][:160]}

    # insights
    report["insights"] = [i["kind"] for i in cg.insights("top-k kernels")]

    # MCP tool round-trip
    from codegraph_tpu.graph.queries import GraphQueries
    from codegraph_tpu.mcp.server import MCPServer
    from codegraph_tpu.mcp.tools import GraphToolExecutor

    server = MCPServer(
        GraphToolExecutor(GraphQueries(cg.indexer.store), cg.indexer.search),
        cfg,
    )
    reply = server.handle_message({
        "jsonrpc": "2.0", "id": 1, "method": "tools/call",
        "params": {"name": "agentic_architecture",
                   "arguments": {"query": "overall structure"}},
    })
    payload = json.loads(reply["result"]["content"][0]["text"])
    report["mcp"] = {"agent": payload["agent"],
                     "evidence_tools": [e["tool"] for e in payload["evidence"]]}

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
