"""codegraph-tpu: a TPU-native code-intelligence framework.

A brand-new framework with the capabilities of the reference CodeGraph
(Rust) system: codebase -> knowledge graph + embedding index -> hybrid
semantic search -> agentic MCP tools. The retrieval engine is designed
TPU-first: flat/IVF cosine top-k as fused Pallas matmul + streaming top-k
kernels over HBM-resident (int8-quantizable) embedding matrices, on-chip
k-means index build, CSR graph-adjacency hybrid re-ranking, and multi-chip
sharding with per-shard top-k + k-way merge over ICI.

Layer map (mirrors reference SURVEY.md section 1, re-architected for TPU):
  core/     -- types, deterministic ids, config          (codegraph-core)
  ops/      -- Pallas/XLA kernels: topk, int8, kmeans    (simd_ops, optimization)
  index/    -- flat / int8 / IVF indexes                 (codegraph-vector)
  models/   -- on-chip encoder, providers, training      (local_provider, onnx, ml/)
  parallel/ -- mesh, sharded search, k-way merge         (new; TPU-native)
  graph/    -- CSR graph store + graph queries           (codegraph-graph)
  parser/   -- source parsing + chunking + watch (host)  (codegraph-parser)
  search/   -- BM25 + hybrid + cache + rerank            (search.rs, surql fns)
  indexer/  -- build pipeline + estimation + resolution  (codegraph-mcp)
  mcp/      -- MCP server, 8 graph tools, agents, LLMs   (codegraph-mcp-*)
  utils/    -- perfmon, heartbeat, circuit breaker       (aux subsystems)
  cli.py    -- codegraph CLI; daemon.py -- watch daemon  (server bin, daemon)
"""

from codegraph_tpu.version import __version__


def __getattr__(name):
    # lazy: `from codegraph_tpu import CodeGraph` without importing jax
    # at package-import time
    if name == "CodeGraph":
        from codegraph_tpu.api import CodeGraph

        return CodeGraph
    raise AttributeError(name)


__all__ = ["__version__", "CodeGraph"]
