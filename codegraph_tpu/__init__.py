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
  index/    -- flat / int8 / IVF indexes + snapshots     (codegraph-vector)
  models/   -- on-chip encoder + hash embedder           (local_provider, onnx)
  parallel/ -- mesh, sharded search, k-way merge         (new; TPU-native)
  graph/    -- CSR graph store + graph queries           (codegraph-graph)
  parser/   -- source parsing + chunking (host)          (codegraph-parser)
  search/   -- semantic + BM25 + hybrid + rerank         (search.rs, surql fns)
  mcp/      -- MCP server + agent tools                  (codegraph-mcp-*)
"""

from codegraph_tpu.version import __version__

__all__ = ["__version__"]
