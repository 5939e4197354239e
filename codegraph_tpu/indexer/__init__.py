"""Indexing orchestrator: parse -> analyze -> chunk -> embed -> index.

Capability parity with the reference's codegraph-mcp indexer crate
(crates/codegraph-mcp/src/indexer.rs ProjectIndexer 4,701 LoC +
estimation.rs + heartbeat.rs), re-shaped for the TPU pipeline: host
parsing/chunking feeds device batch-encode + index add; edge resolution
uses the same normalize -> exact -> fuzzy -> embedding-cosine ladder.
"""

from codegraph_tpu.indexer.indexer import ProjectIndexer, IndexStats
from codegraph_tpu.indexer.estimation import RepositoryEstimator
from codegraph_tpu.indexer.resolve import EdgeResolver

__all__ = ["ProjectIndexer", "IndexStats", "RepositoryEstimator", "EdgeResolver"]
