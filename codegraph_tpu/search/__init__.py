"""Search layer: semantic + BM25 text + graph-boosted hybrid + rerank.

Re-implements the reference's query stack: `SemanticSearch`
(crates/codegraph-vector/src/search.rs:14-592), the SurrealQL hybrid
function `fn::semantic_search_nodes_via_chunks`
(schema/codegraph.surql:328-536: HNSW KNN + BM25 + 0.9/0.1 mix + edge
context), the search cache (src/cache.rs:391-458) and the reranker
pipeline (src/reranker.rs:250-432).
"""

from codegraph_tpu.search.bm25 import BM25Index
from codegraph_tpu.search.hybrid import HybridSearch
from codegraph_tpu.search.cache import SearchCache

__all__ = ["BM25Index", "HybridSearch", "SearchCache"]
