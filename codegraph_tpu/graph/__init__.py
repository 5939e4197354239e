"""Code graph layer: CSR adjacency + graph queries + storage.

TPU-native replacement for the reference's SurrealDB graph layer
(crates/codegraph-graph/src/surrealdb_storage.rs + graph_functions.rs +
schema/codegraph.surql): node/edge/chunk records live in a host-side
store with snapshot persistence, while adjacency lives as CSR int32
arrays — on device for the hybrid-search boost kernel, on host for the
graph analytics the reference runs as SurrealQL fn::* functions.
"""

from codegraph_tpu.graph.csr import CSRGraph, build_csr
from codegraph_tpu.graph.store import GraphStore
from codegraph_tpu.graph.queries import GraphQueries

__all__ = ["CSRGraph", "build_csr", "GraphStore", "GraphQueries"]
