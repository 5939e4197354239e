from codegraph_tpu.core.types import (
    CodeNode,
    CodeEdge,
    CodeChunk,
    EdgeType,
    Language,
    Location,
    NodeType,
    deterministic_node_id,
)
from codegraph_tpu.core.config import CodeGraphConfig, load_config
from codegraph_tpu.core.padding import round_up, pad_rows, pad_axis

__all__ = [
    "CodeNode",
    "CodeEdge",
    "CodeChunk",
    "EdgeType",
    "Language",
    "Location",
    "NodeType",
    "deterministic_node_id",
    "CodeGraphConfig",
    "load_config",
    "round_up",
    "pad_rows",
    "pad_axis",
]
