from codegraph_tpu.ops.similarity import l2_normalize, pairwise_scores
from codegraph_tpu.ops.topk import (
    NEG_INF,
    exact_topk,
    merge_topk,
    streaming_topk,
    streaming_topk_pallas,
)

__all__ = [
    "NEG_INF",
    "l2_normalize",
    "pairwise_scores",
    "exact_topk",
    "merge_topk",
    "streaming_topk",
    "streaming_topk_pallas",
]
