from codegraph_tpu.ops.similarity import l2_normalize, pairwise_scores
from codegraph_tpu.ops.topk import (
    NEG_INF,
    exact_topk,
    merge_topk,
    streaming_topk,
    streaming_topk_pallas,
    streaming_topk_pallas_qmajor,
    streaming_topk_pallas_qmajor_xt,
)
from codegraph_tpu.ops.quantize import (
    quantize_rows,
    dequantize_rows,
    streaming_topk_int8,
    streaming_topk_int8_pallas,
    rescore_topk,
)
from codegraph_tpu.ops.kmeans import kmeans, assign_clusters
from codegraph_tpu.ops.pq import pq_train, pq_encode, pq_decode, pq_adc_topk

__all__ = [
    "NEG_INF",
    "l2_normalize",
    "pairwise_scores",
    "exact_topk",
    "merge_topk",
    "streaming_topk",
    "streaming_topk_pallas",
    "streaming_topk_pallas_qmajor",
    "streaming_topk_pallas_qmajor_xt",
    "quantize_rows",
    "dequantize_rows",
    "streaming_topk_int8",
    "streaming_topk_int8_pallas",
    "rescore_topk",
    "kmeans",
    "assign_clusters",
    "pq_train",
    "pq_encode",
    "pq_decode",
    "pq_adc_topk",
]
