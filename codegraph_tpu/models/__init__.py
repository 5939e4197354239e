"""Model family: on-chip text encoders + host-side embedding providers.

TPU-native replacement for the reference's in-process embedding models
(crates/codegraph-vector/src/local_provider.rs Candle BERT,
src/onnx_provider.rs ONNX) and its HTTP provider zoo (openai/jina/
ollama/lmstudio providers + HybridEmbeddingPipeline fallback chain,
src/providers.rs:61-283).
"""

from codegraph_tpu.models.encoder import (
    EncoderConfig,
    init_encoder_params,
    encode,
    encoder_param_shardings,
)
from codegraph_tpu.models.tokenizer import ByteTokenizer
from codegraph_tpu.models.hash_embedder import hash_embed_texts
from codegraph_tpu.models.providers import (
    EmbeddingProvider,
    HashProvider,
    EncoderProvider,
    HybridEmbeddingPipeline,
    create_provider,
)

__all__ = [
    "EncoderConfig",
    "init_encoder_params",
    "encode",
    "encoder_param_shardings",
    "ByteTokenizer",
    "hash_embed_texts",
    "EmbeddingProvider",
    "HashProvider",
    "EncoderProvider",
    "HybridEmbeddingPipeline",
    "create_provider",
]
