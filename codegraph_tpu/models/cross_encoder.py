"""On-chip cross-encoder: joint (query, document) relevance scoring.

Reference: crates/codegraph-vector/src/reranker.rs:170 CrossEncoderReRanker
(stage 2 of the rerank pipeline scores each (query, doc) pair with a
model rather than comparing embeddings). TPU re-design: reuse the
transformer encoder over the concatenated pair `[CLS] query [SEP] doc
[SEP]` with a scalar scoring head on the CLS position; all candidate
pairs for a query score as ONE batch (B = n_candidates), so the rerank
is a single device dispatch.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class CrossEncoder:
    """Pairwise relevance scorer built on the shared encoder stack."""

    def __init__(
        self,
        hidden: int = 256,
        n_layers: int = 4,
        max_len: int = 256,
        checkpoint: Optional[str] = None,
        seed: int = 0,
    ):
        import jax
        import jax.numpy as jnp

        from codegraph_tpu.models.encoder import (
            EncoderConfig,
            encode_jit,
            init_encoder_params,
        )
        from codegraph_tpu.models.tokenizer import VOCAB_SIZE, ByteTokenizer

        n_heads = next(h for h in (8, 4, 2, 1) if hidden % h == 0)
        # CLS pooling: the head reads the joint [CLS] representation
        self.cfg = EncoderConfig(
            vocab_size=VOCAB_SIZE, hidden=hidden, n_layers=n_layers,
            n_heads=n_heads, max_len=max_len, pooling="cls",
        )
        self.tokenizer = ByteTokenizer(max_len=max_len)
        self._encode = encode_jit
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        if checkpoint and os.path.exists(checkpoint):
            from codegraph_tpu.models.providers import load_encoder_checkpoint

            blob = load_encoder_checkpoint(checkpoint)
            self.params = blob["encoder"]
            self.head = blob["head"]
            # the checkpoint's array shapes dictate the architecture —
            # ctor defaults must not be trusted (a 384-wide checkpoint
            # under a 256-wide cfg reshape-crashes at first score)
            tok_emb = self.params["tok_emb"]
            hidden = int(tok_emb.shape[1])
            n_layers = int(self.params["layers"]["wqkv"].shape[0])
            max_len = int(self.params["pos_emb"].shape[0])
            n_heads = next(h for h in (8, 4, 2, 1) if hidden % h == 0)
            self.cfg = EncoderConfig(
                vocab_size=int(tok_emb.shape[0]), hidden=hidden,
                n_layers=n_layers, n_heads=n_heads, max_len=max_len,
                pooling="cls",
            )
            self.tokenizer = ByteTokenizer(max_len=max_len)
        else:
            self.params = init_encoder_params(k1, self.cfg)
            self.head = {
                "w": (jax.random.normal(k2, (hidden,), jnp.float32)
                      / jnp.sqrt(hidden)),
                "b": jnp.zeros((), jnp.float32),
            }

    def _pair_text(self, query: str, doc: str) -> str:
        # byte-level: a rare separator byte sequence marks the boundary
        return f"{query}\x1e{doc}"

    def score_pairs(self, query: str, docs: Sequence[str]) -> np.ndarray:
        """-> [n_docs] f32 relevance scores (one device dispatch)."""
        import jax.numpy as jnp

        if not docs:
            return np.zeros((0,), np.float32)
        texts = [self._pair_text(query, d) for d in docs]
        ids, mask = self.tokenizer.encode_batch(texts)
        cls = self._encode(
            self.params, jnp.asarray(ids), jnp.asarray(mask), self.cfg,
            normalize=False,
        )  # [n, hidden] CLS representations
        scores = cls @ self.head["w"] + self.head["b"]
        return np.asarray(scores, np.float32)

    def as_scorer(self):
        """Adapter for search/reranker.py CrossScorerReranker(scorer=...):
        a (query, text) -> float callable. Prefer `rerank_batch` in hot
        paths — the adapter scores one pair per dispatch."""

        def scorer(query: str, text: str) -> float:
            return float(self.score_pairs(query, [text])[0])

        return scorer

    def rerank_batch(self, query: str, results: List, k: int) -> List:
        """Batched rerank over SearchResult-like items (uses .snippet/.name)."""
        if not results:
            return results
        scores = self.score_pairs(
            query, [f"{r.name} {r.snippet}" for r in results]
        )
        order = np.argsort(-scores)[:k]
        out = []
        for idx in order:
            r = results[int(idx)]
            r.score = float(scores[int(idx)])
            out.append(r)
        return out


def save_cross_encoder(path: str, ce: CrossEncoder) -> None:
    from codegraph_tpu.models.providers import save_encoder_checkpoint

    save_encoder_checkpoint(path, {"encoder": ce.params, "head": ce.head})


__all__ = ["CrossEncoder", "save_cross_encoder"]
