"""On-chip cross-encoder: joint (query, document) relevance scoring.

Reference: crates/codegraph-vector/src/reranker.rs:170 CrossEncoderReRanker
(stage 2 of the rerank pipeline scores each (query, doc) pair with a
model rather than comparing embeddings). TPU re-design: reuse the
transformer encoder over the concatenated pair `[CLS] query [SEP] doc
[SEP]` with a scalar scoring head on the CLS position; all candidate
pairs for a query score as ONE batch (B = n_candidates), so the rerank
is a single device dispatch.

Measured retrieval lift (round 4, .bench/rerank_eval_r3.json, 512
cross-repo Rust doc->code pairs): the trained r3 checkpoint does NOT
transfer — retrieval-only recall@1 0.738 vs 0.227 pure cross-encoder
rerank and 0.723 blended; train-time pair-accuracy (0.90 on held-out
training pairs) did not predict cross-domain rerank quality. The
cross-encoder therefore stays OPT-IN (SearchConfig.rerank defaults to
False, reranker to "embedding"); do not default it into serving until
a rerank_eval block shows recall@1 at or above retrieval-only.
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
        tokenizer=None,
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
        self.tokenizer = tokenizer or ByteTokenizer(max_len=max_len)
        self._encode = encode_jit
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        if checkpoint and os.path.exists(checkpoint):
            from codegraph_tpu.models.providers import (
                load_encoder_checkpoint_ex,
            )

            blob, meta = load_encoder_checkpoint_ex(checkpoint)
            self.params = blob["encoder"]
            self.head = blob["head"]
            # the checkpoint's array shapes dictate the architecture —
            # ctor defaults must not be trusted (a 384-wide checkpoint
            # under a 256-wide cfg reshape-crashes at first score)
            tok_emb = self.params["tok_emb"]
            hidden = int(tok_emb.shape[1])
            n_layers = int(self.params["layers"]["wqkv"].shape[0])
            max_len = int(self.params["pos_emb"].shape[0])
            n_heads = int((meta or {}).get("n_heads") or next(
                h for h in (8, 4, 2, 1) if hidden % h == 0))
            # architecture VARIANTS (norm style, activation, attention
            # biases, eps) also come from the checkpoint meta — the
            # shipped checkpoint happens to match EncoderConfig
            # defaults, but e.g. a post-LN HF-derived cross-encoder
            # would silently run through the wrong graph otherwise
            extra = {k: meta[k] for k in
                     ("norm_style", "attn_bias", "act", "eps")
                     if meta and k in meta}
            if "b_qkv" in self.params["layers"]:
                extra.setdefault("attn_bias", True)
            self.cfg = EncoderConfig(
                vocab_size=int(tok_emb.shape[0]), hidden=hidden,
                n_layers=n_layers, n_heads=n_heads, max_len=max_len,
                mlp_ratio=int(self.params["layers"]["w_up"].shape[2]
                              // hidden),
                pooling="cls", **extra,
            )
            if tokenizer is None and meta and meta.get("tokenizer"):
                # the checkpoint names its training tokenizer; resolve
                # next to the checkpoint file (as EncoderProvider does)
                from codegraph_tpu.models.bpe import make_tokenizer

                tok_path = os.path.join(os.path.dirname(checkpoint),
                                        meta["tokenizer"])
                if os.path.exists(tok_path):
                    self.tokenizer = make_tokenizer(tok_path,
                                                    max_len=max_len)
                else:
                    self.tokenizer = ByteTokenizer(max_len=max_len)
            elif tokenizer is None:
                self.tokenizer = ByteTokenizer(max_len=max_len)
        else:
            self.params = init_encoder_params(k1, self.cfg)
            self.head = {
                "w": (jax.random.normal(k2, (hidden,), jnp.float32)
                      / jnp.sqrt(hidden)),
                "b": jnp.zeros((), jnp.float32),
            }

    # query token budget inside the joint pair; the trainer
    # (benchmarks/train_cross_encoder_r3.py --q-len) must match
    Q_LEN = 64

    def _raw_ids(self, text: str):
        ids_fn = getattr(self.tokenizer, "ids", None)
        if ids_fn is not None:  # BPE: unframed subword ids
            return list(ids_fn(text))
        return list(text.encode("utf-8", errors="replace"))

    def _encode_pairs(self, query: str, docs: Sequence[str]):
        """[CLS] query[:Q_LEN] [SEP] doc [SEP] at the token-id level —
        the same framing the trainer uses (a \\x1e text separator would
        re-tokenize across the boundary and shift every doc token)."""
        tok = self.tokenizer
        L = self.cfg.max_len
        q = self._raw_ids(query)[: min(self.Q_LEN, max(L - 3, 1))]
        n = len(docs)
        ids = np.full((n, L), tok.pad_id, np.int32)
        mask = np.zeros((n, L), np.bool_)
        for r, d in enumerate(docs):
            body = self._raw_ids(d)[: max(L - len(q) - 3, 0)]
            seq = [tok.cls_id, *q, tok.sep_id, *body, tok.sep_id]
            ids[r, : len(seq)] = seq
            mask[r, : len(seq)] = True
        return ids, mask

    def score_pairs(self, query: str, docs: Sequence[str]) -> np.ndarray:
        """-> [n_docs] f32 relevance scores (one device dispatch)."""
        import jax.numpy as jnp

        if not docs:
            return np.zeros((0,), np.float32)
        ids, mask = self._encode_pairs(query, docs)
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

    # retrieval-score weight in the blended rerank; mirrors the lexical
    # stage's 0.7/0.3 convention (search/reranker.py CrossScorerReranker)
    BLEND_RETRIEVAL = 0.7

    def rerank_batch(self, query: str, results: List, k: int) -> List:
        """Batched rerank over SearchResult-like items (uses .snippet/.name).

        The final order BLENDS the incoming retrieval score with the
        cross-encoder score (both min-max normalized within the
        candidate list) instead of replacing it: the bi-encoder score
        carries real evidence the joint scorer should refine, not
        discard — and a misbehaving scorer can then only perturb the
        ranking, not erase it (the round-3 BCE-trained checkpoint
        scored noise cross-domain; replacement dropped recall@1 from
        0.738 to 0.053 on the cross-repo eval)."""
        if not results:
            return results
        ce = self.score_pairs(
            query, [f"{r.name} {r.snippet}" for r in results]
        ).astype(np.float64)
        base = np.array([float(r.score) for r in results], np.float64)

        def _norm(v):
            span = v.max() - v.min()
            return (v - v.min()) / span if span > 0 else np.zeros_like(v)

        a = self.BLEND_RETRIEVAL
        blended = a * _norm(base) + (1.0 - a) * _norm(ce)
        order = np.argsort(-blended)[:k]
        out = []
        for idx in order:
            r = results[int(idx)]
            r.score = float(blended[int(idx)])
            out.append(r)
        return out


def save_cross_encoder(path: str, ce: CrossEncoder,
                       tokenizer_file: Optional[str] = None) -> None:
    from codegraph_tpu.models.providers import save_encoder_checkpoint

    save_encoder_checkpoint(path, {"encoder": ce.params, "head": ce.head},
                            cfg=ce.cfg, tokenizer_file=tokenizer_file)


def default_cross_encoder_checkpoint() -> Optional[str]:
    """The shipped cross-encoder reranker checkpoint, if present
    (trained by benchmarks/train_cross_encoder_r3.py). Mirrors
    providers._default_checkpoint for the bi-encoder: the reference
    ships a usable cross-encoder default the same way
    (reranker.rs:170)."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for name in ("cross_encoder_r3.npz",):
        path = os.path.join(here, "checkpoints", name)
        if os.path.exists(path):
            return path
    return None


__all__ = ["CrossEncoder", "save_cross_encoder",
           "default_cross_encoder_checkpoint"]
