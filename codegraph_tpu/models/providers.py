"""Embedding provider registry + fallback pipeline (host side).

Capability parity with the reference's provider zoo
(crates/codegraph-vector/src/providers.rs:61-283 `EmbeddingProvider` trait,
`HybridEmbeddingPipeline` fallback strategy :120, `ProviderHealthChecker`
:258; embedding.rs:160,366 auto-selection; openai/jina/ollama/lmstudio
provider files). The default compute path is the on-chip encoder
(EncoderProvider) instead of HTTP round-trips; HTTP providers remain for
parity and external models.
"""

from __future__ import annotations

import json
import logging
import os
import time
import urllib.error
import urllib.request
from typing import Dict, List, Optional, Sequence

import numpy as np

from codegraph_tpu.core.config import CodeGraphConfig, EmbeddingConfig
from codegraph_tpu.core.errors import ProviderUnavailable
from codegraph_tpu.models.hash_embedder import hash_embed_texts
from codegraph_tpu.models.tokenizer import ByteTokenizer

logger = logging.getLogger("codegraph_tpu.providers")


class EmbeddingMetrics:
    """texts/s + failure accounting (reference: providers.rs:7-40)."""

    def __init__(self) -> None:
        self.texts = 0
        self.seconds = 0.0
        self.failures = 0

    def record(self, n_texts: int, seconds: float) -> None:
        self.texts += n_texts
        self.seconds += seconds

    @property
    def texts_per_second(self) -> float:
        return self.texts / self.seconds if self.seconds > 0 else 0.0


class EmbeddingProvider:
    """Interface: subclasses implement `_embed` and `is_available`."""

    name = "base"

    def __init__(self, dimension: int, batch_size: int = 256):
        self.dimension = int(dimension)
        self.batch_size = int(batch_size)
        self.metrics = EmbeddingMetrics()

    def is_available(self) -> bool:
        return True

    def _embed(self, texts: Sequence[str]) -> np.ndarray:
        raise NotImplementedError

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Batched embed, [N, dimension] f32 (reference: embed_texts_batched,
        embedding.rs:627)."""
        if not texts:
            return np.zeros((0, self.dimension), np.float32)
        out = []
        t0 = time.perf_counter()
        for start in range(0, len(texts), self.batch_size):
            out.append(np.asarray(self._embed(texts[start : start + self.batch_size])))
        result = np.concatenate(out, axis=0).astype(np.float32)
        self.metrics.record(len(texts), time.perf_counter() - t0)
        return result

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]

    def embed_texts_device(self, texts: Sequence[str]):
        """Device-resident embed: returns a jax.Array that never visits
        host memory (the TPU-native answer to the reference's
        zero-copy staging pools, codegraph-zerocopy/src/buffer.rs:26-445).
        Base implementation wraps the host path; EncoderProvider keeps
        the whole encode on-chip."""
        import jax.numpy as jnp

        return jnp.asarray(self.embed_texts(texts))


class HashProvider(EmbeddingProvider):
    """Deterministic feature-hash embeddings — always available."""

    name = "hash"

    def _embed(self, texts: Sequence[str]) -> np.ndarray:
        return hash_embed_texts(list(texts), self.dimension)


class EncoderProvider(EmbeddingProvider):
    """On-chip transformer encoder (the TPU-native default).

    Replaces Candle/ONNX in-process inference (local_provider.rs:27-661,
    onnx_provider.rs:32-421). Weights load from an .npz checkpoint when
    given; otherwise deterministic random init (useful for perf tests and
    as a fixed random-projection encoder).

    Sequence bucketing: attention is O(L^2) and most code chunks are far
    shorter than max_len, so texts group into power-of-two length buckets
    (64..max_len), each a separately compiled static shape. Short chunks
    run 10-60x cheaper than one max_len-padded batch would.
    """

    name = "encoder"

    def __init__(
        self,
        dimension: int = 384,
        batch_size: int = 256,
        max_len: int = 512,
        checkpoint: Optional[str] = None,
        seed: int = 0,
        bucketing: bool = True,
        tokenizer=None,
    ):
        super().__init__(dimension, batch_size)
        import jax

        from codegraph_tpu.models.encoder import (
            EncoderConfig,
            encode_jit,
            init_encoder_params,
        )
        from codegraph_tpu.models.tokenizer import VOCAB_SIZE

        if checkpoint and os.path.isdir(checkpoint):
            # HF-format model directory (config.json + safetensors/bin):
            # user-supplied BERT/MiniLM weights, run natively with
            # norm_style="post" (models/hf_import.py)
            from codegraph_tpu.models.bpe import load_hf_tokenizer
            from codegraph_tpu.models.hf_import import load_hf_encoder

            self.params, self.cfg = load_hf_encoder(checkpoint)
            self.dimension = self.cfg.hidden
            max_len = self.cfg.max_len
            if tokenizer is None:
                tokenizer = load_hf_tokenizer(checkpoint, max_len=max_len)
        elif checkpoint and os.path.exists(checkpoint):
            # architecture is implied by the checkpoint's array shapes
            # (+ optional __cfg__ metadata for norm/bias/act variants)
            self.params, meta = load_encoder_checkpoint_ex(checkpoint)
            tok_emb = self.params["tok_emb"]
            wqkv = self.params["layers"]["wqkv"]
            w_up = self.params["layers"]["w_up"]
            hidden = int(tok_emb.shape[1])
            dimension = hidden
            max_len = int(self.params["pos_emb"].shape[0])
            n_layers = int(wqkv.shape[0])
            mlp_ratio = int(w_up.shape[2] // hidden)
            n_heads = next(h for h in (12, 8, 6, 4, 2, 1) if hidden % h == 0)
            extra = {k: meta[k] for k in
                     ("norm_style", "attn_bias", "act", "pooling", "eps")
                     if meta and k in meta}
            if tokenizer is None and meta and meta.get("tokenizer"):
                # the checkpoint names its training tokenizer; resolve
                # next to the checkpoint file
                from codegraph_tpu.models.bpe import make_tokenizer

                tok_path = os.path.join(
                    os.path.dirname(os.path.abspath(checkpoint)),
                    meta["tokenizer"],
                )
                if os.path.exists(tok_path):
                    tokenizer = make_tokenizer(tok_path, max_len=max_len)
            if "b_qkv" in self.params["layers"]:
                extra.setdefault("attn_bias", True)
            self.cfg = EncoderConfig(
                vocab_size=int(tok_emb.shape[0]), hidden=hidden,
                n_layers=n_layers, n_heads=int(meta.get("n_heads", n_heads))
                if meta else n_heads, mlp_ratio=mlp_ratio,
                max_len=max_len, **extra,
            )
            self.dimension = dimension
        else:
            n_heads = next(h for h in (12, 8, 6, 4, 2, 1) if dimension % h == 0)
            vocab = tokenizer.vocab_size if tokenizer is not None else VOCAB_SIZE
            self.cfg = EncoderConfig(
                vocab_size=vocab, hidden=dimension, n_heads=n_heads,
                max_len=max_len,
            )
            self.params = init_encoder_params(jax.random.PRNGKey(seed), self.cfg)
        self.tokenizer = tokenizer if tokenizer is not None else \
            ByteTokenizer(max_len=max_len)
        self._encode = encode_jit
        self.buckets = (
            [b for b in (64, 128, 256, 512, 1024, 2048) if b < max_len]
            + [max_len]
            if bucketing else [max_len]
        )

    def _bucket_for(self, text: str) -> int:
        need = self.tokenizer.count_tokens(text)
        for b in self.buckets:
            if need <= b:
                return b
        return self.buckets[-1]

    def _frame_rows(self, texts: Sequence[str]):
        """Tokenize each text ONCE -> [(bucket, framed id list)].

        The previous path tokenized twice per text (count_tokens for
        bucket choice, encode_batch for the arrays) and count_tokens
        ran BPE over the ENTIRE text even though anything past the
        largest bucket is truncated anyway. Tokenizing a char-capped
        prefix once is exact: byte-level BPE/WordPiece tokens cover
        >= 1 char each, so a 32*max_bucket-char prefix cannot
        under-fill the largest bucket unless the whole text fits. It
        also removes _embed's recompile hazard: a bucket group larger
        than batch_size used to reach encode_batch unpadded, compiling
        a fresh kernel for that exact group size."""
        tok = self.tokenizer
        max_b = self.buckets[-1]
        ids_fn = getattr(tok, "ids", None)
        cap = max_b * 32
        rows = []
        for t in texts:
            if ids_fn is not None:
                body = ids_fn(t[:cap])[: max_b - 2]
            else:  # byte tokenizer: bytes ARE the ids
                body = list(t[: cap].encode("utf-8",
                                            errors="replace")[: max_b - 2])
            enc = [tok.cls_id, *body, tok.sep_id]
            need = len(enc)
            bucket = next((b for b in self.buckets if need <= b), max_b)
            rows.append((bucket, enc))
        return rows

    def _embed(self, texts: Sequence[str]) -> np.ndarray:
        import jax.numpy as jnp

        n = len(texts)
        out = np.zeros((n, self.dimension), np.float32)
        # group by length bucket; each bucket pads to batch_size so every
        # (bucket, batch_size) shape compiles exactly once
        rows = self._frame_rows(texts)
        groups: Dict[int, List[int]] = {}
        for idx, (bucket, _) in enumerate(rows):
            groups.setdefault(bucket, []).append(idx)
        pad_id = self.tokenizer.pad_id
        for bucket, idxs in groups.items():
            nb = max(self.batch_size, len(idxs))
            ids = np.full((nb, bucket), pad_id, np.int32)
            mask = np.zeros((nb, bucket), np.bool_)
            for r, i in enumerate(idxs):
                enc = rows[i][1][:bucket]
                ids[r, : len(enc)] = enc
                mask[r, : len(enc)] = True
            emb = self._encode(
                self.params, jnp.asarray(ids), jnp.asarray(mask), self.cfg
            )
            out[idxs] = np.asarray(emb)[: len(idxs)]
        return out

    def embed_texts_device(self, texts: Sequence[str]):
        """On-chip encode with NO host round-trip of the embeddings.

        Dispatches every bucketed encode asynchronously and scatters the
        results into a device output array — while the device runs batch
        i, the host tokenizes batch i+1 (jax async dispatch IS the
        double-buffered feed). Feeding a device-resident index build
        (IVFIndex.add and friends accept jax arrays) this removes the
        ingest transfers measured at ~200 s per 512k x 768 chunk over
        the dev tunnel in round 1."""
        import jax.numpy as jnp

        if not texts:
            return jnp.zeros((0, self.dimension), jnp.float32)
        rows = self._frame_rows(texts)
        groups: Dict[int, List[int]] = {}
        for idx, (bucket, _) in enumerate(rows):
            groups.setdefault(bucket, []).append(idx)
        pad_id = self.tokenizer.pad_id
        out = jnp.zeros((len(texts), self.dimension), jnp.float32)
        for bucket, idxs in groups.items():
            for start in range(0, len(idxs), self.batch_size):
                sel = idxs[start:start + self.batch_size]
                ids = np.full((self.batch_size, bucket), pad_id, np.int32)
                mask = np.zeros((self.batch_size, bucket), np.bool_)
                for r, i in enumerate(sel):
                    enc = rows[i][1][:bucket]
                    ids[r, : len(enc)] = enc
                    mask[r, : len(enc)] = True
                emb = self._encode(
                    self.params, jnp.asarray(ids), jnp.asarray(mask),
                    self.cfg,
                )
                out = out.at[jnp.asarray(np.asarray(sel, np.int32))].set(
                    emb[: len(sel)].astype(jnp.float32))
        return out


def save_encoder_checkpoint(path: str, params, cfg=None,
                            tokenizer_file: Optional[str] = None) -> None:
    """Save params (+ optional EncoderConfig variant metadata and the
    tokenizer file the model was trained with) as .npz. tokenizer_file
    is stored as a basename resolved next to the checkpoint at load."""
    import jax

    flat = {
        "/".join(str(k) for k in key_path): np.asarray(leaf)
        for key_path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    if cfg is not None or tokenizer_file:
        meta = {}
        if cfg is not None:
            meta = {"norm_style": cfg.norm_style, "attn_bias": cfg.attn_bias,
                    "act": cfg.act, "pooling": cfg.pooling, "eps": cfg.eps,
                    "n_heads": cfg.n_heads}
        if tokenizer_file:
            meta["tokenizer"] = os.path.basename(tokenizer_file)
        flat["__cfg__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez(path, **flat)


def load_encoder_checkpoint_ex(path: str):
    """-> (params, meta dict | None). meta carries EncoderConfig variant
    fields (norm_style/attn_bias/act/pooling/eps/n_heads) when the
    checkpoint was saved with a cfg."""
    data = np.load(path)
    params: Dict = {}
    meta = None
    for flat_key in data.files:
        if flat_key == "__cfg__":
            meta = json.loads(bytes(data[flat_key]).decode())
            continue
        parts = [p.strip(".[]'\"") for p in flat_key.split("/")]
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[flat_key]
    return params, meta


def load_encoder_checkpoint(path: str):
    return load_encoder_checkpoint_ex(path)[0]


class _HTTPProvider(EmbeddingProvider):
    """Shared REST plumbing with retry/backoff (reference:
    lmstudio_embedding_provider.rs retry/backoff)."""

    url = ""
    api_key_env = ""
    model = ""
    timeout_s = 30.0
    max_retries = 2

    def is_available(self) -> bool:
        if self.api_key_env and not os.environ.get(self.api_key_env):
            return False
        return bool(self.url)

    def _request_body(self, texts: Sequence[str]) -> dict:
        raise NotImplementedError

    def _parse(self, payload: dict) -> np.ndarray:
        raise NotImplementedError

    def _embed(self, texts: Sequence[str]) -> np.ndarray:
        body = json.dumps(self._request_body(texts)).encode()
        headers = {"Content-Type": "application/json"}
        key = os.environ.get(self.api_key_env, "") if self.api_key_env else ""
        if key:
            headers["Authorization"] = f"Bearer {key}"
        last: Optional[Exception] = None
        for attempt in range(self.max_retries + 1):
            try:
                req = urllib.request.Request(self.url, data=body, headers=headers)
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return self._parse(json.loads(resp.read()))
            except (urllib.error.URLError, OSError, ValueError) as exc:
                last = exc
                time.sleep(min(2.0**attempt * 0.5, 8.0))
        self.metrics.failures += 1
        raise ProviderUnavailable(f"{self.name}: {last}")


def _check_dim(provider: str, model: str, out: np.ndarray, want: int):
    """Fail with an actionable message instead of a downstream index
    shape crash when the API's width differs from the configured one."""
    if out.ndim == 2 and out.shape[1] != want:
        raise ValueError(
            f"{provider} model {model!r} returned {out.shape[1]}-dim "
            f"embeddings but embedding.dimension={want}; set "
            f"CODEGRAPH_EMBEDDING_DIMENSION={out.shape[1]} (or pick a "
            "model/dimensions combination that matches)"
        )


class OpenAIProvider(_HTTPProvider):
    """OpenAI REST batch embeddings (reference: openai_provider.rs)."""

    name = "openai"
    api_key_env = "OPENAI_API_KEY"

    def __init__(self, dimension: int = 1536, batch_size: int = 256,
                 model: str = "text-embedding-3-small", base_url: str = ""):
        super().__init__(dimension, batch_size)
        self.model = model
        base = base_url or os.environ.get("OPENAI_BASE_URL", "https://api.openai.com/v1")
        self.url = base.rstrip("/") + "/embeddings"

    def _request_body(self, texts):
        # v3 models honor the dimensions param (matryoshka truncation),
        # so the API returns the configured width instead of the model
        # native 1536/3072 — without it a 384-dim config built a 384-dim
        # index and crashed on the first 1536-wide response
        return {"model": self.model, "input": list(texts),
                "dimensions": self.dimension}

    def _parse(self, payload):
        rows = sorted(payload["data"], key=lambda r: r["index"])
        out = np.asarray([r["embedding"] for r in rows], np.float32)
        _check_dim(self.name, self.model, out, self.dimension)
        return out


class JinaProvider(_HTTPProvider):
    """Jina cloud embeddings with batch clamping (reference:
    jina_provider.rs:432-444)."""

    name = "jina"
    api_key_env = "JINA_API_KEY"
    MAX_BATCH = 2048  # hard clamp (jina_provider.rs MAX_NODE_TEXTS_HARD_LIMIT)

    def __init__(self, dimension: int = 1024, batch_size: int = 512,
                 model: str = "jina-embeddings-v3", base_url: str = ""):
        super().__init__(dimension, min(batch_size, self.MAX_BATCH))
        self.model = model
        self.url = (base_url or "https://api.jina.ai/v1").rstrip("/") + "/embeddings"

    def _request_body(self, texts):
        # jina-embeddings-v3 supports matryoshka dimensions as well
        return {"model": self.model, "input": list(texts),
                "dimensions": self.dimension}

    def _parse(self, payload):
        rows = sorted(payload["data"], key=lambda r: r["index"])
        out = np.asarray([r["embedding"] for r in rows], np.float32)
        _check_dim(self.name, self.model, out, self.dimension)
        return out


class OllamaProvider(_HTTPProvider):
    """Local Ollama HTTP embeddings (reference: ollama_embedding_provider.rs)."""

    name = "ollama"

    def __init__(self, dimension: int = 768, batch_size: int = 64,
                 model: str = "nomic-embed-text", base_url: str = ""):
        super().__init__(dimension, batch_size)
        self.model = model
        base = base_url or os.environ.get("OLLAMA_HOST", "http://localhost:11434")
        self.url = base.rstrip("/") + "/api/embed"

    def is_available(self) -> bool:
        try:
            urllib.request.urlopen(self.url.replace("/api/embed", "/api/tags"), timeout=2)
            return True
        except Exception:
            return False

    def _request_body(self, texts):
        return {"model": self.model, "input": list(texts)}

    def _parse(self, payload):
        return np.asarray(payload["embeddings"], np.float32)


class LMStudioProvider(_HTTPProvider):
    """LM Studio OpenAI-compatible endpoint (reference:
    lmstudio_embedding_provider.rs)."""

    name = "lmstudio"

    def __init__(self, dimension: int = 768, batch_size: int = 64,
                 model: str = "", base_url: str = ""):
        super().__init__(dimension, batch_size)
        self.model = model
        base = base_url or os.environ.get("LMSTUDIO_HOST", "http://localhost:1234")
        self.url = base.rstrip("/") + "/v1/embeddings"

    def is_available(self) -> bool:
        try:
            urllib.request.urlopen(self.url.replace("/embeddings", "/models"), timeout=2)
            return True
        except Exception:
            return False

    def _request_body(self, texts):
        return {"model": self.model, "input": list(texts)}

    def _parse(self, payload):
        rows = sorted(payload["data"], key=lambda r: r["index"])
        return np.asarray([r["embedding"] for r in rows], np.float32)


class EnsembleProvider(EmbeddingProvider):
    """Dense + lexical ensemble: concat(sqrt(w)*encoder, sqrt(1-w)*hash).

    Cosine over the concatenation equals w*cos_enc + (1-w)*cos_hash, so
    this is score-level mixing packaged as a single index-able vector.
    Measured cross-repo (reference Rust doc->code, 512 pairs,
    .bench/crossrepo_eval.json, round-3 encoder_r3_512 checkpoint):
    recall@1 0.738 / recall@10 0.979 at w=0.5 vs 0.375/0.773 hash-only
    and 0.660/0.928 encoder-only — the learned-dense and lexical-hash
    signals are complementary, the same reason the reference mixes
    0.9 vector + 0.1 BM25 at the search layer
    (schema/codegraph.surql:470). The weight sweep (w in 0.3..0.9)
    peaks at 0.5 with the round-3 encoder; weaker encoders want less
    mass (round 2's wanted 0.3).
    """

    name = "ensemble"

    def __init__(self, dimension: int = 768, batch_size: int = 256,
                 max_len: int = 512, checkpoint: Optional[str] = None,
                 w_enc: float = 0.5, tokenizer=None):
        self.encoder = EncoderProvider(
            dimension=dimension // 2, batch_size=batch_size,
            max_len=max_len, checkpoint=checkpoint, tokenizer=tokenizer,
        )
        # a checkpoint dictates the encoder's width (EncoderProvider
        # self-corrects from the array shapes), which can leave
        # dimension - enc_dim degenerate (0 would silently drop the
        # lexical half; negative crashes hash_embed_texts) — keep the
        # halves balanced and let the total dimension self-correct, as
        # EncoderProvider itself does
        self.hash_dim = dimension - self.encoder.dimension
        if self.hash_dim < 16:
            self.hash_dim = self.encoder.dimension
        super().__init__(self.encoder.dimension + self.hash_dim, batch_size)
        self.w_enc = float(w_enc)
        self.tokenizer = self.encoder.tokenizer

    def _embed(self, texts: Sequence[str]) -> np.ndarray:
        e = self.encoder.embed_texts(list(texts))
        h = hash_embed_texts(list(texts), self.hash_dim)

        def norm(x):
            return x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-9)

        return np.concatenate(
            [np.sqrt(self.w_enc) * norm(e),
             np.sqrt(1.0 - self.w_enc) * norm(h)], axis=1,
        ).astype(np.float32)


_PROVIDERS = {
    "hash": HashProvider,
    "encoder": EncoderProvider,
    "ensemble": EnsembleProvider,
    "openai": OpenAIProvider,
    "jina": JinaProvider,
    "ollama": OllamaProvider,
    "lmstudio": LMStudioProvider,
}


def _default_checkpoint() -> Optional[str]:
    """The shipped default checkpoint; env/model-path overrides win.

    Preference order = measured cross-repo quality (reference Rust
    doc->code retrieval, .bench/crossrepo_eval.json): the round-3
    6L/512 BPE-16k model (cross-repo recall@1 0.66, held-out 0.953,
    benchmarks/train_encoder_r3.py, TPU-trained on 128k multi-language
    pairs with in-batch hard negatives) over the round-2 BPE-8k 4L/384
    (cross-repo 0.230) over the byte-level round-1 seeds."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for name in ("encoder_r3_512.npz", "encoder_bpe_384.npz",
                 "encoder_seed_384.npz", "encoder_seed.npz"):
        path = os.path.join(here, "checkpoints", name)
        if os.path.exists(path):
            return path
    return None


def make_provider(name: str, ecfg: EmbeddingConfig) -> EmbeddingProvider:
    cls = _PROVIDERS.get(name)
    if cls is None:
        raise ProviderUnavailable(f"unknown provider {name!r}")
    if cls in (EncoderProvider, EnsembleProvider):
        # embedding.model may point at an .npz checkpoint or an HF model
        # directory (config.json + safetensors/bin, hf_import.py);
        # otherwise use the shipped seed checkpoint when present
        from codegraph_tpu.models.hf_import import is_hf_model_dir

        ckpt = None
        if ecfg.model and (ecfg.model.endswith(".npz")
                           or is_hf_model_dir(ecfg.model)):
            ckpt = ecfg.model
        elif ecfg.model in ("", "minilm-l6", "seed"):
            ckpt = _default_checkpoint()
        else:
            # an unrecognized model string must not silently become a
            # random-weight encoder — embedding quality would collapse
            # with nothing in the logs to explain it
            logger.warning(
                "embedding.model=%r is neither an .npz checkpoint nor an "
                "HF model directory; falling back to the shipped seed "
                "checkpoint (set embedding.model to a real path to use "
                "your own weights)", ecfg.model,
            )
            ckpt = _default_checkpoint()
        if ckpt is None:
            # no shipped checkpoint (stripped install): a random-weight
            # encoder would silently serve garbage embeddings — rotate
            # the create_provider fallback chain to hash instead
            raise ProviderUnavailable(
                f"provider {name!r} needs a trained checkpoint and none "
                "is shipped under checkpoints/; set embedding.model")
        tok = None
        tok_spec = getattr(ecfg, "tokenizer", "byte")
        if tok_spec and tok_spec != "byte":
            from codegraph_tpu.models.bpe import make_tokenizer

            tok = make_tokenizer(tok_spec, max_len=ecfg.max_chunk_tokens)
        return cls(
            dimension=ecfg.dimension,
            batch_size=ecfg.batch_size,
            max_len=ecfg.max_chunk_tokens,
            checkpoint=ckpt,
            tokenizer=tok,
        )
    if cls in (OpenAIProvider, JinaProvider, OllamaProvider,
               LMStudioProvider):
        kw = {}
        if ecfg.model and not ecfg.model.endswith(".npz") \
                and ecfg.model not in ("minilm-l6", "seed"):
            kw["model"] = ecfg.model
        if ecfg.base_url:
            kw["base_url"] = ecfg.base_url  # CODEGRAPH_OLLAMA_URL etc.
        return cls(dimension=ecfg.dimension, batch_size=ecfg.batch_size,
                   **kw)
    return cls(dimension=ecfg.dimension, batch_size=ecfg.batch_size)


class HybridEmbeddingPipeline(EmbeddingProvider):
    """Primary provider + ordered fallback chain (reference:
    HybridEmbeddingPipeline, providers.rs:120-256). A provider that raises
    or reports unavailable rotates to the next; health state is remembered
    so dead providers are skipped for `cooldown_s`."""

    name = "hybrid"

    def __init__(self, providers: List[EmbeddingProvider], cooldown_s: float = 60.0):
        if not providers:
            raise ValueError("need at least one provider")
        super().__init__(providers[0].dimension, providers[0].batch_size)
        self.providers = providers
        self.cooldown_s = cooldown_s
        self._dead_until: Dict[str, float] = {}

    def is_available(self) -> bool:
        return any(p.is_available() for p in self.providers)

    def most_reliable(self) -> EmbeddingProvider:
        """Lowest failure count, throughput as tie-break (reference:
        ProviderHealthChecker::select_most_reliable, providers.rs:268)."""
        return min(
            self.providers,
            key=lambda p: (p.metrics.failures, -p.metrics.texts_per_second),
        )

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        now = time.monotonic()
        errors = []
        for p in self.providers:
            if self._dead_until.get(p.name, 0.0) > now:
                continue
            try:
                if not p.is_available():
                    raise ProviderUnavailable(f"{p.name} unavailable")
                return p.embed_texts(texts)
            except Exception as exc:
                logger.warning("provider %s failed: %s", p.name, exc)
                self._dead_until[p.name] = now + self.cooldown_s
                errors.append(f"{p.name}: {exc}")
        raise ProviderUnavailable("all providers failed: " + "; ".join(errors))


def create_provider(cfg: CodeGraphConfig) -> EmbeddingProvider:
    """Auto-select from config + fallbacks (reference: embedding.rs:160-366
    env/config auto-selection)."""
    ecfg = cfg.embedding
    chain = [ecfg.provider] + [f for f in ecfg.fallbacks if f != ecfg.provider]
    providers = []
    for name in chain:
        try:
            providers.append(make_provider(name, ecfg))
        except ProviderUnavailable:
            logger.warning("skipping unknown provider %r", name)
    if not providers:
        providers = [HashProvider(ecfg.dimension, ecfg.batch_size)]
    if len(providers) == 1:
        return providers[0]
    return HybridEmbeddingPipeline(providers)


__all__ = [
    "EmbeddingMetrics",
    "EmbeddingProvider",
    "HashProvider",
    "EncoderProvider",
    "OpenAIProvider",
    "JinaProvider",
    "OllamaProvider",
    "LMStudioProvider",
    "HybridEmbeddingPipeline",
    "create_provider",
    "make_provider",
    "save_encoder_checkpoint",
    "load_encoder_checkpoint",
]
