"""Subword tokenizers (models/bpe.py) + HF encoder import
(models/hf_import.py): BPE training/roundtrip, WordPiece matching, and
numerical parity of imported BERT weights vs transformers.BertModel."""

import dataclasses
import json
import os

import numpy as np
import pytest

from codegraph_tpu.models.bpe import (
    BPETokenizer,
    WordPieceTokenizer,
    load_hf_tokenizer,
    make_tokenizer,
    train_bpe,
)

CORPUS = [
    "def compute_score(query, corpus):\n    return query @ corpus.T\n",
    "def compute_topk(scores, k):\n    return scores.argsort()[-k:]\n",
    "class IndexBuilder:\n    def build(self, vectors):\n        pass\n",
    "for chunk in chunks:\n    embeddings = encoder.encode(chunk)\n",
] * 50


def test_bpe_train_compresses_and_roundtrips():
    tok = train_bpe(CORPUS, n_merges=200, max_len=128)
    text = CORPUS[0]
    ids = tok.ids(text)
    # trained merges must compress below byte-level
    assert len(ids) < len(text.encode())
    assert tok.decode(ids) == text
    # framing + budget accounting
    assert tok.count_tokens(text) == len(ids) + 2
    enc = tok.encode(text)
    assert enc[0] == tok.cls_id and enc[-1] == tok.sep_id


def test_bpe_batch_static_shapes():
    tok = train_bpe(CORPUS, n_merges=100, max_len=64)
    ids, mask = tok.encode_batch(["def f():", "x" * 500], max_len=64)
    assert ids.shape == (2, 64) and mask.shape == (2, 64)
    assert ids.dtype == np.int32
    assert mask[0].sum() < 64 and mask[1].sum() == 64  # truncation


def test_bpe_save_load_identical(tmp_path):
    tok = train_bpe(CORPUS, n_merges=150)
    path = str(tmp_path / "bpe.json")
    tok.save(path)
    tok2 = BPETokenizer.load(path)
    for t in CORPUS[:4]:
        assert tok.ids(t) == tok2.ids(t)
    assert tok2.vocab_size == tok.vocab_size


def test_bpe_no_oov_on_arbitrary_bytes():
    tok = train_bpe(CORPUS, n_merges=50)
    weird = "\x00\xffሴ emoji \U0001f600 mixed"
    ids = tok.ids(weird)
    assert all(0 <= i < tok.vocab_size for i in ids)
    assert tok.decode(ids) == weird


def test_wordpiece_greedy_match():
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
             "un": 4, "##aff": 5, "##able": 6, "affable": 7, "the": 8,
             "##a": 9}
    tok = WordPieceTokenizer(vocab, max_len=32)
    # greedy longest match: "unaffable" -> un ##aff ##able
    assert tok.ids("unaffable") == [4, 5, 6]
    assert tok.ids("affable") == [7]
    assert tok.ids("zzz") == [1]  # unk
    enc = tok.encode("the unaffable")
    assert enc == [2, 8, 4, 5, 6, 3]
    assert tok.count_tokens("the") == 3


def test_make_tokenizer_factory(tmp_path):
    from codegraph_tpu.models.tokenizer import ByteTokenizer

    assert isinstance(make_tokenizer("byte"), ByteTokenizer)
    tok = train_bpe(CORPUS, n_merges=50)
    p = str(tmp_path / "t.json")
    tok.save(p)
    assert isinstance(make_tokenizer(p), BPETokenizer)
    # vocab.txt path
    vp = tmp_path / "vocab.txt"
    vp.write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\nhello\n##world\n")
    wp = make_tokenizer(str(vp))
    assert isinstance(wp, WordPieceTokenizer)
    assert wp.ids("helloworld") == [4, 5]


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("hfbert")
    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    # random-init BERT has IDENTITY LayerNorm affines (gamma=1, beta=0),
    # which masked a real bug: an extra final LayerNorm deviates only on
    # trained weights. Perturb every LN like trained models have.
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "LayerNorm" in name:
                p.add_(0.3 * torch.randn_like(p))
    model.eval()
    model.save_pretrained(str(d))
    # a small vocab.txt so the tokenizer loader works on the same dir
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = [f"w{i}" for i in range(115)]
    (d / "vocab.txt").write_text("\n".join(specials + words) + "\n")
    return d, model, cfg


def test_hf_import_matches_transformers(tiny_bert):
    """Imported BERT weights must reproduce transformers.BertModel's
    mean-pooled hidden states (reference capability: local_provider.rs
    runs the real MiniLM — numerical fidelity is the whole point)."""
    torch = pytest.importorskip("torch")
    d, model, hf_cfg = tiny_bert
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import encode
    from codegraph_tpu.models.hf_import import load_hf_encoder

    params, cfg = load_hf_encoder(str(d))
    assert cfg.norm_style == "post" and cfg.attn_bias
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    B, L = 3, 16
    ids = rng.integers(5, 119, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), bool)
    mask[1, 10:] = False
    mask[2, 5:] = False

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    mf = mask.astype(np.float32)[:, :, None]
    expect = (out * mf).sum(1) / mf.sum(1)

    got = np.asarray(encode(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg, normalize=False,
    ))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_encoder_provider_loads_hf_dir(tiny_bert):
    d, _, _ = tiny_bert
    from codegraph_tpu.models.providers import EncoderProvider

    p = EncoderProvider(checkpoint=str(d))
    assert p.dimension == 32
    assert isinstance(p.tokenizer, WordPieceTokenizer)
    emb = p.embed_texts(["w1 w2 w3", "w4"])
    assert emb.shape == (2, 32)
    # normalized output
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-3)


def test_checkpoint_cfg_metadata_roundtrip(tmp_path):
    import jax

    from codegraph_tpu.models.encoder import EncoderConfig, init_encoder_params
    from codegraph_tpu.models.providers import (
        EncoderProvider,
        save_encoder_checkpoint,
    )

    cfg = EncoderConfig(vocab_size=64, hidden=32, n_layers=2, n_heads=4,
                        max_len=32, norm_style="post", attn_bias=True,
                        act="gelu_exact")
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck.npz")
    save_encoder_checkpoint(path, params, cfg=cfg)
    p = EncoderProvider(checkpoint=path)
    assert p.cfg.norm_style == "post"
    assert p.cfg.attn_bias is True
    assert p.cfg.act == "gelu_exact"
    assert "b_qkv" in p.params["layers"]


def test_bpe_tokenizer_through_encoder_provider(tmp_path):
    from codegraph_tpu.models.providers import EncoderProvider

    tok = train_bpe(CORPUS, n_merges=100, max_len=64)
    p = EncoderProvider(dimension=32, batch_size=4, max_len=64,
                        tokenizer=tok)
    assert p.cfg.vocab_size == tok.vocab_size
    emb = p.embed_texts(["def compute_score(q, c):", "class IndexBuilder:"])
    assert emb.shape == (2, 32)
    assert np.isfinite(emb).all()


def test_ensemble_provider_mixing():
    """Ensemble = concat(sqrt(w)*enc, sqrt(1-w)*hash): unit-norm output,
    cosine equals the weighted score mix of the parts."""
    from codegraph_tpu.models.hash_embedder import hash_embed_texts
    from codegraph_tpu.models.providers import EnsembleProvider

    p = EnsembleProvider(dimension=128, batch_size=8, max_len=64,
                         w_enc=0.3)
    texts = ["def alpha(): pass", "fn beta() {}", "class Gamma:"]
    emb = p.embed_texts(texts)
    assert emb.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # cosine decomposes into the weighted part scores
    enc = p.encoder.embed_texts(texts)
    h = hash_embed_texts(texts, p.hash_dim)

    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)

    want = 0.3 * (norm(enc) @ norm(enc).T) + 0.7 * (norm(h) @ norm(h).T)
    np.testing.assert_allclose(emb @ emb.T, want, atol=1e-5)


def test_default_checkpoint_prefers_bpe(tmp_path):
    from codegraph_tpu.models.providers import EncoderProvider, _default_checkpoint

    ckpt = _default_checkpoint()
    # preference order: r3 BPE-16k model, then the r2 BPE-8k model —
    # both carry tokenizer metadata
    if ckpt is None or ("bpe" not in ckpt and "_r3_" not in ckpt):
        pytest.skip("bpe checkpoint not shipped in this tree")
    p = EncoderProvider(checkpoint=ckpt)
    # the checkpoint metadata names its BPE tokenizer -> auto-loaded
    assert isinstance(p.tokenizer, BPETokenizer)
    emb = p.embed_texts(["def compute(): pass"])
    assert emb.shape[0] == 1 and np.isfinite(emb).all()
