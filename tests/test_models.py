import numpy as np
import pytest

from codegraph_tpu.models.tokenizer import ByteTokenizer, CLS_ID, PAD_ID, SEP_ID
from codegraph_tpu.models.hash_embedder import hash_embed_texts


def test_tokenizer_roundtrip():
    tok = ByteTokenizer(max_len=64)
    text = "def foo(x):\n    return x * 2"
    ids = tok.encode(text)
    assert ids[0] == CLS_ID and ids[-1] == SEP_ID
    assert tok.decode(ids) == text


def test_tokenizer_batch_shapes_and_mask():
    tok = ByteTokenizer(max_len=32)
    ids, mask = tok.encode_batch(["short", "a much longer text " * 10])
    assert ids.shape == (2, 32) and mask.shape == (2, 32)
    assert mask[0].sum() == len("short") + 2
    assert mask[1].all()  # truncated to max_len
    assert (ids[0][~mask[0]] == PAD_ID).all()


def test_hash_embedder_deterministic_and_similar():
    a = hash_embed_texts(["fn compute_sum(a, b)"], 128)
    b = hash_embed_texts(["fn compute_sum(a, b)"], 128)
    np.testing.assert_array_equal(a, b)
    sims = hash_embed_texts(
        ["fn compute_sum(a, b)", "fn compute_sum(x, y)", "class HttpServer"], 128
    )
    near = float(sims[0] @ sims[1])
    far = float(sims[0] @ sims[2])
    assert near > far
    assert np.allclose(np.linalg.norm(sims, axis=1), 1.0, atol=1e-5)


def test_hash_embedder_empty_text():
    e = hash_embed_texts([""], 64)
    assert (e == 0).all()


def test_encoder_forward_and_padding_invariance():
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_encoder_params,
    )
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE

    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=64, n_layers=2,
                        n_heads=4, max_len=32)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(max_len=32)
    ids, mask = tok.encode_batch(["hello world", "hello world padded   "])
    # same text at two padded lengths must embed identically (mask correctness)
    ids2 = ids.copy()
    ids2[0, mask[0].sum():] = 77  # garbage in padding must not matter
    out1 = encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    out2 = encode(params, jnp.asarray(ids2), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-5)
    assert out1.shape == (2, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out1), axis=1), 1.0, atol=1e-3
    )


def test_encoder_pooling_modes():
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_encoder_params,
    )
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE

    tok = ByteTokenizer(max_len=16)
    ids, mask = tok.encode_batch(["abc def"])
    outs = {}
    for pooling in ("mean", "cls", "max"):
        cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=32, n_layers=1,
                            n_heads=2, max_len=16, pooling=pooling)
        params = init_encoder_params(jax.random.PRNGKey(0), cfg)
        outs[pooling] = np.asarray(
            encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
        )
    assert not np.allclose(outs["mean"], outs["cls"])
    assert not np.allclose(outs["mean"], outs["max"])


def test_provider_registry_and_fallback():
    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.core.errors import ProviderUnavailable
    from codegraph_tpu.models.providers import (
        EmbeddingProvider,
        HashProvider,
        HybridEmbeddingPipeline,
        create_provider,
    )

    cfg = CodeGraphConfig()
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 64
    p = create_provider(cfg)
    e = p.embed_texts(["a", "b"])
    assert e.shape == (2, 64)
    assert p.metrics.texts == 2

    class Broken(EmbeddingProvider):
        name = "broken"

        def _embed(self, texts):
            raise RuntimeError("down")

    pipe = HybridEmbeddingPipeline([Broken(64), HashProvider(64)])
    e = pipe.embed_texts(["x"])
    assert e.shape == (1, 64)
    # broken provider is now in cooldown; next call skips straight to hash
    e2 = pipe.embed_texts(["y"])
    assert e2.shape == (1, 64)

    with pytest.raises(ProviderUnavailable):
        HybridEmbeddingPipeline([Broken(64)]).embed_texts(["z"])


def test_encoder_provider_and_checkpoint(tmp_path):
    from codegraph_tpu.models.providers import (
        EncoderProvider,
        load_encoder_checkpoint,
        save_encoder_checkpoint,
    )

    p = EncoderProvider(dimension=32, batch_size=4, max_len=16)
    e = p.embed_texts(["hello", "world", "foo", "bar", "baz"])  # crosses batches
    assert e.shape == (5, 32)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-3)

    ckpt = str(tmp_path / "enc.npz")
    save_encoder_checkpoint(ckpt, p.params)
    p2 = EncoderProvider(dimension=32, batch_size=4, max_len=16, checkpoint=ckpt)
    e2 = p2.embed_texts(["hello"])
    np.testing.assert_allclose(e[0], e2[0], atol=1e-4)


def test_encoder_provider_bucketing():
    from codegraph_tpu.models.providers import EncoderProvider

    p = EncoderProvider(dimension=32, batch_size=4, max_len=256)
    assert p.buckets == [64, 128, 256]
    short = "tiny"
    longer = "x" * 200
    assert p._bucket_for(short) == 64
    assert p._bucket_for(longer) == 256
    e = p.embed_texts([short, longer, short])
    assert e.shape == (3, 32)
    import numpy as np

    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-3)
    # same text embeds identically regardless of which bucket-batch ran it
    e2 = p.embed_texts([short])
    np.testing.assert_allclose(e[0], e2[0], atol=1e-4)


def test_encoder_provider_single_pass_framing_matches_encode_batch():
    """_frame_rows (one tokenize pass on a char-capped prefix) must
    frame IDENTICALLY to the tokenizer's own encode_batch — bucket
    choice and token rows both — for byte and BPE tokenizers, including
    texts far past the largest bucket (the old double-tokenize path ran
    BPE over the whole text just to pick a bucket)."""
    import numpy as np

    from codegraph_tpu.models.bpe import train_bpe
    from codegraph_tpu.models.providers import EncoderProvider

    bpe = train_bpe(["def parse_file(path): return read(path)\n" * 4,
                     "class Server:\n    def start(self): pass\n" * 4],
                    n_merges=64, max_len=256)
    for tok in (None, bpe):  # None -> ByteTokenizer default
        p = EncoderProvider(dimension=32, batch_size=4, max_len=256,
                            tokenizer=tok)
        texts = ["tiny", "def parse_file(p): pass", "x" * 200,
                 "def parse_file(path): return read(path)\n" * 400, ""]
        rows = p._frame_rows(texts)
        for t, (bucket, enc) in zip(texts, rows):
            assert bucket == p._bucket_for(t) or (
                # char-capped prefix may legally pick the max bucket
                # where full-text counting would too
                bucket == p.buckets[-1])
            ids_ref, mask_ref = p.tokenizer.encode_batch([t],
                                                         max_len=bucket)
            n_ref = int(mask_ref[0].sum())
            assert enc == ids_ref[0, :n_ref].tolist()
        # end-to-end: embeddings equal a direct encode_batch reference
        e = p.embed_texts(texts)
        assert e.shape == (5, 32)
        np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0,
                                   atol=1e-3)
        e_again = p.embed_texts(["def parse_file(p): pass"])
        np.testing.assert_allclose(e[1], e_again[0], atol=1e-4)


def test_optimizer_cosine_schedule():
    """schedule="cosine" warms up then decays; updates stay finite and
    the optimizer still applies (a mis-built schedule would throw at
    the first update)."""
    import jax.numpy as jnp
    import optax

    from codegraph_tpu.models.training import TrainConfig, make_optimizer

    tcfg = TrainConfig(learning_rate=1e-3, schedule="cosine",
                       total_steps=100, warmup_steps=10)
    opt = make_optimizer(tcfg)
    params = {"w": jnp.ones((4,), jnp.float32)}
    state = opt.init(params)
    for _ in range(3):
        grads = {"w": jnp.full((4,), 0.5, jnp.float32)}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert bool(jnp.isfinite(params["w"]).all())
    # const fallback unchanged
    opt2 = make_optimizer(TrainConfig(learning_rate=1e-3))
    assert opt2.init(params) is not None


def test_train_state_checkpoint_roundtrip(tmp_path):
    import jax

    from codegraph_tpu.models.encoder import EncoderConfig, init_encoder_params
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE
    from codegraph_tpu.models.training import (
        TrainConfig,
        make_optimizer,
        restore_train_state,
        save_train_state,
    )

    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=32, n_layers=1,
                        n_heads=2, max_len=16)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(TrainConfig())
    opt_state = opt.init(params)
    path = str(tmp_path / "ckpt")
    save_train_state(path, params, opt_state, step=7)
    p2, o2, step = restore_train_state(
        path, {"params": params, "opt_state": opt_state, "step": 0}
    )
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(params["tok_emb"]), np.asarray(p2["tok_emb"])
    )


def test_encoder_remat_matches_and_trains():
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_encoder_params,
    )
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE

    base = dict(vocab_size=VOCAB_SIZE, hidden=32, n_layers=2, n_heads=2,
                max_len=16, dtype=jnp.float32)
    cfg = EncoderConfig(**base)
    cfg_r = EncoderConfig(**base, remat=True)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer(max_len=16)
    ids, mask = tok.encode_batch(["remat test"])
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    out = np.asarray(encode(params, ids, mask, cfg))
    out_r = np.asarray(encode(params, ids, mask, cfg_r))
    np.testing.assert_allclose(out, out_r, atol=1e-6)
    # gradients flow through the checkpointed scan
    def loss(p):
        return jnp.sum(encode(p, ids, mask, cfg_r))
    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["tok_emb"]).sum())


def test_cross_encoder_scores_and_rerank(tmp_path):
    from codegraph_tpu.models.cross_encoder import (
        CrossEncoder,
        save_cross_encoder,
    )

    ce = CrossEncoder(hidden=32, n_layers=1, max_len=64)
    scores = ce.score_pairs("parse the file", ["def parse_file(p)",
                                               "class HttpServer",
                                               "def render_page(c)"])
    assert scores.shape == (3,)
    assert np.isfinite(scores).all()
    # deterministic
    scores2 = ce.score_pairs("parse the file", ["def parse_file(p)",
                                                "class HttpServer",
                                                "def render_page(c)"])
    np.testing.assert_allclose(scores, scores2, atol=1e-5)

    # batched rerank over SearchResult-likes
    from codegraph_tpu.core.types import SearchResult

    results = [SearchResult(node_id=str(i), chunk_id="", score=0.5,
                            name=f"fn{i}", snippet=f"body {i}")
               for i in range(5)]
    out = ce.rerank_batch("query", results, k=3)
    assert len(out) == 3
    assert out[0].score >= out[1].score >= out[2].score

    # checkpoint roundtrip
    path = str(tmp_path / "ce.npz")
    save_cross_encoder(path, ce)
    ce2 = CrossEncoder(hidden=32, n_layers=1, max_len=64, checkpoint=path)
    scores3 = ce2.score_pairs("parse the file", ["def parse_file(p)"])
    np.testing.assert_allclose(scores[:1], scores3, atol=1e-4)


def test_cross_encoder_checkpoint_restores_arch_variants(tmp_path):
    """A checkpoint trained with non-default architecture knobs
    (norm style, activation, mlp_ratio) must reload onto the SAME
    graph — scores must match exactly, not run through the defaults."""
    import jax

    from codegraph_tpu.models.cross_encoder import (
        CrossEncoder,
        save_cross_encoder,
    )
    from codegraph_tpu.models.encoder import (
        EncoderConfig,
        init_encoder_params,
    )

    ce = CrossEncoder(hidden=32, n_layers=2, max_len=64)
    ce.cfg = EncoderConfig(
        vocab_size=ce.cfg.vocab_size, hidden=32, n_layers=2, n_heads=4,
        max_len=64, pooling="cls", norm_style="post", act="gelu_exact",
        mlp_ratio=2, eps=1e-5,
    )
    ce.params = init_encoder_params(jax.random.PRNGKey(1), ce.cfg)
    docs = ["def parse_file(p)", "class HttpServer"]
    before = ce.score_pairs("parse the file", docs)

    path = str(tmp_path / "ce_variant.npz")
    save_cross_encoder(path, ce)
    ce2 = CrossEncoder(checkpoint=path)  # ctor defaults must not leak in
    assert ce2.cfg.norm_style == "post"
    assert ce2.cfg.act == "gelu_exact"
    assert ce2.cfg.mlp_ratio == 2
    assert ce2.cfg.eps == 1e-5
    after = ce2.score_pairs("parse the file", docs)
    np.testing.assert_allclose(before, after, atol=1e-4)


def test_cross_encoder_training_learns(tmp_path):
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.cross_encoder import CrossEncoder
    from codegraph_tpu.models.training import (
        TrainConfig,
        make_cross_encoder_train_step,
    )

    import numpy as np

    ce = CrossEncoder(hidden=32, n_layers=1, max_len=48)
    # synthetic relevance: (query, matching doc) = 1, mismatched = 0;
    # pairs use the model's own [CLS] q [SEP] doc [SEP] framing
    ids_parts, mask_parts, labels = [], [], []
    verbs = ["parse", "render", "cache", "merge"]
    for v in verbs:
        i, m = ce._encode_pairs(f"{v} the data",
                                [f"def {w}_data(x)" for w in verbs])
        ids_parts.append(i)
        mask_parts.append(m)
        labels.extend(1 if v == w else 0 for w in verbs)
    ids = np.concatenate(ids_parts)
    mask = np.concatenate(mask_parts)
    batch = {"pair_ids": jnp.asarray(ids), "pair_mask": jnp.asarray(mask),
             "labels": jnp.asarray(labels)}

    step, opt = make_cross_encoder_train_step(
        ce.cfg, TrainConfig(learning_rate=3e-3)
    )
    state = ((ce.params, ce.head), opt.init((ce.params, ce.head)))
    accs = []
    for _ in range(80):
        state, metrics = step(state, batch)
        accs.append(float(metrics["accuracy"]))
    assert accs[-1] >= 0.9  # memorizes the toy relevance rule
    assert accs[-1] > accs[0]
    (ce.params, ce.head), _ = state
    s_match = ce.score_pairs("parse the data", ["def parse_data(x)"])[0]
    s_mismatch = ce.score_pairs("parse the data", ["def cache_data(x)"])[0]
    assert s_match > s_mismatch


def test_cross_encoder_listwise_objective():
    """group_size>0 trains LISTWISE: accuracy is group-argmax (chance
    1/G), so the (G-1)/G all-negative shortcut that the pointwise BCE
    objective rewards cannot score well here (the round-3 shipped
    reranker failed exactly that way)."""
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.models.cross_encoder import CrossEncoder
    from codegraph_tpu.models.training import (
        TrainConfig,
        cross_encoder_loss,
        make_cross_encoder_train_step,
    )

    ce = CrossEncoder(hidden=32, n_layers=1, max_len=48)
    verbs = ["parse", "render", "cache", "merge"]
    ids_parts, mask_parts, labels = [], [], []
    for gi, v in enumerate(verbs):
        # positive at position gi (groups need not be positive-first;
        # a constant scorer must not win ties via argmax position 0)
        negs = [w for w in verbs if w != v]
        docs = [f"def {w}_data(x)" for w in negs]
        docs.insert(gi, f"def {v}_data(x)")
        i, m = ce._encode_pairs(f"{v} the data", docs)
        ids_parts.append(i)
        mask_parts.append(m)
        lab = [0, 0, 0, 0]
        lab[gi] = 1
        labels.extend(lab)
    batch = {
        "pair_ids": jnp.asarray(np.concatenate(ids_parts)),
        "pair_mask": jnp.asarray(np.concatenate(mask_parts)),
        "labels": jnp.asarray(labels),
    }

    # an all-negative scorer: BCE "accuracy" rewards it at (G-1)/G,
    # the listwise objective scores it at chance
    zero_head = {"w": jnp.zeros_like(ce.head["w"]),
                 "b": jnp.asarray(-10.0)}
    _, m_bce = cross_encoder_loss(ce.params, zero_head, batch, ce.cfg)
    assert float(m_bce["accuracy"]) == 0.75  # the shortcut BCE rewards
    _, m_list = cross_encoder_loss(ce.params, zero_head, batch, ce.cfg,
                                   group_size=4)
    # constant scores: argmax ties to position 0; only the one group
    # whose positive sits there gets credit (chance-level, not 0.75)
    assert float(m_list["accuracy"]) == 0.25

    step, opt = make_cross_encoder_train_step(
        ce.cfg, TrainConfig(learning_rate=3e-3), group_size=4)
    state = ((ce.params, ce.head), opt.init((ce.params, ce.head)))
    for _ in range(80):
        state, metrics = step(state, batch)
    assert float(metrics["accuracy"]) == 1.0  # every group ranked right
    (ce.params, ce.head), _ = state
    s = ce.score_pairs("render the data",
                       [f"def {w}_data(x)" for w in verbs])
    assert int(np.argmax(s)) == 1  # render wins its candidate list


def test_encoder_provider_infers_config_from_checkpoint(tmp_path):
    import jax

    from codegraph_tpu.models.encoder import EncoderConfig, init_encoder_params
    from codegraph_tpu.models.providers import (
        EncoderProvider,
        save_encoder_checkpoint,
    )
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE

    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=48, n_layers=3,
                        n_heads=4, mlp_ratio=2, max_len=96)
    params = init_encoder_params(jax.random.PRNGKey(3), cfg)
    ckpt = str(tmp_path / "custom.npz")
    save_encoder_checkpoint(ckpt, params)
    # requested dimension is overridden by the checkpoint architecture
    p = EncoderProvider(dimension=999, batch_size=4, checkpoint=ckpt)
    assert p.dimension == 48
    assert p.cfg.n_layers == 3 and p.cfg.mlp_ratio == 2 and p.cfg.max_len == 96
    e = p.embed_texts(["infer me"])
    assert e.shape == (1, 48)


def test_seed_checkpoint_loads_if_present():
    import os

    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.models.providers import _default_checkpoint, create_provider

    ckpt = _default_checkpoint()
    if ckpt is None:
        pytest.skip("seed checkpoint not shipped in this tree")
    cfg = CodeGraphConfig()
    cfg.embedding.provider = "encoder"
    p = create_provider(cfg)
    # shipped checkpoint architectures: 256/384 (r1/r2 seeds), 512 (r3)
    assert p.dimension in (256, 384, 512)
    e = p.embed_texts(["def parse_file(path): ..."])
    assert e.shape == (1, p.dimension)


def test_embed_texts_device_matches_host_path():
    """The device-resident ingest path (embed_texts_device) must produce
    the same embeddings as the host path, across buckets and partial
    batches, and must return a jax array (no host round-trip)."""
    import jax

    from codegraph_tpu.models.providers import EncoderProvider, HashProvider

    p = EncoderProvider(dimension=32, batch_size=4, max_len=64)
    # mixed lengths to hit two buckets + a partial final batch
    texts = (["short"] * 3
             + ["long " * 30] * 5
             + ["mid " * 8] * 2)
    host = p.embed_texts(texts)
    dev = p.embed_texts_device(texts)
    assert isinstance(dev, jax.Array)
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5, atol=1e-5)

    # base-class wrapper: HashProvider device path == host path
    h = HashProvider(dimension=16)
    hd = h.embed_texts_device(["a", "b"])
    assert isinstance(hd, jax.Array)
    np.testing.assert_allclose(np.asarray(hd), h.embed_texts(["a", "b"]),
                               rtol=1e-6, atol=1e-6)

    # empty input
    assert p.embed_texts_device([]).shape == (0, 32)


def test_ensemble_checkpoint_dimension_self_corrects(tmp_path):
    """A checkpoint whose hidden width >= the requested ensemble
    dimension must not zero out (or go negative on) the lexical half —
    the halves stay balanced and the total self-corrects."""
    from codegraph_tpu.models.providers import (
        EncoderProvider,
        EnsembleProvider,
        save_encoder_checkpoint,
    )

    donor = EncoderProvider(dimension=32, batch_size=4, max_len=16)
    ckpt = str(tmp_path / "enc32.npz")
    save_encoder_checkpoint(ckpt, donor.params)

    p = EnsembleProvider(dimension=32, checkpoint=ckpt, batch_size=4,
                        max_len=16)
    assert p.encoder.dimension == 32
    assert p.hash_dim == 32          # not 0
    assert p.dimension == 64
    e = p.embed_texts(["def foo(): pass", "bar"])
    assert e.shape == (2, 64)
    # both halves carry signal
    assert np.abs(e[:, :32]).max() > 0 and np.abs(e[:, 32:]).max() > 0


def test_cross_encoder_checkpoint_roundtrip_nondefault(tmp_path):
    """A non-default-architecture cross-encoder must round-trip through
    its checkpoint (shapes inferred at load, not ctor defaults)."""
    from codegraph_tpu.models.cross_encoder import (
        CrossEncoder,
        save_cross_encoder,
    )

    ce = CrossEncoder(hidden=64, n_layers=2, max_len=32)
    s1 = ce.score_pairs("find config", ["loads the config", "renders html"])
    path = str(tmp_path / "ce.npz")
    save_cross_encoder(path, ce)
    ce2 = CrossEncoder(checkpoint=path)  # default ctor args differ
    assert ce2.cfg.hidden == 64 and ce2.cfg.n_layers == 2
    s2 = ce2.score_pairs("find config", ["loads the config", "renders html"])
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-5, atol=1e-5)


def test_cross_encoder_checkpoint_carries_bpe_tokenizer(tmp_path):
    """A cross-encoder saved with tokenizer_file metadata must reload
    its BPE tokenizer from the file next to the checkpoint (the framing
    used at train time must survive into serving)."""
    from codegraph_tpu.models.bpe import BPETokenizer, train_bpe
    from codegraph_tpu.models.cross_encoder import (
        CrossEncoder,
        save_cross_encoder,
    )

    tok = train_bpe(["def parse_config(x): return x"] * 4, n_merges=16,
                    max_len=48)
    tok_path = str(tmp_path / "bpe_tiny.json")
    tok.save(tok_path)
    ce = CrossEncoder(hidden=32, n_layers=1, max_len=48, tokenizer=tok)
    # architecture must match the tokenizer's vocab for save/load parity
    from codegraph_tpu.models.encoder import EncoderConfig, init_encoder_params
    import jax

    ce.cfg = EncoderConfig(vocab_size=tok.vocab_size, hidden=32, n_layers=1,
                           n_heads=8, max_len=48, pooling="cls")
    ce.params = init_encoder_params(jax.random.PRNGKey(0), ce.cfg)
    s1 = ce.score_pairs("parse config", ["def parse_config(x)", "html"])
    path = str(tmp_path / "ce_bpe.npz")
    save_cross_encoder(path, ce, tokenizer_file=tok_path)
    ce2 = CrossEncoder(checkpoint=path)
    assert isinstance(ce2.tokenizer, BPETokenizer)
    assert ce2.tokenizer.vocab_size == tok.vocab_size
    s2 = ce2.score_pairs("parse config", ["def parse_config(x)", "html"])
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-5, atol=1e-5)


def test_default_config_resolves_to_trained_ensemble():
    """VERDICT r3 item 2: a fresh default-config create_provider() must
    resolve to the TRAINED quality path (ensemble: r3 encoder checkpoint
    + its BPE tokenizer from the checkpoint meta + lexical hash half),
    not the hash baseline — matching the reference's out-of-the-box
    model auto-selection (embedding.rs:160,366; local_provider.rs:53)."""
    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.models.providers import (
        EnsembleProvider,
        HybridEmbeddingPipeline,
        _default_checkpoint,
        create_provider,
    )

    if _default_checkpoint() is None:
        pytest.skip("no checkpoint shipped in this tree")
    p = create_provider(CodeGraphConfig())
    primary = p.providers[0] if isinstance(p, HybridEmbeddingPipeline) else p
    assert isinstance(primary, EnsembleProvider)
    # r3 checkpoint is 512-wide -> ensemble = 512 encoder + 256 hash
    assert primary.encoder.dimension == 512
    assert primary.dimension == 768
    # the checkpoint meta names its training tokenizer (BPE-16k), which
    # must override the "byte" config default
    assert primary.tokenizer is not None
    assert getattr(primary.tokenizer, "vocab_size", 0) > 256
    e = primary.embed_texts(["fn parse(x: &str) -> Ast"])
    assert e.shape == (1, 768)


def test_default_provider_falls_back_to_hash_without_checkpoint(monkeypatch):
    """A stripped install (no checkpoints/) must degrade to hash via the
    fallback chain instead of serving a random-weight encoder."""
    import codegraph_tpu.models.providers as providers_mod
    from codegraph_tpu.core.config import CodeGraphConfig

    monkeypatch.setattr(providers_mod, "_default_checkpoint", lambda: None)
    p = providers_mod.create_provider(CodeGraphConfig())
    assert p.name == "hash"
    e = p.embed_texts(["a"])
    assert e.shape[0] == 1
