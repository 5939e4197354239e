import numpy as np
import pytest

from codegraph_tpu.core.config import SearchConfig
from codegraph_tpu.core.types import (
    CodeChunk,
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)
from codegraph_tpu.graph.store import GraphStore
from codegraph_tpu.index.flat import FlatIndex
from codegraph_tpu.models.providers import HashProvider
from codegraph_tpu.search.bm25 import BM25Index, tokenize
from codegraph_tpu.search.hybrid import HybridSearch
from codegraph_tpu.search.reranker import RerankerPipeline


def test_tokenize_splits_identifiers():
    assert tokenize("parse_file_with_edges") == ["parse", "file", "edges"]
    assert tokenize("HttpServerConfig") == ["http", "server", "config"]
    assert "the" not in tokenize("the quick brownFox")


def test_bm25_ranks_matching_docs():
    idx = BM25Index()
    idx.add(0, "def parse_file(path): parse a source file")
    idx.add(1, "class HttpServer: handles http requests")
    idx.add(2, "fn compute_embedding(text) -> vector")
    hits = idx.search("parse file")
    assert hits[0][0] == 0
    hits = idx.search("http server")
    assert hits[0][0] == 1
    assert idx.search("zzz nothing") == []


def test_bm25_remove():
    idx = BM25Index()
    idx.add(0, "alpha beta")
    idx.add(1, "alpha gamma")
    idx.remove(0)
    hits = idx.search("alpha")
    assert [h[0] for h in hits] == [1]


DIM = 64


def build_corpus():
    """Three functions; parser_fn and helper_fn linked by a calls edge."""
    store = GraphStore()
    provider = HashProvider(DIM)
    texts = {
        "parse_source_file": "def parse_source_file(path): read and parse the source file into an ast tree",
        "parse_helper": "def parse_helper(tree): helper used by the source file parser for ast walking",
        "render_html_page": "def render_html_page(ctx): render an html template page for the web server",
    }
    nodes = []
    for i, (name, text) in enumerate(texts.items()):
        nodes.append(CodeNode.make(
            "proj", name, NodeType.FUNCTION, Language.PYTHON,
            Location(f"src/{name}.py", i * 10, i * 10 + 5), content=text,
        ))
    store.upsert_nodes(nodes)
    by_name = {n.name: n for n in nodes}
    store.add_edges([
        CodeEdge(by_name["parse_source_file"].id, by_name["parse_helper"].id,
                 EdgeType.CALLS),
    ])
    chunks = [CodeChunk.make(n.id, texts[n.name], 0, 1) for n in nodes]
    rows = store.upsert_chunks(chunks)
    index = FlatIndex(DIM, tile_n=128, backend="xla")
    embs = provider.embed_texts([c.text for c in chunks])
    got = index.add(embs)
    np.testing.assert_array_equal(got, rows)
    bm25 = BM25Index()
    for node in nodes:
        bm25.add(node.row, f"{node.name} {node.content}")
    return store, index, provider, bm25


def test_hybrid_search_end_to_end():
    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25,
                      SearchConfig(graph_boost_weight=0.1))
    results = hs.search_text("parse the source file ast", limit=3)
    assert results
    assert results[0].name == "parse_source_file"
    # helper is graph-adjacent to the top hit -> boosted above html renderer
    names = [r.name for r in results]
    assert names.index("parse_helper") < names.index("render_html_page")
    r0 = results[0]
    assert r0.vector_score > 0 and r0.file_path.endswith("parse_source_file.py")
    d = r0.to_dict()
    assert d["node_id"] == r0.node_id and "score" in d


def test_hybrid_search_cache_hit():
    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    r1 = hs.search_text("parse file", limit=2)
    r2 = hs.search_text("parse file", limit=2)
    assert hs.cache.hits >= 1
    assert [r.node_id for r in r1] == [r.node_id for r in r2]
    hs.invalidate()
    assert hs.cache.stats()["size"] == 0


def test_hybrid_bm25_only_candidates_surface():
    """A node with a weak vector match but exact text match still appears."""
    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25,
                      SearchConfig(text_weight=0.5, vector_weight=0.5))
    results = hs.search_text("render html page", limit=3)
    assert results[0].name == "render_html_page"
    assert results[0].text_score > 0


def test_hybrid_multi_vector_modes():
    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    q = provider.embed_texts(["parse source ast", "helper ast walking"])
    or_res = hs.search_multi(q, limit=3, mode="or_max")
    and_res = hs.search_multi(q, limit=3, mode="and_average")
    assert or_res
    assert len(and_res) <= len(or_res)


def test_reranker_pipeline():
    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    results = hs.search_text("parse source file", limit=3)
    rr = RerankerPipeline(provider)
    out = rr.rerank("parse source file", results)
    assert out
    # both parse functions must outrank the html renderer after rerank
    names = [r.name for r in out]
    assert names[0].startswith("parse")
    if "render_html_page" in names:
        assert names.index("render_html_page") == len(names) - 1


def test_empty_index_search():
    store = GraphStore()
    hs = HybridSearch(store, FlatIndex(DIM, backend="xla"), HashProvider(DIM))
    assert hs.search_text("anything") == []


def test_search_chunks_parity():
    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    chunks = hs.search_chunks("parse the source file", limit=3)
    assert chunks
    assert chunks[0]["parent_name"] == "parse_source_file"
    assert chunks[0]["chunk_id"] and chunks[0]["text"]


def test_bm25_native_path_matches_python(rng):
    """Above the native threshold the cghost scorer must agree with the
    pure-Python loop."""
    from codegraph_tpu import native as native_mod
    if not native_mod.available():
        pytest.skip("libcghost not built")

    idx = BM25Index()
    vocab = ["parse", "file", "http", "server", "token", "graph", "cache",
             "merge", "route", "index"]
    for d in range(2500):
        words = [vocab[(d + j) % len(vocab)] for j in range(1 + d % 5)]
        idx.add(d, " ".join(words))
    assert idx.n_docs >= idx.NATIVE_THRESHOLD
    got = idx.search("parse file server", limit=20)
    # force the python path for comparison
    thr = BM25Index.NATIVE_THRESHOLD
    BM25Index.NATIVE_THRESHOLD = 10**9
    try:
        ref = idx.search("parse file server", limit=20)
    finally:
        BM25Index.NATIVE_THRESHOLD = thr
    # the synthetic corpus is full of ties: top-20 doc identity is
    # tie-break-dependent, but the score multiset must match exactly
    got_scores = sorted(round(s, 4) for _, s in got)
    ref_scores = sorted(round(s, 4) for _, s in ref)
    assert got_scores == ref_scores
    # and every native hit's score must equal the python-computed score
    # for that same document
    full_ref = dict(ref)
    BM25Index.NATIVE_THRESHOLD = 10**9
    try:
        all_python = dict(idx.search("parse file server", limit=10**6))
    finally:
        BM25Index.NATIVE_THRESHOLD = 2000
    for d, s in got:
        assert abs(s - all_python[d]) < 1e-4


def test_reranker_pipeline_with_cross_encoder():
    from codegraph_tpu.models.cross_encoder import CrossEncoder

    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    results = hs.search_text("parse source file", limit=3)
    ce = CrossEncoder(hidden=32, n_layers=1, max_len=64)
    rr = RerankerPipeline(provider, cross_encoder=ce)
    out = rr.rerank("parse source file", results)
    assert out and len(out) <= len(results)
    assert all(hasattr(r, "score") for r in out)


def test_make_reranker_pipeline_loads_shipped_checkpoint():
    """The shared serving factory must load the SHIPPED cross-encoder
    checkpoint (regression: api.serve built CrossEncoder() without one
    — a random-init scorer blending noise into every ranking). Proof of
    load: the shipped checkpoint names a BPE tokenizer; a bare
    CrossEncoder() falls back to the byte tokenizer."""
    import os

    from codegraph_tpu.core.config import SearchConfig
    from codegraph_tpu.models.cross_encoder import (
        default_cross_encoder_checkpoint,
    )
    from codegraph_tpu.search.reranker import make_reranker_pipeline

    store, index, provider, bm25 = build_corpus()

    cfg = SearchConfig()
    assert cfg.reranker != "cross_encoder"  # default stays embedding
    pipe = make_reranker_pipeline(provider, cfg)
    assert pipe.cross_encoder is None

    if not (default_cross_encoder_checkpoint()
            and os.path.exists(default_cross_encoder_checkpoint())):
        return  # shipped checkpoint absent in this checkout
    cfg.reranker = "cross_encoder"
    pipe = make_reranker_pipeline(provider, cfg)
    assert pipe.cross_encoder is not None
    assert type(pipe.cross_encoder.tokenizer).__name__ != "ByteTokenizer"
    assert pipe.config.stage1_k == cfg.rerank_candidates


def test_bm25_native_matches_python_idf():
    """Native and Python BM25 must rank identically — regression: the
    native path derived n_docs from the query's max doc id, collapsing
    IDF for terms living in low rows of a big corpus."""
    from codegraph_tpu.native import lib
    from codegraph_tpu.search.bm25 import BM25Index

    if lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    idx = BM25Index()
    # rare term in low rows, common filler everywhere
    for d in range(3000):
        # variable lengths keep every BM25 score distinct (the native
        # partial_sort is unstable on exact ties, the Python sort stable)
        text = "filler common words here" + " pad" * (d if d < 40 else d % 7)
        if d < 40:
            text += " zebra"
        if d < 2:
            text += " quagga zebra"
        idx.add(d, text)
    assert idx.n_docs >= idx.NATIVE_THRESHOLD
    native = idx.search("quagga zebra", limit=10)
    # force the Python path by shrinking the threshold view
    old = idx.NATIVE_THRESHOLD
    idx.NATIVE_THRESHOLD = 10**9
    try:
        py = idx.search("quagga zebra", limit=10)
    finally:
        idx.NATIVE_THRESHOLD = old
    assert [d for d, _ in native] == [d for d, _ in py]
    for (dn, sn), (dp, sp) in zip(native, py):
        assert abs(sn - sp) < 1e-4 * max(1.0, abs(sp))


def test_cached_results_not_poisoned_by_reranker_mutation():
    """Reranker stages mutate r.score in place — a cache hit must hand
    out fresh copies, not the cached objects."""
    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    q = "parse the source file"
    r1 = hs.search_text(q, limit=3)
    assert r1
    orig = [r.score for r in r1]
    for r in r1:
        r.score = -123.0  # what a reranker does
    r2 = hs.search_text(q, limit=3)  # cache hit
    assert [r.score for r in r2] == orig


# -- SearchFilters + edge evidence (search.rs:23-28, :420-461; surql:481) --


def build_multilang_corpus():
    """Six nodes across two languages/dirs with metadata + a calls edge."""
    store = GraphStore()
    provider = HashProvider(DIM)
    spec = [
        ("parse_source_file", Language.PYTHON, NodeType.FUNCTION,
         "src/parse.py", {"visibility": "public"},
         "def parse_source_file(path): read and parse the source file into an ast tree"),
        ("parse_helper", Language.PYTHON, NodeType.FUNCTION,
         "src/helper.py", {"visibility": "private"},
         "def parse_helper(tree): helper used by the source file parser for ast walking"),
        ("ParserConfig", Language.PYTHON, NodeType.CLASS,
         "src/parse.py", {},
         "class ParserConfig: options controlling how the parser reads source files"),
        ("parse_tokens", Language.RUST, NodeType.FUNCTION,
         "native/lexer.rs", {"visibility": "public"},
         "fn parse_tokens(input: &str) -> Vec<Token> parse the source input into tokens"),
        ("TokenKind", Language.RUST, NodeType.ENUM,
         "native/lexer.rs", {},
         "enum TokenKind token categories produced when we parse source text"),
        ("render_page", Language.RUST, NodeType.FUNCTION,
         "web/render.rs", {"visibility": "public"},
         "fn render_page(ctx) render an html template page"),
    ]
    nodes = []
    for i, (name, lang, ntype, path, meta, text) in enumerate(spec):
        nodes.append(CodeNode.make(
            "proj", name, ntype, lang,
            Location(path, i * 10, i * 10 + 5), content=text, metadata=meta,
        ))
    store.upsert_nodes(nodes)
    by_name = {n.name: n for n in nodes}
    store.add_edges([
        CodeEdge(by_name["parse_source_file"].id, by_name["parse_helper"].id,
                 EdgeType.CALLS),
        CodeEdge(by_name["parse_tokens"].id, by_name["TokenKind"].id,
                 EdgeType.USES),
    ])
    chunks = [CodeChunk.make(n.id, n.content, 0, 1) for n in nodes]
    store.upsert_chunks(chunks)
    index = FlatIndex(DIM, tile_n=128, backend="xla")
    index.add(provider.embed_texts([c.text for c in chunks]))
    bm25 = BM25Index()
    for node in nodes:
        bm25.add(node.row, f"{node.name} {node.content}")
    return store, index, provider, bm25, by_name


def test_filterbank_bias_matches_matches_node_oracle():
    from codegraph_tpu.core.types import SearchFilters
    from codegraph_tpu.search.filters import FilterBank

    store, index, provider, bm25, by_name = build_multilang_corpus()
    bank = FilterBank(store)
    cases = [
        SearchFilters.make(languages=["rust"]),
        SearchFilters.make(node_types=["function"]),
        SearchFilters.make(path_prefixes=["src/"]),
        SearchFilters.make(metadata={"visibility": "public"}),
        SearchFilters.make(languages=["python"], node_types=["class"]),
        SearchFilters.make(languages=["rust"], path_prefixes=["native/"],
                           metadata={"visibility": "public"}),
    ]
    for f in cases:
        bias = bank.bias_for(f, index.n_rows)
        assert bias is not None and bias.shape == (index.n_rows,)
        for row in range(index.n_rows):
            node = store.nodes[store.chunk_by_row(row).parent_node]
            expect = f.matches_node(node)
            assert (bias[row] == 0.0) == expect, (f, node.name)


def test_filtered_search_language_and_type():
    from codegraph_tpu.core.types import SearchFilters

    store, index, provider, bm25, by_name = build_multilang_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    f = SearchFilters.make(languages=["rust"])
    res = hs.search_text("parse the source", limit=5, filters=f)
    assert res and all(
        store.nodes[r.node_id].language == Language.RUST for r in res
    )
    assert res[0].name == "parse_tokens"
    assert res[0].metadata_score > 0  # filters contribute a meta score
    # node_type filter
    f2 = SearchFilters.make(node_types=["class"])
    res2 = hs.search_text("parser options", limit=5, filters=f2)
    assert res2 and all(r.node_type == "class" for r in res2)
    # empty-filter object behaves like no filter
    res3 = hs.search_text("parse the source", limit=5,
                          filters=SearchFilters.make())
    names3 = {r.name for r in res3}
    assert "parse_source_file" in names3 and "parse_tokens" in names3


def test_filtered_search_path_and_metadata():
    from codegraph_tpu.core.types import SearchFilters

    store, index, provider, bm25, by_name = build_multilang_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    f = SearchFilters.make(path_prefixes=["native/"])
    res = hs.search_text("parse source tokens", limit=5, filters=f)
    assert res and all(r.file_path.startswith("native/") for r in res)
    f2 = SearchFilters.make(metadata={"visibility": "private"})
    res2 = hs.search_text("parse helper", limit=5, filters=f2)
    assert [r.name for r in res2] == ["parse_helper"]


def test_filtered_search_distinct_cache_entries():
    from codegraph_tpu.core.types import SearchFilters

    store, index, provider, bm25, by_name = build_multilang_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    plain = hs.search_text("parse the source", limit=5)
    filt = hs.search_text("parse the source", limit=5,
                          filters=SearchFilters.make(languages=["rust"]))
    assert {r.name for r in plain} != {r.name for r in filt}
    # repeat must hit the cache yet stay filtered
    again = hs.search_text("parse the source", limit=5,
                           filters=SearchFilters.make(languages=["rust"]))
    assert [r.name for r in again] == [r.name for r in filt]


def test_flat_index_extra_bias_matches_numpy_oracle(rng):
    from codegraph_tpu.ops.topk import NEG_INF

    N, k = 300, 5
    x = rng.standard_normal((N, DIM)).astype(np.float32)
    q = rng.standard_normal((2, DIM)).astype(np.float32)
    idx = FlatIndex(DIM, metric="dot", tile_n=128, backend="xla")
    idx.add(x)
    mask = np.zeros((N,), np.float32)
    excluded = rng.choice(N, size=200, replace=False)
    mask[excluded] = float(NEG_INF)
    s, i = idx.search(q, k, extra_bias=mask)
    allowed = np.setdiff1d(np.arange(N), excluded)
    scores = q @ x.T
    for b in range(2):
        ref = allowed[np.argsort(-scores[b][allowed], kind="stable")[:k]]
        np.testing.assert_array_equal(i[b], ref)


def test_search_results_carry_edge_evidence():
    store, index, provider, bm25, by_name = build_multilang_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    res = hs.search_text("parse the source file ast", limit=4)
    by = {r.name: r for r in res}
    assert "parse_source_file" in by and "parse_helper" in by
    rel = by["parse_source_file"].related
    assert rel, "top hit must carry edge evidence"
    ev = {e["name"]: e for e in rel}
    assert "parse_helper" in ev
    assert ev["parse_helper"]["relation"] == "calls"
    assert ev["parse_helper"]["direction"] == "out"
    # and the callee sees the incoming edge
    rel_h = {e["name"]: e for e in by["parse_helper"].related}
    assert rel_h["parse_source_file"]["direction"] == "in"
    # evidence serializes through to_dict for tools/MCP
    d = by["parse_source_file"].to_dict()
    assert d["related"][0]["relation"] in ("calls", "uses", "depends_on")


def test_soft_filters_boost_without_excluding():
    """search.rs:317-345 parity: soft filters keep non-matching results
    but rank matching ones higher via metadata_match_score."""
    from codegraph_tpu.core.types import SearchFilters

    store, index, provider, bm25, by_name = build_multilang_corpus()
    hs = HybridSearch(store, index, provider, bm25,
                      SearchConfig(metadata_weight=0.5))
    f = SearchFilters.make(languages=["rust"], soft=True)
    res = hs.search_text("parse the source", limit=6, filters=f)
    langs = [store.nodes[r.node_id].language for r in res]
    # non-rust results survive (soft)
    assert any(l != Language.RUST for l in langs)
    # rust results carry a higher metadata score
    rust_scores = [r.metadata_score for r in res
                   if store.nodes[r.node_id].language == Language.RUST]
    other_scores = [r.metadata_score for r in res
                    if store.nodes[r.node_id].language != Language.RUST]
    assert rust_scores and min(rust_scores) > max(other_scores)
    # and the boost reorders: best rust hit outranks same-content python
    names = [r.name for r in res]
    assert names.index("parse_tokens") < names.index("parse_helper")


def test_cached_results_not_poisoned_by_related_mutation():
    """`related` is mutable: cache hits must hand out deep copies."""
    store, index, provider, bm25, by_name = build_multilang_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    q = "parse the source file ast"
    r1 = hs.search_text(q, limit=4)
    target = next(r for r in r1 if r.related)
    orig = [dict(e) for e in target.related]
    target.related.clear()           # what a consumer might do
    r2 = hs.search_text(q, limit=4)  # cache hit
    again = next(r for r in r2 if r.node_id == target.node_id)
    assert again.related == orig


def test_ivfpq_selective_filter_overfetch():
    """A highly selective filter on the IVF-PQ tier must still return k
    results (selectivity-scaled over-fetch, not a fixed 4x)."""
    from codegraph_tpu.index.ivfpq import IVFPQIndex
    from codegraph_tpu.ops.topk import NEG_INF

    rng = np.random.default_rng(5)
    N, D2 = 4096, 32
    x = rng.standard_normal((N, D2)).astype(np.float32)
    idx = IVFPQIndex(D2, nlist=8, nprobe=8, m=8, refine="none",
                     kmeans_iters=3, pq_iters=3, train_sample=N)
    idx.train(x)
    idx.add(x)
    mask = np.full((N,), float(NEG_INF), np.float32)
    allowed = rng.choice(N, size=80, replace=False)  # ~2% selectivity
    mask[allowed] = 0.0
    s, i = idx.search(x[:4], 10, extra_bias=mask)
    i = np.asarray(i)
    got = i[i >= 0]
    assert got.size >= 30, f"only {got.size} filtered hits across 4 queries"
    assert np.isin(got, allowed).all()


def test_feature_pipeline_passthrough_stage1():
    """Feature mode must NOT re-embed snippets in stage 1: the snippet
    re-embed collapsed tool recall@1 0.41 -> 0.26 in the r5 agent_eval
    (truncated snippets rank differently from the indexed chunks). The
    pipeline keeps the retrieval ranking into stage 2, needs no
    provider calls, and the feature stage can only locally reorder."""
    from codegraph_tpu.core.config import SearchConfig
    from codegraph_tpu.core.types import SearchResult
    from codegraph_tpu.search.reranker import (
        PassthroughReranker,
        make_reranker_pipeline,
    )

    class ExplodingProvider:
        def embed_texts(self, texts):
            raise AssertionError("feature mode must not embed")

    cfg = SearchConfig()
    cfg.reranker = "feature"
    pipe = make_reranker_pipeline(ExplodingProvider(), cfg)
    assert isinstance(pipe.stage1, PassthroughReranker)

    results = [
        SearchResult(node_id=str(i), chunk_id=str(i), score=1.0 - 0.1 * i,
                     name=f"fn_{i}", file_path=f"src/m{i}.py",
                     snippet=f"def fn_{i}(): pass")
        for i in range(30)
    ]
    out = pipe.rerank("does not match any name", results)
    # with zero feature signal the retrieval order must survive intact
    assert [r.node_id for r in out] == [str(i) for i in range(len(out))]


def test_multi_hit_bonus_promotes_corroborated_node(rng):
    """A node whose chunks match the query TWICE must outrank a node
    with one equal best chunk (multi_hit_weight folds the second-best
    chunk score in); with the weight at 0, the ranking falls back to
    max-chunk and the tie stands in insertion order."""
    from codegraph_tpu.search.hybrid import HybridSearch

    store, index, provider, bm25 = build_corpus()
    hs = HybridSearch(store, index, provider, bm25)
    r1 = hs.search_text("parse source file", limit=5)
    assert r1  # pipeline still returns ranked results
    hs2 = HybridSearch(store, index, provider, bm25)
    hs2.config.multi_hit_weight = 0.0
    r0 = hs2.search_text("parse source file", limit=5)
    # bonus only ever increases a node's vector evidence
    by_id0 = {r.node_id: r.vector_score for r in r0}
    for r in r1:
        if r.node_id in by_id0:
            assert r.vector_score >= by_id0[r.node_id] - 1e-9
