"""Native cghost kernels vs their pure-Python references."""

import numpy as np
import pytest

from codegraph_tpu import native
from codegraph_tpu.core.types import (
    CodeEdge,
    CodeNode,
    EdgeType,
    Language,
    Location,
    NodeType,
)
from codegraph_tpu.graph.csr import build_csr
from codegraph_tpu.graph.store import GraphStore

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libcghost.so not built"
)


def test_padded_adjacency_matches_python(rng):
    n = 50
    m = 300
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    et = rng.integers(0, 3, m).astype(np.int16)  # codes 0..2 (calls/uses/dep)
    w = rng.random(m).astype(np.float32)
    csr = build_csr(n, src, dst, et, w)
    keep = (0, 1, 2)
    nat = native.padded_adjacency_native(
        n, csr.indptr, csr.indices, csr.etype, csr.weight,
        csr.r_indptr, csr.r_indices, csr.r_etype, csr.r_weight,
        keep, 16,
    )
    assert nat is not None
    nbr_n, wgt_n, et_n, dir_n = nat
    # python reference path (bypass the native shortcut by calling the
    # fallback loop directly through a non-symmetric call + manual union
    # is complex; instead compare against a set-based oracle)
    for row in range(n):
        expect = {}
        for lo, hi, idxs, ets, ws in (
            (csr.indptr[row], csr.indptr[row + 1], csr.indices, csr.etype, csr.weight),
            (csr.r_indptr[row], csr.r_indptr[row + 1], csr.r_indices, csr.r_etype, csr.r_weight),
        ):
            for j in range(lo, hi):
                if ets[j] in keep:
                    d = int(idxs[j])
                    expect[d] = max(expect.get(d, 0.0), float(ws[j]))
        got = {
            int(d): float(wt)
            for d, wt in zip(nbr_n[row], wgt_n[row]) if d >= 0
        }
        if len(expect) <= 16:
            assert got.keys() == expect.keys()
            for d in got:
                assert got[d] == pytest.approx(expect[d], abs=1e-6)
        else:
            # truncated: kept ones must be the highest-weight subset size 16
            assert len(got) == 16
            assert min(got.values()) >= sorted(expect.values(), reverse=True)[15] - 1e-6


def test_trigram_preselect_ranks_similar_first():
    idx, score = native.trigram_preselect_native(
        ["compute_checksum", "zzzz"],
        ["compute_checksums", "compute_total", "render_page"],
        threshold=0.2, top_j=3,
    )
    assert idx[0][0] == 0  # compute_checksums is most trigram-similar
    assert score[0][0] > 0.5
    assert (idx[1] == -1).all()  # no candidate for zzzz


def test_bm25_native_matches_python():
    from codegraph_tpu.search.bm25 import BM25Index

    docs = {
        0: "def parse_file(path): parse a source file",
        1: "class HttpServer: handles http requests",
        2: "fn compute_embedding(text) vector parse",
    }
    py = BM25Index()
    for d, t in docs.items():
        py.add(d, t)
    expected = dict(py.search("parse file", limit=10))

    # pack postings for the query terms (parse, file)
    from codegraph_tpu.search.bm25 import tokenize

    terms = sorted(set(tokenize("parse file")))
    post_off = [0]
    post_doc, post_tf = [], []
    for t in terms:
        docs_tf = py.postings.get(t, {})
        for d, tf in sorted(docs_tf.items()):
            post_doc.append(d)
            post_tf.append(tf)
        post_off.append(len(post_doc))
    doc_len = np.zeros(3, np.int32)
    for d, n in py.doc_len.items():
        doc_len[d] = n
    out = native.bm25_score_native(
        np.asarray(post_off, np.int64), np.asarray(post_doc, np.int32),
        np.asarray(post_tf, np.int32), doc_len,
        py.total_len / py.n_docs, py.k1, py.b, 10,
    )
    assert out is not None
    out_doc, out_score = out
    got = {int(d): float(s) for d, s in zip(out_doc, out_score)}
    assert set(got) == set(expected)
    for d in got:
        assert got[d] == pytest.approx(expected[d], rel=1e-5)


def test_resolver_uses_native_preselect():
    from codegraph_tpu.indexer.resolve import EdgeResolver
    from codegraph_tpu.models.providers import HashProvider

    def mk(name):
        return CodeNode.make(
            "p", name, NodeType.FUNCTION, Language.PYTHON, Location("a.py", 1, 2)
        )

    nodes = [mk("compute_checksum"), mk("render_page")]
    edges = [CodeEdge(nodes[1].id, "compute_checksums", EdgeType.CALLS,
                      resolved=False)]
    resolver = EdgeResolver(provider=HashProvider(64), semantic_threshold=0.5)
    _, _, n_sem, _ = resolver.resolve(edges, nodes)
    assert n_sem == 1
