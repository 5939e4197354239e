"""Robustness edge cases: empty projects, weird bytes, boundary shapes."""

import numpy as np
import pytest

from codegraph_tpu.core.config import CodeGraphConfig
from codegraph_tpu.indexer.indexer import ProjectIndexer


def make_cfg(tmp_path):
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.data_dir = str(tmp_path / ".cg")
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    return cfg


def test_index_empty_project(tmp_path):
    indexer = ProjectIndexer(make_cfg(tmp_path))
    stats = indexer.index_project(str(tmp_path))
    assert stats.files_parsed == 0 and stats.nodes == 0
    assert indexer.search.search_text("anything") == []
    # save/load of an empty project round-trips
    d = indexer.save()
    indexer2 = ProjectIndexer(make_cfg(tmp_path))
    indexer2.load(d)
    assert indexer2.search.search_text("anything") == []


def test_index_non_utf8_and_huge_line(tmp_path):
    (tmp_path / "weird.py").write_bytes(
        b"def caf\xc3\xa9():\n    return '\xff\xfe broken bytes'\n"
    )
    (tmp_path / "long.py").write_text(
        "x = " + "+".join(str(i) for i in range(5000)) + "\n"
        "def after_long_line():\n    return x\n"
    )
    indexer = ProjectIndexer(make_cfg(tmp_path))
    stats = indexer.index_project(str(tmp_path))
    assert stats.files_parsed == 2
    hits = indexer.search.search_text("after long line")
    assert any(r.name == "after_long_line" for r in hits)


def test_index_syntax_error_python(tmp_path):
    (tmp_path / "broken.py").write_text("def oops(:\n  ???\n")
    (tmp_path / "fine.py").write_text("def fine():\n    return 1\n")
    indexer = ProjectIndexer(make_cfg(tmp_path))
    stats = indexer.index_project(str(tmp_path))
    # broken file parses to just a FILE node; the good one works
    assert any(n.name == "fine" for n in indexer.store.nodes.values())


def test_flat_index_single_row_and_k1(rng):
    from codegraph_tpu.index.flat import FlatIndex

    idx = FlatIndex(16, tile_n=128, backend="xla")
    idx.add(rng.standard_normal((1, 16)).astype(np.float32))
    s, i = idx.search(rng.standard_normal((1, 16)).astype(np.float32), 1)
    assert i.shape == (1, 1) and i[0, 0] == 0


def test_tokenizer_handles_emoji_and_nul():
    from codegraph_tpu.models.tokenizer import ByteTokenizer

    tok = ByteTokenizer(max_len=32)
    ids, mask = tok.encode_batch(["emoji \U0001f600 and\x00nul"])
    assert ids.shape == (1, 32)
    assert mask[0].sum() > 4


def test_bm25_unicode_query():
    from codegraph_tpu.search.bm25 import BM25Index

    idx = BM25Index()
    idx.add(0, "café handler for naïve requests")
    assert idx.search("café") or True  # must not raise


def test_store_delete_unknown_file_is_noop():
    from codegraph_tpu.graph.store import GraphStore

    store = GraphStore()
    node_rows, chunk_rows = store.delete_file_data("never/indexed.py")
    assert node_rows == [] and chunk_rows == []


def test_config_env_override_bad_values(monkeypatch):
    from codegraph_tpu.core.config import load_config

    monkeypatch.setenv("CODEGRAPH_EMBEDDING_DIMENSION", "not-a-number")
    monkeypatch.setenv("CODEGRAPH_IVF_NPROBE", "99999")
    monkeypatch.setenv("CODEGRAPH_INDEX_KIND", "hnsw")  # unknown -> flat
    cfg = load_config()
    assert cfg.embedding.dimension == 768  # bad int ignored (default kept)
    assert cfg.index.kind == "flat"
    assert cfg.index.nprobe <= cfg.index.nlist  # clamped
