import numpy as np
import pytest

from codegraph_tpu.core.config import CodeGraphConfig, load_config
from codegraph_tpu.core.padding import (
    aligned_cols,
    aligned_rows,
    grow_capacity,
    pad_rows,
    round_up,
)
from codegraph_tpu.core.types import (
    CodeChunk,
    CodeNode,
    Language,
    Location,
    NodeType,
    content_hash,
    deterministic_node_id,
    language_for_path,
)


def test_deterministic_node_id_stable():
    a = deterministic_node_id("proj", "src/a.py", "foo", "function", 10)
    b = deterministic_node_id("proj", "src/a.py", "foo", "function", 10)
    c = deterministic_node_id("proj", "src/a.py", "foo", "function", 11)
    assert a == b
    assert a != c
    # valid UUID shape
    assert len(a.split("-")) == 5


def test_code_node_make_idempotent():
    loc = Location("src/a.py", 1, 5)
    n1 = CodeNode.make("p", "foo", NodeType.FUNCTION, Language.PYTHON, loc, "def foo(): ...")
    n2 = CodeNode.make("p", "foo", NodeType.FUNCTION, Language.PYTHON, loc, "def foo(): ...")
    assert n1.id == n2.id


def test_chunk_ids_distinct():
    c0 = CodeChunk.make("parent", "text", 0, 2)
    c1 = CodeChunk.make("parent", "text", 1, 2)
    assert c0.id != c1.id


def test_language_for_path():
    assert language_for_path("x/y.rs") == Language.RUST
    assert language_for_path("x/y.tsx") == Language.TYPESCRIPT
    assert language_for_path("noext") is None


def test_content_hash_changes():
    assert content_hash("a") != content_hash("b")


def test_padding_utils():
    assert round_up(1, 128) == 128
    assert round_up(128, 128) == 128
    assert aligned_rows(100, "float32", 512) == 512
    assert aligned_cols(384) == 384
    assert aligned_cols(300) == 384
    x = np.ones((3, 4), np.float32)
    y = pad_rows(x, 8)
    assert y.shape == (8, 4) and y[3:].sum() == 0
    assert grow_capacity(10, 0, 512) == 512
    assert grow_capacity(513, 512, 512) == 1024


def test_config_env_overrides(monkeypatch):
    monkeypatch.setenv("CODEGRAPH_EMBEDDING_DIMENSION", "768")
    monkeypatch.setenv("CODEGRAPH_INDEX_KIND", "ivf")
    monkeypatch.setenv("CODEGRAPH_VECTOR_WEIGHT", "0.8")
    monkeypatch.setenv("CODEGRAPH_RERANK", "true")
    cfg = load_config(path="/nonexistent/config.toml")
    assert cfg.embedding.dimension == 768
    assert cfg.index.kind == "ivf"
    assert cfg.search.vector_weight == pytest.approx(0.8)
    assert cfg.search.rerank is True


def test_config_validation_clamps():
    cfg = CodeGraphConfig()
    cfg.index.nprobe = 10_000
    cfg.index.nlist = 4096
    warnings = cfg.validate()
    assert cfg.index.nprobe == 4096
    assert warnings


def test_config_toml(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(
        """
[embedding]
provider = "hash"
dimension = 512

[search]
vector_weight = 0.7
"""
    )
    cfg = load_config(path=str(p), apply_env=False)
    assert cfg.embedding.dimension == 512
    assert cfg.search.vector_weight == pytest.approx(0.7)
