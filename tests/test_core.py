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
    monkeypatch.setenv("CODEGRAPH_RERANKER", "cross_encoder")
    cfg = load_config(path="/nonexistent/config.toml")
    assert cfg.embedding.dimension == 768
    assert cfg.index.kind == "ivf"
    assert cfg.search.vector_weight == pytest.approx(0.8)
    assert cfg.search.rerank is True
    assert cfg.search.reranker == "cross_encoder"


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


def test_round3_env_override_parity(monkeypatch):
    """config_manager.rs:696-908 parity sweep: the round-3 additions
    (LATS knobs, daemon, reranking, model aliases) all apply."""
    from codegraph_tpu.core.config import load_config

    monkeypatch.setenv("CODEGRAPH_MODEL", "claude-x")
    monkeypatch.setenv("CODEGRAPH_TEMPERATURE", "0.7")
    monkeypatch.setenv("CODEGRAPH_REASONING_EFFORT", "high")
    monkeypatch.setenv("CODEGRAPH_USE_COMPLETIONS_API", "true")
    monkeypatch.setenv("CODEGRAPH_LOCAL_MODEL", "/models/enc.npz")
    monkeypatch.setenv("CODEGRAPH_OLLAMA_URL", "http://h:1234")
    monkeypatch.setenv("CODEGRAPH_ENABLE_RERANKING", "1")
    monkeypatch.setenv("CODEGRAPH_RERANKING_CANDIDATES", "55")
    monkeypatch.setenv("CODEGRAPH_DAEMON_AUTO_START", "yes")
    monkeypatch.setenv("CODEGRAPH_DAEMON_WATCH_PATH", "/proj")
    monkeypatch.setenv("CODEGRAPH_DAEMON_BATCH_TIMEOUT_MS", "250")
    monkeypatch.setenv("CODEGRAPH_DAEMON_DEBOUNCE_MS", "150")
    monkeypatch.setenv("CODEGRAPH_LATS_BEAM_WIDTH", "3")
    monkeypatch.setenv("CODEGRAPH_LATS_MAX_DEPTH", "6")
    monkeypatch.setenv("CODEGRAPH_LATS_EXPLORATION_WEIGHT", "2.0")
    monkeypatch.setenv("CODEGRAPH_LATS_EXPANSION_PROVIDER", "ollama")
    monkeypatch.setenv("CODEGRAPH_LATS_EXPANSION_MODEL", "qwen")
    monkeypatch.setenv("CODEGRAPH_LATS_EVALUATION_MODEL", "mini")
    cfg = load_config(path="/nonexistent/config.toml")
    assert cfg.llm.model == "claude-x"
    assert cfg.llm.temperature == 0.7
    assert cfg.llm.reasoning_effort == "high"
    assert cfg.llm.use_completions_api is True
    assert cfg.embedding.model == "/models/enc.npz"
    assert cfg.embedding.base_url == "http://h:1234"
    assert cfg.search.rerank is True
    assert cfg.search.rerank_candidates == 55
    assert cfg.daemon.auto_start is True
    assert cfg.daemon.watch_path == "/proj"
    assert cfg.daemon.batch_timeout_ms == 250
    assert cfg.indexing.watch_debounce_ms == 150
    assert cfg.lats.beam_width == 3 and cfg.lats.max_depth == 6
    assert cfg.lats.exploration_weight == 2.0
    assert cfg.lats.expansion_provider == "ollama"
    assert cfg.lats.expansion_model == "qwen"
    assert cfg.lats.evaluation_model == "mini"


def test_lats_config_drives_agent(monkeypatch):
    """CODEGRAPH_LATS_* reaches the LATS agent through create_agent."""
    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.mcp.agents import create_agent

    cfg = CodeGraphConfig()
    cfg.lats.beam_width = 5
    cfg.lats.max_depth = 7
    cfg.lats.exploration_weight = 0.5
    agent = create_agent("lats", llm=None, tools=None, config=cfg)
    assert agent.expansion_width == 5
    assert agent.max_depth == 7
    assert agent.exploration_weight == 0.5


def test_progress_reporter_lines(capsys):
    import io

    from codegraph_tpu.utils.progress import ProgressReporter

    buf = io.StringIO()
    rep = ProgressReporter(enabled=True, out=buf)
    st = rep.stage("embed", 100, "chunks")
    st.update(50)
    st.update(100)
    st.done()
    out = buf.getvalue()
    assert "[embed]" in out and "chunks" in out and "/s" in out
    # disabled reporter writes nothing
    buf2 = io.StringIO()
    st2 = ProgressReporter(enabled=False, out=buf2).stage("x", 10, "y")
    st2.update(10)
    st2.done()
    assert buf2.getvalue() == ""
