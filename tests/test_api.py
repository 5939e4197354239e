import textwrap

import pytest

from codegraph_tpu.api import CodeGraph
from codegraph_tpu.core.config import CodeGraphConfig


@pytest.fixture
def project(tmp_path):
    (tmp_path / "auth.py").write_text(textwrap.dedent('''
        def hash_password(pw):
            """Hashes a password with a salt."""
            return pw[::-1]

        def verify_login(user, pw):
            return hash_password(pw) == user.secret
    '''))
    return tmp_path


def make_cfg(tmp_path):
    cfg = CodeGraphConfig()
    cfg.data_dir = str(tmp_path / ".cg")
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 48
    return cfg


def test_facade_index_search_ask(project):
    cg = CodeGraph.open(str(project), config=make_cfg(project))
    stats = cg.index()
    assert stats.nodes >= 2

    hits = cg.search("hash a password")
    assert hits and hits[0].name == "hash_password"

    answer = cg.ask("how are passwords hashed?")
    assert "hash_password" in answer["answer"]
    assert answer["sources"]

    deps = cg.graph.transitive_dependencies("verify_login")
    assert any(d["name"] == "hash_password" for d in deps["dependencies"])

    ins = cg.insights("password hashing")
    assert any(i["kind"] == "relevant_code" for i in ins)

    s = cg.stats()
    assert s["index_live"] >= 2


def test_facade_reopen_loads_snapshot(project):
    cfg = make_cfg(project)
    cg = CodeGraph.open(str(project), config=cfg)
    cg.index()
    hits1 = [r.node_id for r in cg.search("verify login")]

    cg2 = CodeGraph.open(str(project), config=make_cfg(project))
    hits2 = [r.node_id for r in cg2.search("verify login")]
    assert hits1 == hits2
    # incremental: nothing to re-parse
    stats = cg2.index()
    assert stats.files_unchanged == 1


def test_facade_update_file(project):
    cg = CodeGraph.open(str(project), config=make_cfg(project))
    cg.index()
    (project / "auth.py").write_text("def reset_password(u):\n    return u\n")
    cg.update_file(str(project / "auth.py"))
    hits = cg.search("reset password")
    assert hits[0].name == "reset_password"
