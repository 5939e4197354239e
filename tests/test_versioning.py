import pytest

from codegraph_tpu.core.versioning import VersionStore, VersionedValue


def test_versioned_value_chain():
    vv = VersionedValue({"a": 1})
    assert vv.version == 1
    vv.update({"a": 2}, note="bump")
    assert vv.current == {"a": 2} and vv.version == 2
    assert vv.at(1) == {"a": 1}
    v3 = vv.rollback(1)
    assert v3 == 3 and vv.current == {"a": 1}
    hist = vv.history()
    assert [h[0] for h in hist] == [1, 2, 3]
    with pytest.raises(KeyError):
        vv.at(99)


def test_version_store_diff():
    store = VersionStore()
    store.put("node:x", {"name": "f", "complexity": 2})
    store.put("node:x", {"name": "f", "complexity": 5, "exported": True})
    assert store.version_of("node:x") == 2
    d = store.diff("node:x", 1, 2)
    assert d["changed"]["complexity"] == (2, 5)
    assert d["added"] == {"exported": True}
    assert "node:x" in store and "node:y" not in store
    store.rollback("node:x", 1)
    assert store.get("node:x")["complexity"] == 2
