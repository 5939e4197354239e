import os

import pytest

from codegraph_tpu.core.secrets import SecretStore


def test_secret_roundtrip(tmp_path):
    store = SecretStore(str(tmp_path))
    store.set("MY_API_KEY", "sk-super-secret")
    assert store.get("MY_API_KEY") == "sk-super-secret"
    # persisted encrypted (plaintext never on disk)
    raw = (tmp_path / "secrets.json").read_text()
    assert "sk-super-secret" not in raw
    # key file exists with restrictive perms
    assert (tmp_path / "secret.key").exists()
    assert oct((tmp_path / "secret.key").stat().st_mode & 0o777) == "0o600"
    # a fresh store with the same dir decrypts
    assert SecretStore(str(tmp_path)).get("MY_API_KEY") == "sk-super-secret"


def test_env_var_precedence(tmp_path, monkeypatch):
    store = SecretStore(str(tmp_path))
    store.set("PREC_KEY", "from-store")
    monkeypatch.setenv("PREC_KEY", "from-env")
    assert store.get("PREC_KEY") == "from-env"


def test_tampered_blob_returns_none(tmp_path):
    store = SecretStore(str(tmp_path))
    store.set("K", "v")
    import base64, json

    data = json.loads((tmp_path / "secrets.json").read_text())
    blob = bytearray(base64.b64decode(data["K"]))
    blob[-1] ^= 0xFF
    data["K"] = base64.b64encode(bytes(blob)).decode()
    (tmp_path / "secrets.json").write_text(json.dumps(data))
    assert store.get("K") is None


def test_delete_and_names(tmp_path):
    store = SecretStore(str(tmp_path))
    store.set("A", "1")
    store.set("B", "2")
    assert store.names() == ["A", "B"]
    store.delete("A")
    assert store.names() == ["B"]
    assert store.get("A") is None
