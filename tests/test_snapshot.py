import numpy as np
import pytest

from codegraph_tpu.core.errors import SnapshotError
from codegraph_tpu.index.snapshot import load_arrays, save_arrays


def test_snapshot_roundtrip_mmap(tmp_path, rng):
    x = rng.standard_normal((100, 32)).astype(np.float32)
    bias = np.zeros((100,), np.float32)
    save_arrays(str(tmp_path), {"x": x, "bias": bias}, {"kind": "flat"})
    arrays, meta = load_arrays(str(tmp_path))
    assert meta["kind"] == "flat"
    np.testing.assert_array_equal(arrays["x"], x)
    # mmap mode: read-only memory map
    assert isinstance(arrays["x"], np.memmap)
    assert not arrays["x"].flags.writeable


def test_snapshot_overwrite_atomic(tmp_path, rng):
    a = rng.standard_normal((10, 4)).astype(np.float32)
    b = rng.standard_normal((20, 4)).astype(np.float32)
    save_arrays(str(tmp_path), {"x": a})
    save_arrays(str(tmp_path), {"x": b})
    arrays, _ = load_arrays(str(tmp_path))
    np.testing.assert_array_equal(arrays["x"], b)


def test_snapshot_corruption_detected(tmp_path, rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    save_arrays(str(tmp_path), {"x": x})
    # flip bytes in the middle of the array file
    path = tmp_path / "x.npy"
    data = bytearray(path.read_bytes())
    data[200:210] = b"corrupted!"
    path.write_bytes(bytes(data))
    with pytest.raises(SnapshotError, match="corrupt"):
        load_arrays(str(tmp_path))
    # verify=False skips the check
    arrays, _ = load_arrays(str(tmp_path), verify=False)
    assert arrays["x"].shape == (50, 8)


def test_snapshot_missing_dir(tmp_path):
    with pytest.raises(SnapshotError):
        load_arrays(str(tmp_path / "nope"))


def test_indexer_ivf_snapshot_roundtrip(tmp_path, rng):
    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.indexer.indexer import ProjectIndexer

    files = {}
    for i in range(6):
        (tmp_path / f"mod{i}.py").write_text(
            "\n".join(
                f"def fn{i}_{j}(x):\n    return x * {j}\n" for j in range(4)
            )
        )
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.data_dir = str(tmp_path / ".cg")
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 32
    cfg.index.kind = "ivf"
    cfg.index.nlist = 4
    cfg.index.nprobe = 4
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))
    q = "multiply x by three"
    before = [r.node_id for r in indexer.search.search_text(q, limit=5)]
    d = indexer.save()

    from codegraph_tpu.index.ivf import IVFIndex

    indexer2 = ProjectIndexer(cfg, index=IVFIndex(32, nlist=4, nprobe=4))
    indexer2.load(d)
    after = [r.node_id for r in indexer2.search.search_text(q, limit=5)]
    assert before == after
