"""Shared-memory segments (core/shm.py): seqlock write/read, named-array
zero-copy views, manager lifecycle, TRUE cross-process attach, and the
FlatIndex publish/attach serving path (index/snapshot.py).

Reference parity: codegraph-zerocopy/src/shared_memory.rs (segment
create/open :52/:100, generation seqlock :140-342, manager :362-478)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from codegraph_tpu.core.shm import (
    SharedArrayStore,
    SharedMemoryManager,
    SharedSegment,
    ShmError,
)


def test_segment_roundtrip_and_generation(tmp_path):
    p = str(tmp_path / "seg.shm")
    with SharedSegment.create(p, 1024) as seg:
        assert seg.generation == 1  # odd: in-progress until first publish
        seg.write(b"hello shared world")
        assert seg.generation == 2  # even: published
        assert seg.read() == b"hello shared world"
        seg.write(b"second")
        assert seg.generation == 4
        assert seg.is_updated_since(2)
        st = seg.stats()
        assert st.payload_len == 6 and st.capacity == 1024


def test_segment_capacity_and_readonly(tmp_path):
    p = str(tmp_path / "seg.shm")
    with SharedSegment.create(p, 16) as seg:
        with pytest.raises(ShmError):
            seg.write(b"x" * 17)
        seg.write(b"ok")
    with SharedSegment.open(p) as ro:
        assert ro.read() == b"ok"
        with pytest.raises(ShmError):
            ro.write(b"nope")


def test_open_missing_and_bad_magic(tmp_path):
    with pytest.raises(ShmError):
        SharedSegment.open(str(tmp_path / "absent.shm"))
    bad = tmp_path / "bad.shm"
    bad.write_bytes(b"\0" * 64)
    with pytest.raises(ShmError):
        SharedSegment.open(str(bad))


def test_array_store_zero_copy_views(tmp_path):
    p = str(tmp_path / "arrays.shm")
    arrays = {
        "x": np.arange(24, dtype=np.float32).reshape(4, 6),
        "ids": np.array([7, 8, 9], dtype=np.int64),
        "blob": np.frombuffer(b"meta", np.uint8),
    }
    with SharedArrayStore.create(p, arrays) as store:
        got = store.arrays(copy=False)
        for k in arrays:
            np.testing.assert_array_equal(got[k], arrays[k])
        # zero-copy: the view's buffer is the mmap, not fresh pages
        assert not got["x"].flags.owndata
        # every array is 64-byte aligned for vectorized readers
        for k in ("x", "ids"):
            assert got[k].ctypes.data % 64 == 0
    # snapshot copies survive after close
    with SharedArrayStore.open(p) as store:
        snap = store.arrays(copy=True)
    np.testing.assert_array_equal(snap["x"], arrays["x"])


def test_array_store_bf16(tmp_path):
    ml_dtypes = pytest.importorskip("ml_dtypes")
    p = str(tmp_path / "bf16.shm")
    x = np.arange(8, dtype=np.float32).astype(ml_dtypes.bfloat16)
    with SharedArrayStore.create(p, {"x": x}) as store:
        got = store.arrays()["x"]
        assert got.dtype == x.dtype
        np.testing.assert_array_equal(
            got.astype(np.float32), x.astype(np.float32))


def test_array_store_republish_bumps_generation(tmp_path):
    p = str(tmp_path / "re.shm")
    a0 = {"v": np.zeros(8, np.float32)}
    with SharedArrayStore.create(p, a0, slack=1.0) as store:
        g0 = store.generation
        store.publish({"v": np.ones(16, np.float32)})
        assert store.generation > g0
        np.testing.assert_array_equal(
            store.arrays()["v"], np.ones(16, np.float32))


def test_manager_lifecycle(tmp_path):
    mgr = SharedMemoryManager(str(tmp_path / "segs"))
    with mgr.get_or_create("alpha", 256) as seg:
        seg.write(b"a")
    with mgr.get_or_create("beta", 256) as seg:
        seg.write(b"b")
    assert mgr.list_segments() == ["alpha", "beta"]
    stats = mgr.all_stats()
    assert {s.name for s in stats} == {"alpha.shm", "beta.shm"}
    # reattach keeps content
    with mgr.get_or_create("alpha", 256) as seg:
        assert seg.read() == b"a"
    mgr.remove("alpha")
    assert mgr.list_segments() == ["beta"]
    with pytest.raises(ShmError):
        mgr.open("../evil")
    assert mgr.cleanup_unused(max_age_s=0.0) == 1
    assert mgr.list_segments() == []


def test_cross_process_attach(tmp_path):
    """The point of shm: a DIFFERENT process maps the same segment and
    reads the arrays without any serialization."""
    p = str(tmp_path / "xproc.shm")
    arrays = {"x": np.arange(100, dtype=np.float32).reshape(10, 10),
              "ids": np.arange(10, dtype=np.int64) * 3}
    store = SharedArrayStore.create(p, arrays)
    code = (
        "import sys, json, numpy as np\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from codegraph_tpu.core.shm import SharedArrayStore\n"
        f"store = SharedArrayStore.open({p!r})\n"
        "a = store.arrays(copy=False)\n"
        "print(json.dumps({'sum_x': float(a['x'].sum()),"
        " 'ids': a['ids'].tolist(), 'gen': store.generation}))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["sum_x"] == float(np.arange(100, dtype=np.float32).sum())
    assert res["ids"] == (np.arange(10) * 3).tolist()
    assert res["gen"] == 2
    store.close()


def test_flat_index_publish_attach(tmp_path):
    """Serve one resident FlatIndex copy to an attaching reader: search
    results identical through the shared segment."""
    from codegraph_tpu.index.flat import FlatIndex
    from codegraph_tpu.index.snapshot import (
        attach_flat_shm,
        publish_flat_shm,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, 32)).astype(np.float32)
    idx = FlatIndex(32, metric="cosine")
    idx.add(x)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    s_ref, i_ref = idx.search(q, 7)

    p = str(tmp_path / "flat.shm")
    pub = publish_flat_shm(idx, p)
    attached, store = attach_flat_shm(p)
    try:
        s2, i2 = attached.search(q, 7)
        np.testing.assert_array_equal(i2, i_ref)
        np.testing.assert_allclose(s2, s_ref, rtol=1e-6, atol=1e-6)
        assert len(attached) == len(idx)
    finally:
        store.close()
        pub.close()


# ---- hot-reload serving loop (search/service.py ShmServedIndex) --------

def _flat(rows, dim=24, seed=0):
    from codegraph_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(seed)
    idx = FlatIndex(dim, metric="cosine")
    idx.add(rng.standard_normal((rows, dim)).astype(np.float32))
    return idx


def test_publish_republish_monotonic_generation(tmp_path):
    from codegraph_tpu.index.snapshot import publish_flat_shm

    p = str(tmp_path / "serve.shm")
    s1 = publish_flat_shm(_flat(50), p)
    g1 = s1.generation
    s1.close()
    s2 = publish_flat_shm(_flat(60, seed=1), p)  # fits slack: same segment
    assert s2.generation > g1
    s2.close()


def test_shm_served_index_hot_reload(tmp_path):
    from codegraph_tpu.index.snapshot import publish_flat_shm
    from codegraph_tpu.search.service import ShmServedIndex

    p = str(tmp_path / "serve.shm")
    idx1 = _flat(40, seed=2)
    pub = publish_flat_shm(idx1, p)
    served = ShmServedIndex(p, check_every=0.0)
    q = np.asarray(idx1.get_vectors(np.arange(3)))
    _, served_rows = served.search(q, 1)
    np.testing.assert_array_equal(served_rows[:, 0], np.arange(3))
    assert len(served) == 40
    g0 = served.generation

    # daemon republishes a grown index in place
    idx2 = _flat(55, seed=3)
    pub2 = publish_flat_shm(idx2, p)
    assert served.maybe_reload()          # generation bump detected
    assert served.generation > g0
    assert len(served) == 55
    q2 = np.asarray(idx2.get_vectors(np.arange(4)))
    _, rows2 = served.search(q2, 1)
    np.testing.assert_array_equal(rows2[:, 0], np.arange(4))
    pub.close()
    pub2.close()
    served.close()


def test_shm_served_index_recreated_segment(tmp_path):
    """A republish that outgrows capacity recreates the segment IN
    PLACE (same inode!) — the generation must carry forward so the
    reader still detects the change and reloads."""
    from codegraph_tpu.index.snapshot import publish_flat_shm
    from codegraph_tpu.search.service import ShmServedIndex

    p = str(tmp_path / "serve.shm")
    pub = publish_flat_shm(_flat(30, seed=4), p, slack=0.0)
    served = ShmServedIndex(p, check_every=0.0)
    assert len(served) == 30
    g0 = served.generation
    pub.close()
    # 500 rows cannot fit the slack-free 30-row segment: recreate path
    pub2 = publish_flat_shm(_flat(500, seed=5), p)
    assert pub2.generation > g0  # monotonic across recreation
    assert served.maybe_reload()
    assert len(served) == 500
    pub2.close()
    served.close()


def test_shm_served_index_recreated_new_inode(tmp_path):
    """External cleanup + republish (fresh inode, generation restarts)
    is detected by the inode check."""
    import os

    from codegraph_tpu.index.snapshot import publish_flat_shm
    from codegraph_tpu.search.service import ShmServedIndex

    p = str(tmp_path / "serve.shm")
    pub = publish_flat_shm(_flat(30, seed=4), p)
    served = ShmServedIndex(p, check_every=0.0)
    pub.close()
    os.unlink(p)
    pub2 = publish_flat_shm(_flat(80, seed=5), p)
    assert served.maybe_reload()
    assert len(served) == 80
    pub2.close()
    served.close()


def test_query_service_over_shm_served(tmp_path):
    from codegraph_tpu.index.snapshot import publish_flat_shm
    from codegraph_tpu.search.service import QueryService, ShmServedIndex

    p = str(tmp_path / "serve.shm")
    idx = _flat(64, seed=6)
    pub = publish_flat_shm(idx, p)
    served = ShmServedIndex(p, check_every=0.0)
    svc = QueryService(served, k=1, max_batch=8, max_wait_ms=10.0)
    futs = [svc.submit(np.asarray(idx.get_vectors(np.array([i])))[0])
            for i in range(8)]
    got = [f.result(timeout=30)[1][0] for f in futs]
    assert got == list(range(8))
    svc.close()
    pub.close()
    served.close()


def test_int8_index_publish_attach_hot_reload(tmp_path):
    """The 10M-tier int8 index serves over shm too: quantized codes,
    scales, and the rescore matrix round-trip; results identical."""
    from codegraph_tpu.index.int8_flat import Int8FlatIndex
    from codegraph_tpu.index.snapshot import publish_index_shm
    from codegraph_tpu.search.service import ShmServedIndex

    rng = np.random.default_rng(9)
    x = rng.standard_normal((120, 32)).astype(np.float32)
    idx = Int8FlatIndex(32, metric="cosine", rescore_dtype="float32",
                        rescore_k=16)
    idx.add(x)
    q = x[:5] + 0.01
    s_ref, i_ref = idx.search(q, 5)

    p = str(tmp_path / "int8.shm")
    pub = publish_index_shm(idx, p)
    served = ShmServedIndex(p, check_every=0.0)
    s2, i2 = served.search(q, 5)
    np.testing.assert_array_equal(i2, i_ref)
    np.testing.assert_allclose(s2, s_ref, rtol=1e-5, atol=1e-5)
    assert len(served) == 120

    # republish with more rows; reader hot-swaps
    idx.add(rng.standard_normal((40, 32)).astype(np.float32))
    pub2 = publish_index_shm(idx, p)
    assert served.maybe_reload()
    assert len(served) == 160
    pub.close()
    pub2.close()
    served.close()


def test_manager_get_or_create_grows_capacity(tmp_path):
    mgr = SharedMemoryManager(str(tmp_path / "segs"))
    with mgr.get_or_create("g", 64) as seg:
        seg.write(b"x" * 64)
        g0 = seg.generation
    with mgr.get_or_create("g", 4096) as seg:
        assert seg.capacity >= 4096
        assert seg.generation >= g0  # carried forward, not reset
        seg.write(b"y" * 4096)       # fits the grown segment
        assert seg.read() == b"y" * 4096


# ---- IVF-PQ capacity tier over shm (round-3: all tiers shm-served) ------


def _ivfpq(rows=256, dim=32, seed=0):
    from codegraph_tpu.index.ivfpq import IVFPQIndex

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((rows, dim)).astype(np.float32)
    idx = IVFPQIndex(dim, nlist=8, nprobe=8, m=8, refine="int8",
                     kmeans_iters=4, pq_iters=4, train_sample=rows)
    idx.train(x)
    idx.add(x)
    return idx, x


def test_ivfpq_publish_attach_identical_results(tmp_path):
    from codegraph_tpu.index.snapshot import (
        attach_index_shm,
        publish_index_shm,
    )

    idx, x = _ivfpq()
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    s_ref, i_ref = idx.search(q, 5)

    p = str(tmp_path / "ivfpq.shm")
    pub = publish_index_shm(idx, p)
    attached, store = attach_index_shm(p)
    try:
        assert type(attached).__name__ == "IVFPQIndex"
        assert attached.refine == "int8" and attached._raw_chunks
        s2, i2 = attached.search(q, 5)
        np.testing.assert_array_equal(i2, i_ref)
        np.testing.assert_allclose(s2, s_ref, rtol=1e-5, atol=1e-5)
        assert len(attached) == len(idx)
    finally:
        store.close()
        pub.close()


def test_ivfpq_subprocess_attach(tmp_path):
    """A separate process attaches the published IVF-PQ segment and
    reproduces the publisher's search result."""
    import subprocess
    import sys

    from codegraph_tpu.index.snapshot import publish_index_shm

    idx, x = _ivfpq()
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    _, i_ref = idx.search(q, 3)
    p = str(tmp_path / "ivfpq.shm")
    qp = str(tmp_path / "q.npy")
    np.save(qp, q)
    pub = publish_index_shm(idx, p)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys, json, numpy as np\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from codegraph_tpu.index.snapshot import attach_index_shm\n"
        f"idx, store = attach_index_shm({p!r}, copy=True)\n"
        f"q = np.load({qp!r})\n"
        "s, i = idx.search(q, 3)\n"
        "print(json.dumps({'ids': np.asarray(i).tolist()}))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    res = json.loads(out.stdout.strip().splitlines()[-1])
    np.testing.assert_array_equal(np.asarray(res["ids"]), i_ref)
    pub.close()


def test_ivfpq_shm_hot_reload(tmp_path):
    """ShmServedIndex hot-swaps a republished IVF-PQ segment."""
    from codegraph_tpu.index.snapshot import publish_index_shm
    from codegraph_tpu.search.service import ShmServedIndex

    idx1, x1 = _ivfpq(rows=192, seed=3)
    p = str(tmp_path / "serve.shm")
    pub = publish_index_shm(idx1, p)
    served = ShmServedIndex(p, check_every=0.0)
    assert len(served) == 192
    g0 = served.generation

    idx2, x2 = _ivfpq(rows=224, seed=4)
    pub2 = publish_index_shm(idx2, p)
    q = np.asarray(x2[:2])
    s, rows = served.search(q, 1)
    assert served.generation > g0 or served.reloads >= 2
    assert len(served) == 224
    # nearest neighbor of a corpus row is itself
    np.testing.assert_array_equal(rows[:, 0], np.arange(2))
    served.close()
    pub.close()
    pub2.close()
