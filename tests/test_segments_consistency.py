import numpy as np
import pytest

from codegraph_tpu.graph.consistency import (
    ConsistencyManager,
    IsolationLevel,
    Operation,
    TxnState,
)
from codegraph_tpu.index.segments import SegmentedIndex


def cosine_oracle(q, x, k):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    s = qn @ xn.T
    return np.argsort(-s, axis=1)[:, :k]


def test_segmented_add_seal_search(rng):
    D = 32
    idx = SegmentedIndex(D, seal_threshold=100)
    a = rng.standard_normal((250, D)).astype(np.float32)  # forces sealing
    rows = idx.add(a[:90])
    rows2 = idx.add(a[90:200])  # crosses the threshold -> seal
    rows3 = idx.add(a[200:])
    assert len(idx) == 250
    stats = idx.stats()
    assert sum(1 for s in stats if s.sealed) >= 1
    all_rows = np.concatenate([rows, rows2, rows3])
    q = a[:5]
    s, i = idx.search(q, 5)
    # self-hit across segment boundary
    np.testing.assert_array_equal(i[:, 0], all_rows[:5])


def test_segmented_matches_oracle_across_segments(rng):
    D, k = 24, 8
    idx = SegmentedIndex(D, seal_threshold=60)
    x = rng.standard_normal((200, D)).astype(np.float32)
    rows = idx.add(x)
    q = rng.standard_normal((4, D)).astype(np.float32)
    s, i = idx.search(q, k)
    ref = cosine_oracle(q, x, k)
    got_logical = np.searchsorted(rows, i)  # rows are increasing per segment
    # map global rows back to input order via the rows array
    row_to_pos = {int(r): p for p, r in enumerate(rows)}
    got = np.vectorize(lambda r: row_to_pos[int(r)])(i)
    np.testing.assert_array_equal(got, ref)


def test_segmented_delete_and_compact(rng):
    D = 16
    idx = SegmentedIndex(D, seal_threshold=50, compact_min_segments=2)
    x = rng.standard_normal((140, D)).astype(np.float32)
    # three separate appends -> each crosses the threshold -> 3 sealed segs
    rows = np.concatenate([idx.add(x[:50]), idx.add(x[50:100]),
                           idx.add(x[100:])])
    idx.seal_active()
    idx.delete(rows[:70])
    assert len(idx) == 70
    assert idx.should_compact()
    remap = idx.compact()
    assert len(idx) == 70
    # deleted rows are gone from the remap; survivors are remapped
    assert int(rows[0]) not in remap
    assert int(rows[100]) in remap
    # search still finds survivors (query with survivor vectors)
    s, i = idx.search(x[100:103], 3)
    expect = [remap[int(r)] for r in rows[100:103]]
    np.testing.assert_array_equal(i[:, 0], expect)


def test_txn_commit_flow():
    mgr = ConsistencyManager()
    state = {"x": 0}
    txn = mgr.begin()
    txn.stage(Operation("add", "file:a.py", lambda: state.__setitem__("x", 1),
                        undo=lambda: state.__setitem__("x", 0)))
    assert mgr.prepare(txn)
    v = mgr.commit(txn)
    assert v == 1 and state["x"] == 1
    assert txn.state == TxnState.COMMITTED
    assert mgr.txn_log[-1]["version"] == 1


def test_txn_lock_conflict_aborts():
    mgr = ConsistencyManager()
    t1, t2 = mgr.begin(), mgr.begin()
    t1.stage(Operation("add", "file:a.py", lambda: None))
    t2.stage(Operation("delete", "file:a.py", lambda: None))
    assert mgr.prepare(t1)
    assert not mgr.prepare(t2)  # conflict
    assert t2.state == TxnState.ABORTED
    mgr.commit(t1)
    t3 = mgr.begin()
    t3.stage(Operation("delete", "file:a.py", lambda: None))
    assert mgr.prepare(t3)  # lock released after commit


def test_txn_apply_failure_rolls_back():
    mgr = ConsistencyManager()
    state = {"applied": []}

    def boom():
        raise RuntimeError("disk full")

    txn = mgr.begin()
    txn.stage(Operation("add", "k1", lambda: state["applied"].append(1),
                        undo=lambda: state["applied"].pop()))
    txn.stage(Operation("add", "k2", boom))
    assert mgr.prepare(txn)
    with pytest.raises(RuntimeError):
        mgr.commit(txn)
    assert txn.state == TxnState.ABORTED
    assert state["applied"] == []  # rolled back
    assert mgr.version == 0


def test_snapshot_visibility():
    mgr = ConsistencyManager()
    t_old = mgr.begin(IsolationLevel.SNAPSHOT)
    # a later committed write
    t_w = mgr.begin()
    t_w.stage(Operation("add", "k", lambda: None))
    mgr.prepare(t_w)
    v = mgr.commit(t_w)
    assert not mgr.is_visible(t_old, v)       # snapshot: invisible
    t_rc = mgr.begin(IsolationLevel.READ_COMMITTED)
    assert mgr.is_visible(t_rc, v)
    cp = mgr.checkpoint("after-write")
    assert cp.version == 1
