import concurrent.futures as cf

import numpy as np
import pytest

from codegraph_tpu.index.flat import FlatIndex
from codegraph_tpu.search.service import QueryService


def test_query_service_batches_concurrent_queries(rng):
    D, N = 32, 300
    x = rng.standard_normal((N, D)).astype(np.float32)
    index = FlatIndex(D, tile_n=128, backend="xla")
    rows = index.add(x)
    svc = QueryService(index, k=5, max_batch=16, max_wait_ms=5.0)
    try:
        futures = [svc.submit(x[i]) for i in range(40)]
        results = [f.result(timeout=60) for f in futures]
        for i, (scores, got_rows) in enumerate(results):
            assert got_rows[0] == rows[i]  # self-hit
        assert svc.stats.queries == 40
        # batching actually happened (fewer batches than queries)
        assert svc.stats.batches < 40
        assert svc.stats.max_batch_seen > 1
    finally:
        svc.close()


def test_query_service_pipelined_workers(rng):
    """workers>1: concurrent flushes stay correct (results match the
    single-worker path) and back-pressure keeps the service draining."""
    D, N = 32, 300
    x = rng.standard_normal((N, D)).astype(np.float32)
    index = FlatIndex(D, tile_n=128, backend="xla")
    rows = index.add(x)
    svc = QueryService(index, k=5, max_batch=8, max_wait_ms=1.0, workers=4)
    try:
        futures = [svc.submit(x[i]) for i in range(64)]
        results = [f.result(timeout=60) for f in futures]
        for i, (scores, got_rows) in enumerate(results):
            assert got_rows[0] == rows[i]  # self-hit survives concurrency
        assert svc.stats.queries == 64
        assert svc.stats.batches >= 64 // 8
    finally:
        svc.close()


def test_query_service_pipelined_error_propagates(rng):
    class BrokenIndex:
        def search(self, q, k):
            raise RuntimeError("index down")

    svc = QueryService(BrokenIndex(), k=3, max_wait_ms=1.0, workers=3)
    try:
        with pytest.raises(RuntimeError, match="index down"):
            svc.search(np.zeros(8, np.float32), timeout=30)
    finally:
        svc.close()


def test_query_service_sync_and_error(rng):
    class BrokenIndex:
        def search(self, q, k):
            raise RuntimeError("index down")

    svc = QueryService(BrokenIndex(), k=3, max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="index down"):
            svc.search(np.zeros(8, np.float32), timeout=30)
    finally:
        svc.close()


def test_query_service_admission_control(rng):
    """Submits beyond max_pending shed with ServiceOverloaded and are
    counted; queued queries still complete."""
    import threading

    from codegraph_tpu.search.service import ServiceOverloaded

    release = threading.Event()

    class SlowIndex:
        def search(self, q, k):
            release.wait(10)
            return (np.zeros((q.shape[0], k), np.float32),
                    np.zeros((q.shape[0], k), np.int32))

    svc = QueryService(SlowIndex(), k=3, max_batch=4, max_wait_ms=1.0,
                       max_pending=6)
    try:
        futures = []
        shed = 0
        for _ in range(40):
            try:
                futures.append(svc.submit(np.zeros(8, np.float32)))
            except ServiceOverloaded:
                shed += 1
        assert shed > 0
        assert svc.stats.shed == shed
        assert svc.queue_depth() <= 6
        release.set()
        for f in futures:
            f.result(timeout=30)
    finally:
        release.set()
        svc.close()


def test_query_service_queue_deadline(rng):
    """Queries older than queue_timeout_ms fail with TimeoutError at
    flush instead of occupying batch rows."""
    import threading
    import time as _time

    gate = threading.Event()

    class GatedIndex:
        def search(self, q, k):
            return (np.zeros((q.shape[0], k), np.float32),
                    np.zeros((q.shape[0], k), np.int32))

    svc = QueryService(GatedIndex(), k=3, max_batch=4, max_wait_ms=80.0,
                       queue_timeout_ms=10.0)
    try:
        fut = svc.submit(np.zeros(8, np.float32))
        # the collector sleeps max_wait (80 ms) before flushing a
        # non-full batch, so the 10 ms deadline has long passed
        with pytest.raises(TimeoutError):
            fut.result(timeout=30)
        assert svc.stats.expired == 1
    finally:
        svc.close()


def test_query_service_pad_buckets(rng):
    """Flushes pad to the SMALLEST bucket that fits (light load rides
    cheap small shapes); warm() compiles every bucket; the last bucket
    must equal max_batch."""
    shapes = []

    class RecordingIndex:
        def search(self, q, k):
            shapes.append(q.shape[0])
            return (np.zeros((q.shape[0], k), np.float32),
                    np.zeros((q.shape[0], k), np.int32))

    svc = QueryService(RecordingIndex(), k=3, max_batch=32,
                       max_wait_ms=30.0, pad_buckets=(4, 32))
    try:
        svc.warm(8)
        assert shapes == [4, 32]
        shapes.clear()
        # 2 queries -> smallest bucket (4), not max_batch
        futs = [svc.submit(np.zeros(8, np.float32)) for _ in range(2)]
        for f in futs:
            f.result(timeout=30)
        assert shapes == [4]
        shapes.clear()
        # 10 queries -> next bucket up (32)
        futs = [svc.submit(np.zeros(8, np.float32)) for _ in range(10)]
        for f in futs:
            f.result(timeout=30)
        # every flush lands on a compiled bucket shape, never in between
        assert shapes and set(shapes) <= {4, 32}
    finally:
        svc.close()

    with pytest.raises(ValueError, match="pad_buckets"):
        QueryService(RecordingIndex(), k=3, max_batch=32,
                     pad_buckets=(4, 16))


def test_query_service_auto_policy(rng):
    """auto() picks the measured per-tier policy: big batches for
    corpus-bound scans, small batches + more workers for IVF tiers."""
    D = 32
    x = rng.standard_normal((256, D)).astype(np.float32)
    flat = FlatIndex(D, tile_n=128, backend="xla")
    rows = flat.add(x)
    svc = QueryService.auto(flat, k=5)
    try:
        assert svc.max_batch == QueryService.POLICIES["scan"]["max_batch"]
        scores, got = svc.search(x[3])
        assert got[0] == rows[3]
    finally:
        svc.close()

    from codegraph_tpu.index.ivf import IVFIndex

    ivf = IVFIndex(D, nlist=8, nprobe=4)
    pol = QueryService.policy_for(ivf)
    assert pol == QueryService.POLICIES["ivf"]

    # ShmServedIndex-style wrappers unwrap to the underlying tier
    class Wrapper:
        def __init__(self, idx):
            self._idx = idx

    assert QueryService.policy_for(Wrapper(ivf)) == \
        QueryService.POLICIES["ivf"]
