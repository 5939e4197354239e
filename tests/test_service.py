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
