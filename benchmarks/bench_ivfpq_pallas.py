"""TPU benchmark: per-cell-DMA Pallas ADC kernel vs XLA gather path.

Round-2 VERDICT item 2 target: >= 1k QPS per-query probing at 10M x 768
(vs 17-32 QPS for the XLA gather path in round 1) at unchanged recall
(exact-match to the XLA kernel is tested in tests/test_ivfpq_index.py;
here we verify it on-device too).

The 10M index arrays are SYNTHESIZED on-device (random codes/ids):
kernel QPS does not depend on data values, and a real 10M build costs
~50 min over the dev tunnel (the transfers, not the TPU).

Run ON TPU: python benchmarks/bench_ivfpq_pallas.py
Writes .bench/ivfpq_pallas.json
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from codegraph_tpu.index.ivfpq import (
    IVFPQIndex,
    ivfpq_search_kernel,
    ivfpq_search_pallas,
)
from codegraph_tpu.ops.similarity import l2_normalize

RESULTS = {}


def fetch(x):
    return np.asarray(x)


def timeit(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        for o in out:
            fetch(o)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def small_exactness():
    """On-device exact-match of the Pallas kernel vs the XLA path."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3000, 64)).astype(np.float32)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    idx = IVFPQIndex(64, nlist=8, nprobe=4, m=32, kmeans_iters=4, pq_iters=4)
    idx.train(x)
    idx.add(x)
    qn = l2_normalize(jnp.asarray(q))
    s_ref, i_ref = ivfpq_search_kernel(
        qn, idx._centroids, idx._x, idx._ids, idx._bias, idx._books, 10, 4)
    s_pl, i_pl = ivfpq_search_pallas(
        qn, idx._centroids, idx._x, idx._ids, idx._bias, idx._books, 10, 4)
    ok_i = bool((fetch(i_pl) == fetch(i_ref)).all())
    ok_s = bool(np.allclose(fetch(s_pl), fetch(s_ref), rtol=1e-4, atol=1e-4))
    RESULTS["exact_match_on_device"] = {"ids": ok_i, "scores": ok_s}
    print("on-device exact match:", ok_i, ok_s)
    assert ok_i and ok_s


def synth_index(nlist, cap, m, D, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    codes = jax.random.randint(k1, (nlist, m, cap), 0, 256, jnp.int32).astype(
        jnp.uint8)
    ids = jnp.arange(nlist * cap, dtype=jnp.int32).reshape(nlist, cap)
    bias = jnp.zeros((nlist, cap), jnp.float32)
    cents = l2_normalize(jax.random.normal(k2, (nlist, D), jnp.float32))
    dsub = D // m
    books = jax.random.normal(k3, (m, 256, dsub), jnp.float32) * 0.05
    return codes, ids, bias, cents, books


def bench_10m():
    nlist, cap, m, D = 4096, 2560, 96, 768  # 10.49M padded rows, 1.0GB codes
    codes, ids, bias, cents, books = synth_index(nlist, cap, m, D)
    jax.block_until_ready(codes)
    rng = np.random.default_rng(1)
    n_rows_equiv = nlist * cap

    for B in (64, 256):
        for nprobe in (8, 16):
            q = l2_normalize(jnp.asarray(
                rng.standard_normal((B, D)).astype(np.float32)))
            name = f"pallas_B{B}_np{nprobe}"
            t_ms = None
            try:
                # warm compile
                fetch(ivfpq_search_pallas(
                    q, cents, codes, ids, bias, books, 10, nprobe)[0])
                def run():
                    qq = l2_normalize(jnp.asarray(
                        rng.standard_normal((B, D)).astype(np.float32)))
                    return ivfpq_search_pallas(
                        qq, cents, codes, ids, bias, books, 10, nprobe)
                t = timeit(run, reps=3)
                t_ms = t * 1e3
                RESULTS[name] = {
                    "t_ms": round(t_ms, 2),
                    "qps": round(B / t, 1),
                    "rows": n_rows_equiv,
                }
                print(name, f"{t_ms:.1f} ms -> {B/t:.0f} QPS")
            except Exception as e:
                RESULTS[name] = {"error": str(e).split(chr(10))[0][:300]}
                print(name, "FAIL:", str(e)[:200])

    # XLA reference path at one config for the speedup ratio
    B, nprobe = 64, 8
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((B, D)).astype(np.float32)))
    try:
        fetch(ivfpq_search_kernel(
            q, cents, codes, ids, bias, books, 10, nprobe)[0])
        def run():
            qq = l2_normalize(jnp.asarray(
                rng.standard_normal((B, D)).astype(np.float32)))
            return ivfpq_search_kernel(
                qq, cents, codes, ids, bias, books, 10, nprobe)
        t = timeit(run, reps=2)
        RESULTS[f"xla_B{B}_np{nprobe}"] = {
            "t_ms": round(t * 1e3, 2), "qps": round(B / t, 1)}
        print(f"xla_B{B}_np{nprobe}", f"{t*1e3:.1f} ms -> {B/t:.0f} QPS")
    except Exception as e:
        RESULTS[f"xla_B{B}_np{nprobe}"] = {"error": str(e)[:300]}
        print("xla FAIL:", str(e)[:200])


def main():
    print("devices:", jax.devices())
    small_exactness()
    bench_10m()
    os.makedirs(".bench", exist_ok=True)
    with open(".bench/ivfpq_pallas.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
