"""Round-3 kernel sweep: lane-reduced merge vs the round-2 headline.

Measures the query-major flat scan (bf16 + int8) at the headline config
(1M x 768, B=2048, k=10) across tile shapes, on the real chip. Timing
follows CLAUDE.md: host fetches for sync, distinct query batches per
repeat (transport result-caching), min-of-3.

Writes .bench/kernel_r3_sweep.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "kernel_r3_sweep.json")


def timed(fn, batches, iters=3):
    np.asarray(fn(batches[-1])[0])  # compile + warm
    best = float("inf")
    for it in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(batches[it])[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from codegraph_tpu.ops.quantize import quantize_rows, streaming_topk_int8_qmajor
    from codegraph_tpu.ops.topk import (
        streaming_topk_pallas_qmajor,
        streaming_topk_pallas_qmajor_xt,
    )

    N, D, B, K = 999424, 768, 2048, 10
    iters = 3
    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-12))
    xb = x.astype(jnp.bfloat16)
    qs_all = jax.random.normal(kq, (iters + 1, B, D), jnp.float32)
    qs_all = qs_all * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(qs_all * qs_all, -1, keepdims=True), 1e-12))
    qb_all = [qs_all[i].astype(jnp.bfloat16) for i in range(iters + 1)]
    bias = jnp.zeros((N,), jnp.float32)

    results = {}

    # bf16 qmajor sweep
    for tile_n in (1024, 2048):
        for tile_b in (128, 256):
            name = f"bf16_qmajor_tn{tile_n}_tb{tile_b}"
            try:
                dt = timed(
                    lambda q, tn=tile_n, tb=tile_b:
                        streaming_topk_pallas_qmajor(
                            q, xb, bias, K, tile_n=tn, tile_b=tb),
                    qb_all, iters)
                results[name] = {"ms": round(dt * 1e3, 2),
                                 "qps": round(B / dt, 1)}
            except Exception as e:  # VMEM OOM at some tiles
                results[name] = {"error": str(e)[:200]}
            print(name, results[name], flush=True)

    # int8 qmajor sweep
    xq, xs = quantize_rows(np.asarray(x))
    xq, xs = jnp.asarray(xq), jnp.asarray(xs)
    qv_all, qsc_all = [], []
    for i in range(iters + 1):
        qv, qsc = quantize_rows(np.asarray(qs_all[i]))
        qv_all.append(jnp.asarray(qv))
        qsc_all.append(jnp.asarray(qsc))
    for tile_n in (2048, 4096):
        for tile_b in (128, 256):
            name = f"int8_qmajor_tn{tile_n}_tb{tile_b}"
            try:
                def fn(i, tn=tile_n, tb=tile_b):
                    return streaming_topk_int8_qmajor(
                        qv_all[i], qsc_all[i], xq, xs, bias, K,
                        tile_n=tn, tile_b=tb)
                np.asarray(fn(iters)[0])
                best = float("inf")
                for it in range(iters):
                    t0 = time.perf_counter()
                    np.asarray(fn(it)[0])
                    best = min(best, time.perf_counter() - t0)
                results[name] = {"ms": round(best * 1e3, 2),
                                 "qps": round(B / best, 1)}
            except Exception as e:
                results[name] = {"error": str(e)[:200]}
            print(name, results[name], flush=True)

    # correctness spot-check on-device vs exact scan (bf16, small slice)
    from codegraph_tpu.ops.topk import exact_topk
    q0 = qb_all[0][:64]
    se, ie = exact_topk(q0, xb, K, bias)
    sp, ip = streaming_topk_pallas_qmajor(q0, xb, bias, K,
                                          tile_n=2048, tile_b=64)
    match = bool(jnp.mean((ie == ip).astype(jnp.float32)) > 0.999)
    results["exact_id_match_bf16"] = match
    print("exact_id_match_bf16:", match, flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
