"""Probe the query-RESIDENT kernels at the headline config.

Floor analysis (.bench/kernel_r3_int8.json) showed the qmajor kernels
are HBM-bound on query-tile re-fetch; qres pins the whole batch in VMEM.
Writes .bench/kernel_qres.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "kernel_qres.json")


def main():
    from codegraph_tpu.ops.quantize import (
        quantize_rows,
        streaming_topk_int8_qres,
    )
    from codegraph_tpu.ops.topk import exact_topk, streaming_topk_pallas_qres

    N, D, B, K = 999424, 768, 2048, 10
    iters = 3
    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True),
                                      1e-12))
    xb = x.astype(jnp.bfloat16)
    qs_all = jax.random.normal(kq, (iters + 1, B, D), jnp.float32)
    qs_all = qs_all * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(qs_all * qs_all, -1, keepdims=True), 1e-12))
    qb = [qs_all[i].astype(jnp.bfloat16) for i in range(iters + 1)]
    bias = jnp.zeros((N,), jnp.float32)

    results = {}

    def timed(fn, inputs):
        np.asarray(fn(inputs[-1])[0])
        best = float("inf")
        for it in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn(inputs[it])[0])
            best = min(best, time.perf_counter() - t0)
        return best

    for tile_n, tile_b in ((512, 256), (1024, 256), (1024, 512),
                           (2048, 256)):
        name = f"bf16_qres_tn{tile_n}_tb{tile_b}"
        try:
            dt = timed(lambda qq, tn=tile_n, tb=tile_b:
                       streaming_topk_pallas_qres(
                           qq, xb, bias, K, tile_n=tn, tile_b=tb), qb)
            results[name] = {"ms": round(dt * 1e3, 2),
                             "qps": round(B / dt, 1)}
        except Exception as e:
            results[name] = {"error": str(e)[:160]}
        print(name, results[name], flush=True)

    xq, xs = quantize_rows(x)
    xq.block_until_ready()
    qv_all, qsc_all = [], []
    for i in range(iters + 1):
        qv, qsc = quantize_rows(qs_all[i])
        qv_all.append(qv)
        qsc_all.append(qsc)
    for tile_n, tile_b in ((1024, 256), (2048, 256), (2048, 512),
                           (4096, 256)):
        name = f"int8_qres_tn{tile_n}_tb{tile_b}"
        try:
            def fn(i, tn=tile_n, tb=tile_b):
                return streaming_topk_int8_qres(
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
            results[name] = {"error": str(e)[:160]}
        print(name, results[name], flush=True)

    # exactness on-device
    q0 = qb[0][:256]
    se, ie = exact_topk(q0, xb, K, bias)
    sp, ip = streaming_topk_pallas_qres(q0, xb, bias, K,
                                        tile_n=1024, tile_b=128)
    results["exact_id_match_bf16"] = bool(
        jnp.mean((ie == ip).astype(jnp.float32)) > 0.999)
    print("exact_id_match_bf16:", results["exact_id_match_bf16"], flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
