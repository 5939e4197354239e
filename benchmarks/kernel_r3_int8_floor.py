"""Round-3 part 2: int8 sweep (device-side quantize) + kernel floor probe.

The first sweep's int8 phase round-tripped the 3GB corpus through the
host (np.asarray) and wedged for >30 min on this tunnel — quantize_rows
is pure jnp, so everything here stays device-resident.

Also decomposes the qmajor kernel's time (see kernel_floor.py docstring):
floor = matmul+grid only, lanepass = +fused lane-reduce, full = shipped.
Writes .bench/kernel_r3_int8.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "kernel_r3_int8.json")


def main():
    from kernel_floor import probe

    from codegraph_tpu.ops.quantize import (
        quantize_rows,
        streaming_topk_int8_qmajor,
    )
    from codegraph_tpu.ops.topk import (
        exact_topk,
        streaming_topk_pallas_qmajor,
    )

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
    bias = jnp.zeros((N,), jnp.float32)

    results = {}

    # ---- int8 sweep, all quantization ON DEVICE ----
    xq, xs = quantize_rows(x)          # jnp in, jnp out — stays on chip
    xq.block_until_ready()
    qv_all, qsc_all = [], []
    for i in range(iters + 1):
        qv, qsc = quantize_rows(qs_all[i])
        qv_all.append(qv)
        qsc_all.append(qsc)
    print("int8 corpus quantized on-device", flush=True)

    for tile_n, tile_b in ((1024, 256), (2048, 128), (2048, 256),
                           (4096, 128)):
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
            results[name] = {"error": str(e)[:160]}
        print(name, results[name], flush=True)

    # ---- bf16 floor probes ----
    qb = [qs_all[i].astype(jnp.bfloat16) for i in range(iters + 1)]

    def timed(fn):
        np.asarray(fn(qb[-1]))
        best = float("inf")
        for it in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn(qb[it]))
            best = min(best, time.perf_counter() - t0)
        return best

    for tile_n, tile_b in ((1024, 256), (1024, 512), (512, 512)):
        for mode in ("floor", "lanepass"):
            name = f"{mode}_tn{tile_n}_tb{tile_b}"
            try:
                dt = timed(lambda qq, tn=tile_n, tb=tile_b, m=mode:
                           probe(qq, xb, bias, tn, tb, m))
                results[name] = {"ms": round(dt * 1e3, 2),
                                 "qps": round(B / dt, 1)}
            except Exception as e:
                results[name] = {"error": str(e)[:160]}
            print(name, results[name], flush=True)
        name = f"full_tn{tile_n}_tb{tile_b}"
        try:
            dt = timed(lambda qq, tn=tile_n, tb=tile_b:
                       streaming_topk_pallas_qmajor(
                           qq, xb, bias, K, tile_n=tn, tile_b=tb)[0])
            results[name] = {"ms": round(dt * 1e3, 2),
                             "qps": round(B / dt, 1)}
        except Exception as e:
            results[name] = {"error": str(e)[:160]}
        print(name, results[name], flush=True)

    # ---- exactness spot-check on-device ----
    q0 = qb[0][:64]
    se, ie = exact_topk(q0, xb, K, bias)
    sp, ip = streaming_topk_pallas_qmajor(q0, xb, bias, K,
                                          tile_n=1024, tile_b=64)
    results["exact_id_match_bf16"] = bool(
        jnp.mean((ie == ip).astype(jnp.float32)) > 0.999)
    print("exact_id_match_bf16:", results["exact_id_match_bf16"], flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
