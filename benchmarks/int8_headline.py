"""Int8 exact scan at the HEADLINE config (1M x 768, B=2048): the bf16
headline runs ~29k QPS at 22% MXU; int8 doubles MXU throughput and
halves HBM traffic, and measured 6,044 QPS at 10M rows (round 1), so
the 1M point should sit well above the bf16 number. Rescore via the
Int8FlatIndex f32 path is measured separately (the serving config).

Run ON TPU: python benchmarks/int8_headline.py
Writes .bench/int8_headline.json
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from codegraph_tpu.ops.quantize import quantize_rows, streaming_topk_int8_qmajor
from codegraph_tpu.ops.similarity import l2_normalize

RESULTS = {}


def main():
    print("devices:", jax.devices(), flush=True)
    N, D, B, K = 1_048_576, 768, 2048, 10
    REPS = 4
    x = l2_normalize(jax.random.normal(
        jax.random.PRNGKey(0), (N, D), jnp.float32))
    xv, xs = quantize_rows(x)
    jax.block_until_ready(xv)
    bias = jnp.zeros((N,), jnp.float32)
    qs_all = l2_normalize(jax.random.normal(
        jax.random.PRNGKey(7), (REPS + 1, B, D), jnp.float32))
    qv_all, qs_scale_all = [], []
    for r in range(REPS + 1):
        qv, qsc = quantize_rows(qs_all[r])
        qv_all.append(qv)
        qs_scale_all.append(qsc)
    np.asarray(qv_all[0][0])  # sync staging

    for tile_b in (128, 256):
        name = f"int8_1M_tb{tile_b}"
        try:
            s, i = streaming_topk_int8_qmajor(
                qv_all[REPS], qs_scale_all[REPS], xv, xs, bias, K,
                tile_n=2048, tile_b=tile_b)
            np.asarray(s)  # compile + warm
            ts = []
            for r in range(REPS):
                t0 = time.perf_counter()
                s, i = streaming_topk_int8_qmajor(
                    qv_all[r], qs_scale_all[r], xv, xs, bias, K,
                    tile_n=2048, tile_b=tile_b)
                np.asarray(s)
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            RESULTS[name] = {"t_ms": round(dt * 1e3, 2),
                             "qps": round(B / dt, 1)}
            print(name, RESULTS[name], flush=True)
        except Exception as e:
            RESULTS[name] = {"error": str(e).split(chr(10))[0][:200]}
            print(name, "FAIL:", str(e)[:150], flush=True)

    # recall vs the exact f32 scan (int8 quantization error only)
    from codegraph_tpu.ops.topk import streaming_topk

    _, exact_i = streaming_topk(qs_all[0], x, bias, K, tile_n=2048)
    _, got_i = streaming_topk_int8_qmajor(
        qv_all[0], qs_scale_all[0], xv, xs, bias, K,
        tile_n=2048, tile_b=256)
    ei, gi = np.asarray(exact_i), np.asarray(got_i)
    rec = float(np.mean([len(set(a) & set(b)) / K for a, b in zip(gi, ei)]))
    RESULTS["recall_at10_vs_f32"] = round(rec, 4)
    print("recall@10 vs f32 exact:", rec, flush=True)

    os.makedirs(".bench", exist_ok=True)
    with open(".bench/int8_headline.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
