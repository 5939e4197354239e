"""Sweep qmajor streaming-top-k tile shapes for the flat-scan headline.

Round-1 found tn=2048 / B=2048 optimal and recorded 29.2k QPS at
1M x 768 bf16 with tile_b=64. The MXU is a 128x128 systolic array — a
64-row query tile leaves half the array idle; this sweeps tile_b and
tile_n around the recorded optimum.

Run ON TPU: python benchmarks/kernel_tile_sweep.py
Writes .bench/kernel_tile_sweep.json
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from codegraph_tpu.ops.similarity import l2_normalize
from codegraph_tpu.ops.topk import streaming_topk_pallas_qmajor

RESULTS = {}


def main():
    print("devices:", jax.devices(), flush=True)
    N, D, B, K = 1_048_576, 768, 2048, 10
    x = l2_normalize(jax.random.normal(
        jax.random.PRNGKey(0), (N, D), jnp.float32)).astype(jnp.bfloat16)
    jax.block_until_ready(x)
    rng = np.random.default_rng(0)
    bias = jnp.zeros((N,), jnp.float32)

    # pre-stage ALL query batches device-side: a per-iteration 6 MB
    # host->device transfer over the dev tunnel costs ~100-150 ms and
    # pollutes single-shot timings 2-3x (first sweep measured 9.6k QPS
    # where bench.py's pre-staged loop measures 27.6k)
    REPS = 3
    qs = l2_normalize(jax.random.normal(
        jax.random.PRNGKey(7), (REPS + 1, B, D), jnp.float32)
    ).astype(jnp.bfloat16)
    np.asarray(qs[0, 0])  # force staging to finish (host fetch = sync)

    for tile_b in (64, 128, 256, 512):
        for tile_n in (1024, 2048, 4096):
            name = f"tb{tile_b}_tn{tile_n}"
            try:
                s, i = streaming_topk_pallas_qmajor(
                    qs[REPS], x, bias, K, tile_n=tile_n, tile_b=tile_b)
                np.asarray(s)  # compile + run
                ts = []
                for r in range(REPS):
                    t0 = time.perf_counter()
                    s, i = streaming_topk_pallas_qmajor(
                        qs[r], x, bias, K, tile_n=tile_n, tile_b=tile_b)
                    np.asarray(s)
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                RESULTS[name] = {"t_ms": round(dt * 1e3, 2),
                                 "qps": round(B / dt, 1)}
                print(name, RESULTS[name], flush=True)
            except Exception as e:
                RESULTS[name] = {"error": str(e).split(chr(10))[0][:200]}
                print(name, "FAIL:", str(e)[:150], flush=True)

    os.makedirs(".bench", exist_ok=True)
    with open(".bench/kernel_tile_sweep.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
