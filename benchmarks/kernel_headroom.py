"""Sweep qmajor kernel variants for headroom: row-major vs transposed
corpus, tile_n scaling. Run on real TPU. Timing: distinct query batches
per iter + host fetch (transport result-caches identical dispatches and
block_until_ready returns early)."""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.ops.topk import (
        streaming_topk_pallas_qmajor,
        streaming_topk_pallas_qmajor_xt,
    )

    N, D, B, K = 995_328, 768, 2048, 10  # multiple of 2048 AND 4096
    iters = 4
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-12))
    x = x.astype(dtype)
    xt = x.T.copy()  # materialize [D, N] once
    qs = jax.random.normal(kq, (iters + 1, B, D), jnp.float32)
    qs = qs * jax.lax.rsqrt(jnp.maximum(jnp.sum(qs * qs, -1, keepdims=True), 1e-12))
    qs = qs.astype(dtype)
    bias = jnp.zeros((N,), jnp.float32)
    results = {}

    def timed(name, fn):
        try:
            np.asarray(fn(qs[iters])[0])  # compile + warm
            t0 = time.perf_counter()
            for it in range(iters):
                np.asarray(fn(qs[it])[0])
            dt = time.perf_counter() - t0
            qps = B * iters / dt
            results[name] = round(qps, 1)
            print(f"{name}: {qps:,.0f} qps", flush=True)
        except Exception as e:  # VMEM OOM etc.
            results[name] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    for tile_n in (2048, 4096):
        timed(f"qmajor_tn{tile_n}_tb256",
              lambda q, tn=tile_n: streaming_topk_pallas_qmajor(
                  q, x, bias, K, tile_n=tn, tile_b=256))
    for tile_n in (2048, 4096):
        timed(f"qmajor_xt_tn{tile_n}_tb256",
              lambda q, tn=tile_n: streaming_topk_pallas_qmajor_xt(
                  q, xt, bias, K, tile_n=tn, tile_b=256))
    # sanity: same ids from both layouts
    s_a, i_a = streaming_topk_pallas_qmajor(qs[0], x, bias, K,
                                            tile_n=2048, tile_b=256)
    s_b, i_b = streaming_topk_pallas_qmajor_xt(qs[0], xt, bias, K,
                                               tile_n=2048, tile_b=256)
    agree = float(np.mean(np.asarray(i_a) == np.asarray(i_b)))
    results["id_agreement_rowmajor_vs_xt"] = agree
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
