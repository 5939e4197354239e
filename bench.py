"""Headline benchmark: flat exact cosine top-k QPS per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config (BASELINE north star): 1M x 768-d corpus, batch=64 queries, k=10,
bf16 storage, fused Pallas streaming matmul+top-k. Baseline for
vs_baseline is the reference's published vector-query latency of 2-5 ms
per query on its dev machine (README.md:425, CHANGELOG.md:840) ->
midpoint 3.5 ms ~= 285.7 QPS. The reference's HNSW is approximate; this
scan is EXACT brute-force at 1M rows.

Measurement notes: the dev-tunnel transport adds ~30 ms per synchronous
dispatch and can result-cache identical dispatches, so the harness runs
ITERS distinct query batches inside ONE jit (lax.scan) and syncs once —
the per-batch time is the on-chip rate, with transport amortized to
~1 ms. On non-TPU backends (dev runs) shapes shrink and the XLA
streaming path is used.
"""

from __future__ import annotations

import json
import time

BASELINE_QPS = 1000.0 / 3.5  # reference HNSW midpoint, ~285.7 QPS


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.ops.topk import streaming_topk, streaming_topk_pallas

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        N, D, B, K, tile_n, tile_b, dtype = 1_000_000, 768, 64, 10, 2048, 64, jnp.bfloat16
        iters = 32
    else:
        N, D, B, K, tile_n, tile_b, dtype = 100_000, 384, 64, 10, 2048, 8, jnp.float32
        iters = 4
    N = (N // tile_n) * tile_n

    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-12))
    x = x.astype(dtype)
    qs = jax.random.normal(kq, (iters, B, D), jnp.float32)
    qs = qs * jax.lax.rsqrt(jnp.maximum(jnp.sum(qs * qs, -1, keepdims=True), 1e-12))
    qs = qs.astype(dtype)
    bias = jnp.zeros((N,), jnp.float32)

    if on_tpu:
        def one(q):
            return streaming_topk_pallas(q, x, bias, K, tile_n=tile_n, tile_b=tile_b)
    else:
        def one(q):
            return streaming_topk(q.astype(jnp.float32), x, bias, K, tile_n=tile_n)

    @jax.jit
    def run_all(qs):
        def step(_, q):
            return None, one(q)
        _, out = jax.lax.scan(step, None, qs)
        return out

    np.asarray(run_all(qs)[0])  # compile + full sync
    t0 = time.perf_counter()
    np.asarray(run_all(qs)[0])  # host fetch forces real completion
    dt = time.perf_counter() - t0

    qps = B * iters / dt
    print(json.dumps({
        "metric": f"flat_exact_cosine_top{K}_qps_{N}x{D}_{jnp.dtype(dtype).name}",
        "value": round(qps, 2),
        "unit": "qps/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
