"""Headline benchmark: flat exact cosine top-k QPS per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config (BASELINE north star): 1M x 768-d corpus, batch=64 queries, k=10,
bf16 storage, fused streaming matmul+top-k. Baseline for vs_baseline is
the reference's published vector-query latency of 2-5 ms/query on its dev
machine (README.md:425, CHANGELOG.md:840) -> midpoint 3.5 ms ~= 285.7 QPS.
The reference's HNSW is approximate; ours is EXACT brute-force at this
size, so beating it means beating an ANN index with a full scan.

On non-TPU backends (dev runs) the shapes shrink to 100k x 384 and the
XLA streaming path is used; the JSON line notes the scaled config.
"""

from __future__ import annotations

import json
import time

BASELINE_QPS = 1000.0 / 3.5  # reference HNSW midpoint, ~285.7 QPS


def main() -> None:
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.ops.topk import streaming_topk, streaming_topk_pallas

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        N, D, B, K, tile_n, dtype = 1_000_000, 768, 64, 10, 2048, jnp.bfloat16
    else:
        N, D, B, K, tile_n, dtype = 100_000, 384, 64, 10, 2048, jnp.float32
    N = (N // tile_n) * tile_n

    iters = 20 if on_tpu else 5
    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-12))
    x = x.astype(dtype)
    # distinct query batch per iteration: identical dispatches can be
    # result-cached by remote-execution relays, faking absurd QPS
    qs = jax.random.normal(kq, (iters + 1, B, D), jnp.float32)
    qs = qs * jax.lax.rsqrt(jnp.maximum(jnp.sum(qs * qs, -1, keepdims=True), 1e-12))
    qs = qs.astype(dtype)
    bias = jnp.zeros((N,), jnp.float32)

    if on_tpu:
        def run(qq):
            return streaming_topk_pallas(qq, x, bias, K, tile_n=tile_n, tile_b=8)
    else:
        def run(qq):
            return streaming_topk(qq.astype(jnp.float32), x, bias, K, tile_n=tile_n)

    # warmup/compile
    jax.block_until_ready(run(qs[iters]))

    t0 = time.perf_counter()
    out = [run(qs[it]) for it in range(iters)]
    jax.block_until_ready(out)
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
