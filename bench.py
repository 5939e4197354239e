"""Headline benchmark: flat exact cosine top-k QPS per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config (BASELINE north star): 1M x 768-d corpus, bf16, k=10, EXACT
brute-force via the query-major fused Pallas kernel
(ops/topk.py streaming_topk_pallas_qmajor with the round-3 lane-reduced
merge). Protocol: R async dispatches of B-query batches kept in flight,
then drain — JAX dispatch is asynchronous, so the ~30 ms/call tunnel
overhead of this dev transport overlaps with kernel execution exactly
as a serving loop would drive the chip (timing still ends on host
fetches of every result; distinct query batches per call defeat the
transport's result cache). Round-3 floor analysis:
.bench/kernel_r3_int8.json + kernel_pipeline.json.

Baseline for vs_baseline: the reference's published vector-query latency
of 2-5 ms/query (README.md:425, CHANGELOG.md:840) -> midpoint 3.5 ms
~= 285.7 QPS — and that is an approximate HNSW; this scan is exact.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_QPS = 1000.0 / 3.5  # reference HNSW midpoint, ~285.7 QPS

# The axon relay wedges for 5-15 min after any crashed/killed TPU
# process (CLAUDE.md); a claim attempted in that window dies with
# "UNAVAILABLE: TPU backend setup/compile error". jax caches the failed
# backend for the life of the process, so retry by RE-EXEC, not loop.
MAX_ATTEMPTS = 4
RETRY_WAIT_S = 300.0


def _attempt() -> int:
    try:
        return int(os.environ.get("BENCH_ATTEMPT", "1"))
    except ValueError:
        return 1


def _retry_or_raise(exc: BaseException) -> None:
    msg = str(exc)
    # claim failures AND mid-run transport deaths (broken pipe during a
    # dispatch/fetch — seen in .bench/int8_roofline_r4.json) both re-exec
    transient = ("UNAVAILABLE" in msg or "backend" in msg.lower()
                 or "Broken pipe" in msg or "transport" in msg.lower())
    att = _attempt()
    if not transient or att >= MAX_ATTEMPTS:
        raise exc
    print(f"# claim failed (attempt {att}/{MAX_ATTEMPTS}): "
          f"{msg.splitlines()[0][:120]}; retrying in {RETRY_WAIT_S:.0f}s",
          file=sys.stderr, flush=True)
    time.sleep(RETRY_WAIT_S)
    os.environ["BENCH_ATTEMPT"] = str(att + 1)
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


def main() -> None:
    # make an explicit JAX_PLATFORMS=cpu win over the sitecustomize
    # TPU plugin (hermetic smoke runs must never claim the chip)
    from codegraph_tpu.core.config import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.ops.topk import (
        streaming_topk,
        streaming_topk_pallas_qmajor,
    )

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        # B=4096 x R=8 in-flight: 63.1k QPS measured vs 34.0k for
        # single-dispatch B=2048 (.bench/kernel_pipeline.json)
        N, D, B, K, tile_n, tile_b = 1_000_000, 768, 4096, 10, 2048, 128
        dtype, R = jnp.bfloat16, 8
    else:
        N, D, B, K, tile_n, tile_b = 100_000, 384, 256, 10, 2048, 8
        dtype, R = jnp.float32, 2
    N = (N // tile_n) * tile_n

    # REPS independent timed measurements, median reported: the r4 round
    # recorded a single-shot 21.9k-QPS sample (vs 63.5k in r3) that a
    # lone flaky-transport stall could fully explain — medians make the
    # public number robust to one bad window (VERDICT r4 item 2)
    REPS = 5

    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-12))
    x = x.astype(dtype)
    # distinct query batches per call AND per repeat (identical
    # dispatches can be result-cached by the transport)
    qs = jax.random.normal(kq, (REPS * R + 1, B, D), jnp.float32)
    qs = qs * jax.lax.rsqrt(jnp.maximum(jnp.sum(qs * qs, -1, keepdims=True), 1e-12))
    qs = qs.astype(dtype)
    bias = jnp.zeros((N,), jnp.float32)

    if on_tpu:
        def one(q):
            return streaming_topk_pallas_qmajor(
                q, x, bias, K, tile_n=tile_n, tile_b=tile_b
            )
    else:
        def one(q):
            return streaming_topk(q.astype(jnp.float32), x, bias, K,
                                  tile_n=tile_n)

    np.asarray(one(qs[REPS * R])[0])  # compile + warm
    qps_reps = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        # async submit: R calls in flight
        outs = [one(qs[rep * R + r]) for r in range(R)]
        for s, _ in outs:
            np.asarray(s)  # host fetch = true synchronization, every result
        dt = time.perf_counter() - t0
        qps_reps.append(B * R / dt)
        print(f"# rep {rep + 1}/{REPS}: {qps_reps[-1]:.0f} qps",
              file=sys.stderr, flush=True)

    qps = float(np.median(qps_reps))
    print(json.dumps({
        "metric": f"flat_exact_cosine_top{K}_qps_{N}x{D}_{jnp.dtype(dtype).name}",
        "value": round(qps, 2),
        "unit": "qps/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as exc:  # wedged-relay claim failure
        _retry_or_raise(exc)
    except Exception as exc:
        # jax.errors.JaxRuntimeError subclasses vary by version; match
        # on the transient-claim signature, re-raise everything else
        _retry_or_raise(exc)
