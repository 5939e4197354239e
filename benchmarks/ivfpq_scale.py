"""IVF-PQ at scale on one TPU chip: capacity + QPS + recall proxy.

Builds an IVF-PQ index over N x 768 synthetic rows generated ON DEVICE
in chunks (the raw matrix never exists anywhere: at N=10M it would be
30GB f32 — the codes are N*m bytes, ~1GB at m=96). Holds out a query
set from the first chunk and measures perturbed self-retrieval recall
plus batched QPS across an nprobe sweep.

Usage: PYTHONPATH=. python benchmarks/ivfpq_scale.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=10_000_000)
    parser.add_argument("--dim", type=int, default=768)
    parser.add_argument("--m", type=int, default=96)
    parser.add_argument("--nlist", type=int, default=8192)
    parser.add_argument("--chunk", type=int, default=524_288)
    parser.add_argument("--queries", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.index.ivfpq import IVFPQIndex

    N, D = args.rows, args.dim
    n_chunks = -(-N // args.chunk)

    @jax.jit
    def gen_chunk(key):
        v = jax.random.normal(key, (args.chunk, D), jnp.float32)
        return v * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-12))

    idx = IVFPQIndex(
        D, nlist=args.nlist, nprobe=32, m=args.m, kmeans_iters=8,
        pq_iters=6, capacity_factor=2.0, refine="none",
    )

    t0 = time.perf_counter()
    first = np.asarray(gen_chunk(jax.random.PRNGKey(0)))
    queries = first[: args.queries].copy()
    idx.train(first)
    train_s = time.perf_counter() - t0
    print(f"trained coarse+PQ in {train_s:.1f}s", flush=True)

    t0 = time.perf_counter()
    for c in range(n_chunks):
        chunk = first if c == 0 else np.asarray(
            gen_chunk(jax.random.PRNGKey(c)))
        idx.add(chunk[: min(args.chunk, N - c * args.chunk)])
        if (c + 1) % 5 == 0:
            print(f"  added {idx.n_rows:,} rows "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    build_s = time.perf_counter() - t0
    st = idx.stats()
    print(f"built {idx.n_rows:,} rows in {build_s:.1f}s; "
          f"padding_waste={st['padding_waste']:.3f}", flush=True)

    # recall proxy: perturbed self-retrieval (σ=0.05 keeps cos ~ 0.997,
    # far above random-neighbor scores at this N)
    rng = np.random.default_rng(7)
    qp = queries + 0.05 * rng.standard_normal(queries.shape).astype(np.float32)
    out = {"rows": idx.n_rows, "dim": D, "m": args.m,
           "nlist": args.nlist, "train_s": round(train_s, 1),
           "build_s": round(build_s, 1),
           "hbm_code_gb": round(idx.n_rows * args.m / 1e9, 2),
           "raw_f32_gb": round(idx.n_rows * D * 4 / 1e9, 1),
           "padding_waste": round(st["padding_waste"], 3)}
    for nprobe in (8, 16, 32):
        s, i = idx.search(qp, 10, nprobe=nprobe)  # compile + recall
        r1 = float(np.mean(i[:, 0] == np.arange(args.queries)))
        r10 = float(np.mean([
            a in row for a, row in zip(np.arange(args.queries), i)]))
        t0 = time.perf_counter()
        for it in range(args.iters):
            qd = qp + np.float32(1e-6 * (it + 1))  # distinct dispatches
            np.asarray(idx.search(qd, 10, nprobe=nprobe)[0])
        dt = time.perf_counter() - t0
        qps = args.queries * args.iters / dt
        out[f"nprobe{nprobe}"] = {
            "recall@1": round(r1, 4), "recall@10": round(r10, 4),
            "qps": round(qps, 1),
        }
        print(f"nprobe={nprobe}: recall@1={r1:.3f} qps={qps:,.0f}",
              flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
