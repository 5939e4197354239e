"""IVF-PQ recall on CLUSTERED data (the realistic embedding regime).

Counterpart to ivfpq_scale.py's random-isotropic run: real embedding
corpora cluster, which is exactly what the coarse quantizer exploits.
Generates N rows around n_centers on device (sigma controls cluster
tightness), builds IVF-PQ, and measures perturbed self-retrieval recall
+ QPS across nprobe. Also times the build with the TILED pq_encode.

Usage: PYTHONPATH=. python benchmarks/ivfpq_clustered.py [--rows 2097152]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=2_097_152)
    parser.add_argument("--dim", type=int, default=768)
    parser.add_argument("--m", type=int, default=96)
    parser.add_argument("--nlist", type=int, default=2048)
    parser.add_argument("--centers", type=int, default=4096)
    parser.add_argument("--sigma", type=float, default=0.25)
    parser.add_argument("--chunk", type=int, default=524_288)
    parser.add_argument("--queries", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--refine", default="none",
                        help="none | int8 | f32 host rescore store")
    parser.add_argument("--query-centers", type=int, default=0,
                        help="queries drawn from N centers (0 = corpus rows)")
    parser.add_argument("--skip-per-query", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.index.ivfpq import IVFPQIndex

    N, D = args.rows, args.dim
    n_chunks = -(-N // args.chunk)
    centers = jax.random.normal(
        jax.random.PRNGKey(99), (args.centers, D), jnp.float32)

    @jax.jit
    def gen_chunk(key):
        kc, kn = jax.random.split(key)
        which = jax.random.randint(kc, (args.chunk,), 0, args.centers)
        v = jnp.take(centers, which, axis=0) + args.sigma * jax.random.normal(
            kn, (args.chunk, D), jnp.float32)
        return v * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-12))

    idx = IVFPQIndex(
        D, nlist=args.nlist, nprobe=32, m=args.m, kmeans_iters=8,
        pq_iters=6, capacity_factor=2.0, refine=args.refine,
        refine_factor=8,
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
    build_s = time.perf_counter() - t0
    st = idx.stats()
    print(f"built {idx.n_rows:,} rows in {build_s:.1f}s "
          f"(waste={st['padding_waste']:.3f})", flush=True)

    rng = np.random.default_rng(7)
    if args.query_centers:
        # clustered QUERY batch: all queries near a few centers, so the
        # probe union is tiny and the batch-shared kernel decodes only
        # those cells (its design case: users hammering one topic)
        reps = -(-args.queries // args.query_centers)
        base = np.tile(np.asarray(centers[: args.query_centers]),
                       (reps, 1))[: args.queries]
        qp = (base + args.sigma * rng.standard_normal(
            (args.queries, D))).astype(np.float32)
        qp /= np.linalg.norm(qp, axis=1, keepdims=True)
        queries = qp  # recall proxy meaningless here; self-ids unknown
    else:
        qp = queries + 0.02 * rng.standard_normal(
            queries.shape).astype(np.float32)
    out = {"rows": idx.n_rows, "dim": D, "m": args.m, "nlist": args.nlist,
           "centers": args.centers, "sigma": args.sigma,
           "refine": args.refine,
           "train_s": round(train_s, 1), "build_s": round(build_s, 1),
           "padding_waste": round(st["padding_waste"], 3)}
    probes = (4, 8, 16)
    if not args.skip_per_query:
        for nprobe in probes:
            s, i = idx.search(qp, 10, nprobe=nprobe)
            r1 = float(np.mean(i[:, 0] == np.arange(args.queries)))
            t0 = time.perf_counter()
            for it in range(args.iters):
                qd = qp + np.float32(1e-6 * (it + 1))
                np.asarray(idx.search(qd, 10, nprobe=nprobe)[0])
            dt = time.perf_counter() - t0
            qps = args.queries * args.iters / dt
            out[f"nprobe{nprobe}"] = {"recall@1": round(r1, 4),
                                      "qps": round(qps, 1)}
            print(f"nprobe={nprobe}: recall@1={r1:.3f} qps={qps:,.0f}",
                  flush=True)

    # batch-shared path: dedupe probed cells, decode once, MXU scoring
    for nprobe in probes:
        s, i = idx.search_batch(qp, 10, nprobe=nprobe)
        r1 = float(np.mean(i[:, 0] == np.arange(args.queries)))
        t0 = time.perf_counter()
        for it in range(args.iters):
            qd = qp + np.float32(1e-6 * (it + 1))
            np.asarray(idx.search_batch(qd, 10, nprobe=nprobe)[0])
        dt = time.perf_counter() - t0
        qps = args.queries * args.iters / dt
        out[f"batch_shared_nprobe{nprobe}"] = {
            "recall@1": round(r1, 4), "qps": round(qps, 1)}
        print(f"batch-shared nprobe={nprobe}: recall@1={r1:.3f} "
              f"qps={qps:,.0f}", flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
