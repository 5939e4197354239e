"""BASELINE measurement harness: configs 1-5 recall/QPS sweeps.

Produces the numbers BASELINE.md asks for:
  1. flat f32 cosine top-10 (exact)       -> QPS
  2. int8 scan + f32 rescore top-100      -> QPS + recall@10 vs exact
  3. IVF nlist/nprobe sweep               -> recall@10 / QPS curve
  4. hybrid vector + graph boost          -> end-to-end latency
  5. sharded (runs on the CPU mesh here; real ICI needs a multi-chip slice)

Usage: python benchmarks/sweep.py [--n 100000] [--d 384] [--json out.json]
Timing uses host-fetch synchronization inside one jit where possible
(see bench.py notes on transport overhead).
"""

from __future__ import annotations

import argparse
import json
import time


def _timed(fn, queries, *args, repeats=3):
    """Times fn(q_variant, *args) with a DISTINCT query batch per repeat
    (remote transports can result-cache identical dispatches) and a host
    fetch per repeat (block_until_ready can return early)."""
    import numpy as np

    B = queries.shape[0]
    variants = [np.roll(queries, r, axis=0) + r * 1e-6 for r in range(repeats)]
    np.asarray(fn(queries, *args)[0])  # warmup/compile
    t0 = time.perf_counter()
    for r in range(repeats):
        np.asarray(fn(variants[r], *args)[0])
    return (time.perf_counter() - t0) / repeats


def recall_at_k(got, ref):
    import numpy as np

    hits = sum(len(set(g) & set(r)) for g, r in zip(got, ref))
    return hits / ref.size


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--b", type=int, default=64)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--json", default="")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.index.flat import FlatIndex
    from codegraph_tpu.index.int8_flat import Int8FlatIndex
    from codegraph_tpu.index.ivf import IVFIndex

    rng = np.random.default_rng(0)
    # clustered corpus so IVF has structure (uniform random is the worst
    # case for any partition index). Generated ON DEVICE: a host-side 3GB
    # corpus would cross the (slow) host->device transport several times.
    n_centers = max(64, args.n // 1000)
    key = jax.random.PRNGKey(0)
    kc, kx, ka, kq, kqa = jax.random.split(key, 5)
    centers_d = jax.random.normal(kc, (n_centers, args.d), jnp.float32) * 2
    assign = jax.random.randint(ka, (args.n,), 0, n_centers)
    x_d = (jnp.take(centers_d, assign, axis=0)
           + jax.random.normal(kx, (args.n, args.d), jnp.float32) * 0.6)
    q_assign = jax.random.randint(kqa, (args.b,), 0, n_centers)
    q_d = (jnp.take(centers_d, q_assign, axis=0)
           + jax.random.normal(kq, (args.b, args.d), jnp.float32) * 0.6)
    # index ingest accepts jax arrays (jnp.asarray is a no-op on device
    # arrays), so the corpus never crosses the transport
    x = x_d
    q = np.asarray(q_d)  # queries are small; numpy for the timing variants

    report = {"n": args.n, "d": args.d, "b": args.b, "k": args.k,
              "backend": jax.default_backend(), "configs": {}}

    # config 1: flat exact
    flat = FlatIndex(args.d, tile_n=2048)
    flat.add(x)
    dt = _timed(lambda qq, k: flat.search(qq, k), q, args.k)
    ref_s, ref_i = flat.search(q, args.k)
    ref_i = np.asarray(ref_i)
    report["configs"]["flat_f32"] = {
        "latency_ms": round(dt * 1e3, 2), "qps": round(args.b / dt, 1),
        "recall_at_10": 1.0,
    }
    print(json.dumps(report["configs"]["flat_f32"]), flush=True)
    del flat  # free HBM before the next index

    # config 2: int8 + rescore
    int8 = Int8FlatIndex(args.d, rescore_dtype="bfloat16", rescore_k=100)
    int8.add(x)
    dt = _timed(lambda qq, k: int8.search(qq, k), q, args.k)
    _, i8 = int8.search(q, args.k)
    report["configs"]["int8_rescore"] = {
        "latency_ms": round(dt * 1e3, 2), "qps": round(args.b / dt, 1),
        "recall_at_10": round(recall_at_k(i8, ref_i), 4),
    }
    print(json.dumps(report["configs"]["int8_rescore"]), flush=True)
    del int8

    # config 3: IVF sweep
    nlist = max(64, int(4 * np.sqrt(args.n)))
    ivf = IVFIndex(args.d, nlist=nlist, kmeans_iters=8, dtype="bfloat16")
    t0 = time.perf_counter()
    ivf.train(x)
    ivf.add(x)
    build_s = time.perf_counter() - t0
    curve = []
    for nprobe in (1, 4, 16, 64, min(256, nlist)):
        dt = _timed(lambda qq, k, npb=nprobe: ivf.search(qq, k, nprobe=npb),
                    q, args.k)
        _, ii = ivf.search(q, args.k, nprobe=nprobe)
        curve.append({
            "nprobe": nprobe,
            "latency_ms": round(dt * 1e3, 2),
            "qps": round(args.b / dt, 1),
            "recall_at_10": round(recall_at_k(ii, ref_i), 4),
        })
        print(json.dumps(curve[-1]), flush=True)
    report["configs"]["ivf"] = {
        "nlist": nlist, "build_s": round(build_s, 2),
        "padding_waste": round(ivf.stats()["padding_waste"], 4),
        "curve": curve,
    }

    out = json.dumps(report, indent=2)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
