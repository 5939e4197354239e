"""IVF-PQ 10M x 768 recall/QPS operating point (VERDICT r3 item 4.3).

The round-3 sweep published 10M-tier QPS with UNKNOWN recall; this run
closes that hole: one 10M x 768 build with a TRUE exact-scan oracle,
then an nprobe x refine_factor sweep reporting recall@10 vs the oracle
AND pipelined QPS for every config, ending with the chosen production
operating point (recall@10 >= 0.95 at max QPS).

Protocol
- Corpus: 10,485,760 rows generated ON DEVICE in chunks around 16,384
  cluster centers (sigma 0.25) — the clustered regime real embedding
  corpora live in (and the one the coarse quantizer exists for); the
  raw matrix never exists anywhere (30GB f32).
- Oracle: exact f32 cosine top-10 computed on the SAME pass that feeds
  the build: per chunk, score all queries on the MXU and fold into a
  running top-k merge. No approximation anywhere in the reference
  ranking (the flat-exact analogue of hybrid_e2e_scale's oracle tier).
- Queries: 512 fresh draws from the same cluster distribution (NOT
  corpus rows — self-retrieval flatters recall).
- Index: IVFPQIndex nlist=8192, m=96, refine="int8_device" (the
  production 10M configuration: codes 2.0GB + int8 bank 7.7GB in HBM).
  reserve() upfront -> every HBM tenant allocated exactly once.
- Recall: |top10_config ∩ top10_oracle| / 10, averaged over queries.
- QPS: pipelined protocol (R=8 async dispatches of DISTINCT B=256
  batches, drain on host fetches) — identical to ivfpq_capacity_r3.

Run ON TPU: python benchmarks/ivfpq_operating_point_r4.py
Writes .bench/ivfpq_operating_point_r4.json (flushed per config).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "ivfpq_operating_point_r4.json")

RESULTS: dict = {}


def _flush():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_485_760)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--nlist", type=int, default=8192)
    ap.add_argument("--centers", type=int, default=16384)
    ap.add_argument("--sigma", type=float, default=0.25)
    ap.add_argument("--chunk", type=int, default=262_144)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--qps-batch", type=int, default=256)
    ap.add_argument("--qps-r", type=int, default=8)
    ap.add_argument("--nprobes", type=int, nargs="+",
                    default=[4, 8, 16, 32, 64])
    ap.add_argument("--refine-factors", type=int, nargs="+",
                    default=[0, 4, 8, 16])  # 0 = refine off (PQ-only)
    args = ap.parse_args()

    # merge into prior partial runs (the sweep is resumable by config)
    # — but ONLY when the prior run's build config matches this one:
    # stale np*_rf* entries from a different rows/m/nlist/sigma would
    # silently compete in the operating_point selection (ADVICE r4).
    cur_cfg = {
        "rows": args.rows, "dim": args.dim, "m": args.m,
        "nlist": args.nlist, "centers": args.centers,
        "sigma": args.sigma, "queries": args.queries, "k": 10,
    }
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prior = json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            print(f"# prior output unreadable ({e}); starting fresh",
                  flush=True)
            prior = {}
        pc = prior.get("config", {})
        if all(pc.get(kk) == vv for kk, vv in cur_cfg.items()):
            RESULTS.update(prior)
        elif prior:
            print("# prior output has a different config "
                  f"({ {kk: pc.get(kk) for kk in cur_cfg} } vs {cur_cfg}); "
                  "starting fresh", flush=True)

    import jax
    import jax.numpy as jnp

    from codegraph_tpu.index.ivfpq import IVFPQIndex

    N, D, K = args.rows, args.dim, 10
    n_chunks = -(-N // args.chunk)
    RESULTS["config"] = {
        "rows": N, "dim": D, "m": args.m, "nlist": args.nlist,
        "centers": args.centers, "sigma": args.sigma,
        "queries": args.queries, "k": K,
        "refine": "int8_device",
        "qps_protocol": f"pipelined R={args.qps_r} x B={args.qps_batch} "
                        "distinct batches, drained on host fetches",
    }

    centers = jax.random.normal(
        jax.random.PRNGKey(99), (args.centers, D), jnp.float32)

    def _norm(v):
        return v * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-12))

    @jax.jit
    def gen_chunk(key):
        kc, kn = jax.random.split(key)
        which = jax.random.randint(kc, (args.chunk,), 0, args.centers)
        v = jnp.take(centers, which, axis=0) \
            + args.sigma * jax.random.normal(kn, (args.chunk, D),
                                             jnp.float32)
        return _norm(v)

    # queries: fresh draws from the same distribution
    kq1, kq2 = jax.random.split(jax.random.PRNGKey(1234))
    qwhich = jax.random.randint(kq1, (args.queries,), 0, args.centers)
    queries = _norm(jnp.take(centers, qwhich, axis=0)
                    + args.sigma * jax.random.normal(
                        kq2, (args.queries, D), jnp.float32))
    jax.block_until_ready(queries)

    @jax.jit
    def oracle_fold(run_s, run_i, chunk, base):
        """Exact f32 scores of all queries vs one chunk, folded into the
        running top-K: concat + top_k (K + chunk-K columns)."""
        s = jax.lax.dot_general(
            queries, chunk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Q, chunk]
        s_top, i_top = jax.lax.top_k(s, K)
        i_top = i_top + base
        s_all = jnp.concatenate([run_s, s_top], axis=1)
        i_all = jnp.concatenate([run_i, i_top], axis=1)
        s_new, pos = jax.lax.top_k(s_all, K)
        return s_new, jnp.take_along_axis(i_all, pos, axis=1)

    run_s = jnp.full((args.queries, K), -jnp.inf, jnp.float32)
    run_i = jnp.full((args.queries, K), -1, jnp.int32)

    idx = IVFPQIndex(
        D, nlist=args.nlist, nprobe=8, m=args.m, kmeans_iters=8,
        pq_iters=6, capacity_factor=2.0, refine="int8_device",
        refine_factor=8,
    )

    t0 = time.perf_counter()
    first = gen_chunk(jax.random.PRNGKey(0))
    idx.train(first)          # device slice: no host round-trip
    idx.reserve(N)            # codes + int8 bank allocated exactly once
    train_s = time.perf_counter() - t0
    print(f"trained + reserved in {train_s:.1f}s", flush=True)

    t0 = time.perf_counter()
    for c in range(n_chunks):
        tc = time.perf_counter()
        chunk = first if c == 0 else gen_chunk(jax.random.PRNGKey(c))
        n_take = min(args.chunk, N - c * args.chunk)
        run_s, run_i = oracle_fold(run_s, run_i, chunk[:n_take],
                                   jnp.int32(c * args.chunk))
        idx.add(chunk[:n_take])
        print(f"chunk {c + 1}/{n_chunks} "
              f"({time.perf_counter() - tc:.1f}s)", flush=True)
    oracle_i = np.asarray(run_i)
    build_s = time.perf_counter() - t0
    st = idx.stats()
    RESULTS["build"] = {
        "rows": idx.n_rows, "build_s": round(build_s, 1),
        "train_s": round(train_s, 1),
        "padding_waste": round(st["padding_waste"], 4),
        "hbm_codes_gib": round(
            args.nlist * args.m * idx.list_cap / 2**30, 2),
        "hbm_refine_gib": round(N * (D + 4) / 2**30, 2),
    }
    print("build:", RESULTS["build"], flush=True)
    _flush()

    qnp = np.asarray(queries)
    rngq = np.random.default_rng(7)
    B, R = args.qps_batch, args.qps_r
    qps_batches = jnp.asarray(_norm(jnp.take(
        centers, jnp.asarray(rngq.integers(0, args.centers,
                                           (R + 1) * B)), axis=0)
        + args.sigma * jax.random.normal(
            jax.random.PRNGKey(777), ((R + 1) * B, D), jnp.float32)))
    jax.block_until_ready(qps_batches)

    from codegraph_tpu.index.ivfpq import ivfpq_search_pallas
    from codegraph_tpu.index.ivfpq import _refine_device_kernel

    def run_cfg(nprobe: int, rf: int):
        """One (nprobe, refine_factor) config: recall on the 512 oracle
        queries + pipelined QPS on distinct B-sized batches."""
        idx.refine_factor = max(rf, 1)
        idx.refine = "int8_device" if rf > 0 else "none"
        k_fetch = K * rf if rf > 0 else K

        def dispatch(qb):
            s, i = ivfpq_search_pallas(
                qb, idx._centroids, idx._x, idx._ids, idx._bias,
                idx._books, k_fetch, nprobe)
            if rf > 0:
                raw, scales = idx._dev_bank()
                s, i = _refine_device_kernel(qb, raw, scales, s, i, K)
            return s, i

        # recall (through the public search path: k_fetch/refine logic)
        ids = np.concatenate([
            idx.search(qnp[lo:lo + B], K, nprobe=nprobe)[1]
            for lo in range(0, args.queries, B)])
        rec = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(ids, oracle_i)]))

        # pipelined QPS on raw dispatches (no host glue in the timing)
        batches = [qps_batches[r * B:(r + 1) * B] for r in range(R + 1)]
        np.asarray(dispatch(batches[R])[0])       # warm/compile
        t0 = time.perf_counter()
        outs = [dispatch(batches[r]) for r in range(R)]
        for s, _ in outs:
            np.asarray(s)
        dt = time.perf_counter() - t0
        return rec, R * B / dt, dt / R * 1e3

    for rf in args.refine_factors:
        for npb in args.nprobes:
            tag = f"np{npb}_rf{rf}"
            try:
                rec, qps, ms = run_cfg(npb, rf)
            except Exception as e:  # VMEM OOM at compile etc: record it
                RESULTS[tag] = {"error": str(e).split(chr(10))[0][:300]}
                print(tag, "FAIL:", str(e)[:200], flush=True)
                _flush()
                continue
            RESULTS[tag] = {"recall@10": round(rec, 4),
                            "qps": round(qps, 1),
                            "ms_per_call": round(ms, 2)}
            print(tag, RESULTS[tag], flush=True)
            _flush()

    # chosen operating point: highest QPS at recall >= 0.95
    best = None
    for tag, r in RESULTS.items():
        if not tag.startswith("np") or "error" in r:
            continue
        if r["recall@10"] >= 0.95 and (
                best is None or r["qps"] > RESULTS[best]["qps"]):
            best = tag
    RESULTS["operating_point"] = {
        "config": best,
        **(RESULTS[best] if best else {}),
        "bar": "recall@10 >= 0.95 vs exact f32 oracle at 10.5M x 768",
    }
    print("operating point:", RESULTS["operating_point"], flush=True)
    _flush()
    print("wrote", OUT)


if __name__ == "__main__":
    main()
