"""Open-loop serving latency: Poisson B=1 arrivals through QueryService.

VERDICT r2 item 6: raw kernel QPS says nothing about what a *caller*
sees at B=1. This drives the served path — ShmServedIndex (hot-reload
segment attach) wrapped in QueryService (batch collector) — with an
open-loop Poisson client and reports p50/p99 latency + achieved QPS per
arrival rate, for the int8 and IVF-PQ serving tiers at 1M x 768.

Open-loop discipline: arrivals are scheduled on an absolute clock;
latency counts from the SCHEDULED arrival (queueing delay included), so
an overloaded server shows honest tail blowup instead of coordinated
omission. Reference comparison: the cloud pipeline's 250-500 ms
(CHANGELOG.md:842).

Writes .bench/serving_latency.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "serving_latency.json")

N, D = 999424, 768
RATES = (200, 1000, 3000)     # arrivals/s
WORKERS = 4                   # pipelined flushes in flight (QueryService)
DURATION_S = 15.0
WARMUP_S = 2.0
MAX_BATCH = 256
MAX_WAIT_MS = 3.0
SUFFIX = ""                   # result-key suffix (tuned re-runs merge in)


def drive_threaded(service, queries, rate, duration):
    """Same open-loop schedule, but each arrival waits on its own future
    via a callback recording completion time — avoids the serialized
    result() walk overstating tails."""
    import threading

    from codegraph_tpu.search.service import ServiceOverloaded

    rng = np.random.default_rng(1234 + rate)
    t_start = time.perf_counter()
    deadline = t_start + duration
    done_lat = []
    n_skip = [0]
    n_shed = 0
    lock = threading.Lock()

    def make_cb(sched):
        def cb(fut):
            done = time.perf_counter()
            with lock:
                if fut.exception() is None and sched - t_start > WARMUP_S:
                    done_lat.append(done - sched)
                else:
                    n_skip[0] += 1
        return cb

    next_t = t_start
    i = 0
    n_sub = 0
    while next_t <= deadline:
        now = time.perf_counter()
        if now < next_t:
            time.sleep(next_t - now)
        try:
            fut = service.submit(queries[i % len(queries)])
            fut.add_done_callback(make_cb(next_t))
            n_sub += 1
        except ServiceOverloaded:
            # shed at admission: an instant 429, not a latency sample
            n_shed += 1
        next_t += rng.exponential(1.0 / rate)
        i += 1
    # drain: wait for every submitted future to resolve
    t_end = time.perf_counter()
    deadline_drain = t_end + 120
    while time.perf_counter() < deadline_drain:
        with lock:
            done = len(done_lat) + n_skip[0]
        if done >= n_sub:
            break
        time.sleep(0.05)
    return np.sort(np.asarray(done_lat)), n_sub, t_end - t_start, n_shed


def pct(lat, p):
    if lat.size == 0:
        return None
    return float(lat[min(int(p / 100.0 * lat.size), lat.size - 1)])


def flush_cost_probe(svc, queries, reps=5):
    """Synchronous per-bucket flush cost (query upload + kernel + result
    fetch) straight against the index — the transport floor that bounds
    any single query's latency through this service. Distinct query
    slices per rep defeat the transport's result cache; min over reps
    reports the floor, not scheduler noise."""
    costs = {}
    qs = np.asarray(queries, np.float32)
    for b in svc.pad_buckets:
        batch = np.concatenate([qs] * (-(-b // len(qs))))[:b]
        np.asarray(svc.index.search(batch, svc.k)[0])  # warm shape
        ts = []
        for r in range(reps):
            rb = np.roll(batch, r + 1, axis=0) * (1.0 + 1e-4 * (r + 1))
            t0 = time.perf_counter()
            np.asarray(svc.index.search(rb, svc.k)[0])
            ts.append(time.perf_counter() - t0)
        costs[f"B{b}"] = {"ms_min": round(min(ts) * 1e3, 1),
                          "ms_med": round(sorted(ts)[len(ts) // 2] * 1e3,
                                          1)}
    return costs


def run_tier(svc, queries, rates, duration, label):
    """Drive one tier across rates; per-rate stats are reset so
    avg_batch/shed are per-rate, not cumulative (r3's were cumulative)."""
    from codegraph_tpu.search.service import ServiceStats

    tier = {}
    for rate in rates:
        time.sleep(1.0)  # settle: no queue bleed between rates
        svc.stats = ServiceStats()
        lat, n_sub, wall, n_shed = drive_threaded(svc, queries, rate,
                                                  duration)
        tier[f"rate_{rate}"] = {
            "submitted": int(n_sub),
            "shed": int(n_shed),
            "completed": int(lat.size),
            "qps": round(lat.size / max(wall - WARMUP_S, 1e-9), 1),
            "p50_ms": round(pct(lat, 50) * 1e3, 2) if lat.size else None,
            "p90_ms": round(pct(lat, 90) * 1e3, 2) if lat.size else None,
            "p99_ms": round(pct(lat, 99) * 1e3, 2) if lat.size else None,
            "avg_batch": round(svc.stats.avg_batch, 1),
            "expired": int(svc.stats.expired),
        }
        print(label, rate, tier[f"rate_{rate}"], flush=True)
    tier["note"] = (
        "completed < submitted = warmup-window arrivals excluded from "
        "percentiles plus any unresolved drain tail at the 120 s cap; "
        "the arrival schedule is shared across tiers (fixed seed per "
        "rate). shed = admission-control rejections (instant 429s, not "
        "latency samples).")
    return tier


def main():
    global RATES, WORKERS, DURATION_S, MAX_BATCH, MAX_WAIT_MS, SUFFIX
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", type=int, nargs="+", default=list(RATES))
    ap.add_argument("--workers", type=int, default=WORKERS)
    ap.add_argument("--duration", type=float, default=DURATION_S)
    ap.add_argument("--max-batch", type=int, default=MAX_BATCH)
    ap.add_argument("--max-wait-ms", type=float, default=MAX_WAIT_MS)
    ap.add_argument("--auto", action="store_true",
                    help="use QueryService.auto() per-tier policies "
                         "(overrides --workers/--max-batch/--max-wait-ms)")
    ap.add_argument("--max-pending", type=int, default=None,
                    help="admission bound (default: QueryService's "
                         "8*max_batch*workers)")
    ap.add_argument("--suffix", default=SUFFIX,
                    help="append to result keys; merges into existing json")
    args = ap.parse_args()
    RATES = tuple(args.rates)
    WORKERS, DURATION_S = args.workers, args.duration
    MAX_BATCH, MAX_WAIT_MS, SUFFIX = args.max_batch, args.max_wait_ms, \
        args.suffix

    import jax
    import jax.numpy as jnp

    from codegraph_tpu.index.int8_flat import Int8FlatIndex
    from codegraph_tpu.index.ivfpq import IVFPQIndex
    from codegraph_tpu.index.snapshot import publish_index_shm
    from codegraph_tpu.search.service import QueryService, ShmServedIndex

    results = {}
    if SUFFIX and os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    results["config" + SUFFIX] = {"N": N, "D": D, "rates": RATES,
                                  "duration_s": DURATION_S,
                                  "auto_policy": bool(args.auto),
                                  "max_pending": args.max_pending,
                                  "workers": WORKERS,
                                  "max_batch": MAX_BATCH,
                                  "max_wait_ms": MAX_WAIT_MS}
    key = jax.random.PRNGKey(7)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True),
                                      1e-12))
    queries = np.asarray(
        jax.random.normal(kq, (4096, D), jnp.float32))
    queries = queries / (np.linalg.norm(queries, axis=1,
                                        keepdims=True) + 1e-12)

    shm_dir = os.path.join(os.path.dirname(OUT))
    os.makedirs(shm_dir, exist_ok=True)

    # --- int8 tier (no rescore matrix: keeps the shm segment at ~770MB;
    # the rescore stage is measured by the kernel benches) ---
    idx8 = Int8FlatIndex(D, metric="cosine", rescore_dtype=None)
    idx8.reserve(N)
    idx8.add(x)
    print("int8 index built", flush=True)
    p8 = os.path.join(shm_dir, "serve_int8.shm")
    pub8 = publish_index_shm(idx8, p8)
    served8 = ShmServedIndex(p8)
    del idx8
    print("int8 shm published + attached", flush=True)

    if args.auto:
        svc = QueryService.auto(served8, k=10, max_pending=args.max_pending)
        results["config" + SUFFIX]["int8_policy"] = QueryService.policy_for(
            served8)
    else:
        svc = QueryService(served8, k=10, max_batch=MAX_BATCH,
                           max_wait_ms=MAX_WAIT_MS, workers=WORKERS,
                           max_pending=args.max_pending)
    # warm the ONE padded batch shape before driving
    svc.warm(D)  # compile every pad-bucket shape before driving
    results["config" + SUFFIX]["int8_flush_cost"] = flush_cost_probe(
        svc, queries[:64])
    results["int8_shm_served" + SUFFIX] = run_tier(
        svc, queries, RATES, DURATION_S, "int8")
    svc.close()
    served8.close()
    pub8.close()

    # --- IVF-PQ capacity tier (codes in shm; refine off for the segment) ---
    idxpq = IVFPQIndex(D, nlist=1024, nprobe=16, m=96, refine="none",
                       kmeans_iters=4, pq_iters=4, train_sample=131072)
    idxpq.train(x[:131072])  # device slice: no host round-trip
    for lo in range(0, N, 131072):  # chunked: one-shot add OOMs HBM
        idxpq.add(x[lo:lo + 131072])
    print("ivfpq index built", flush=True)
    ppq = os.path.join(shm_dir, "serve_ivfpq.shm")
    pubpq = publish_index_shm(idxpq, ppq)
    servedpq = ShmServedIndex(ppq)
    del idxpq
    print("ivfpq shm published + attached", flush=True)

    if args.auto:
        svc = QueryService.auto(servedpq, k=10, max_pending=args.max_pending)
        results["config" + SUFFIX]["ivfpq_policy"] = QueryService.policy_for(
            servedpq)
    else:
        svc = QueryService(servedpq, k=10, max_batch=MAX_BATCH,
                           max_wait_ms=MAX_WAIT_MS, workers=WORKERS,
                           max_pending=args.max_pending)
    svc.warm(D)
    results["config" + SUFFIX]["ivfpq_flush_cost"] = flush_cost_probe(
        svc, queries[:64])
    results["ivfpq_shm_served" + SUFFIX] = run_tier(
        svc, queries, RATES, DURATION_S, "ivfpq")
    svc.close()
    servedpq.close()
    pubpq.close()

    results["reference_cloud_pipeline_ms"] = [250, 500]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
