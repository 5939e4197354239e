"""TPU bench: device-resident IVF-PQ build (VERDICT item 6) + IVF
recall/QPS curves across corpus sizes (item 9).

Round-1 baseline: the 10M x 768 IVF-PQ build took 2,936 s
(BENCH_SWEEP_TPU.json ivfpq_10M) because every 512k-row chunk
round-tripped device -> numpy -> add() -> device over the dev tunnel
(~200 s per chunk in transfers). The build path now keeps vectors
device-resident (only [n, 2] assignments visit the host), so the same
build is re-measured with device chunks, plus one host-path chunk for
the per-chunk contrast.

Run ON TPU: python benchmarks/bench_build_device.py
Writes .bench/build_device.json
"""

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

RESULTS = {}


def gen_chunk(seed, n, d):
    x = jax.random.normal(jax.random.PRNGKey(seed), (n, d), jnp.float32)
    return jax.block_until_ready(x)


def bench_ivfpq_build_10m():
    from codegraph_tpu.index.ivfpq import IVFPQIndex

    D, n_chunk, n_chunks = 768, 524_288, 20  # 10.49M rows
    idx = IVFPQIndex(768, nlist=4096, nprobe=16, m=96, kmeans_iters=6,
                     pq_iters=4, capacity_factor=2.0)
    t0 = time.perf_counter()
    train = gen_chunk(0, 262_144, D)
    idx.train(train)
    idx.reserve(n_chunk * (n_chunks + 1))  # presize: one cell alloc
    t_train = time.perf_counter() - t0
    print(f"train: {t_train:.1f}s", flush=True)

    per_chunk = []
    t_build0 = time.perf_counter()
    for c in range(n_chunks):
        tc = time.perf_counter()
        x = gen_chunk(c + 1, n_chunk, D)
        t_gen = time.perf_counter() - tc
        tc = time.perf_counter()
        idx.add(x)  # device-resident: no vector round-trip
        dt = time.perf_counter() - tc
        per_chunk.append(round(dt, 2))
        print(f"chunk {c}: gen {t_gen:.1f}s add {dt:.1f}s", flush=True)
    t_build = time.perf_counter() - t_build0

    # contrast: a 1/8 chunk through the round-1 host path, scaled —
    # a full 512k x 768 f32 chunk is 1.6 GB each way over the dev
    # tunnel and alone blows the bench budget (which is itself the
    # point being measured)
    n_small = n_chunk // 8
    x = gen_chunk(99, n_small, D)
    tc = time.perf_counter()
    xh = np.asarray(x)  # device -> host
    idx.add(xh)         # host -> device again inside add
    t_host_chunk = (time.perf_counter() - tc) * 8.0

    st = idx.stats()
    RESULTS["ivfpq_build_10m_device"] = {
        "rows": st["rows"], "train_s": round(t_train, 1),
        "build_s": round(t_build, 1),
        "per_chunk_s": per_chunk,
        "host_path_chunk_s": round(t_host_chunk, 1),
        "round1_total_s": 2936.0,
        "speedup_vs_round1": round(2936.0 / (t_train + t_build), 1),
        "padding_waste": round(st["padding_waste"], 3),
    }
    print(json.dumps(RESULTS["ivfpq_build_10m_device"]), flush=True)

    # quick QPS sanity on the built index via the Pallas path
    rng = np.random.default_rng(3)
    q = rng.standard_normal((64, D)).astype(np.float32)
    idx.search(q, 10)  # warm
    tc = time.perf_counter()
    idx.search(rng.standard_normal((64, D)).astype(np.float32), 10)
    dt = time.perf_counter() - tc
    RESULTS["ivfpq_10m_qps_after_build"] = round(64 / dt, 1)
    print("qps:", RESULTS["ivfpq_10m_qps_after_build"], flush=True)
    del idx, x, xh, train
    gc.collect()


def gen_clustered(seed, n, d, centers, noise=1.0):
    """Mixture-of-Gaussians chunk: IVF recall is only meaningful on data
    with cluster structure (pure random high-dim vectors spread their
    true neighbors uniformly over cells, making ANY cell-probing index
    look broken — run 1 measured recall 0.01-0.09 on random data).

    The noise is scaled by 1/sqrt(d) so `noise` is the expected offset
    NORM relative to the unit centers (a raw noise*N(0,I_d) draw has
    norm noise*sqrt(d)=19 at d=768 and drowns the structure — run 3
    reproduced the random-data recall). noise=1.0: in-cluster cosine
    ~0.5, cross-cluster ~0 — clusters are real but boundaries make
    nprobe matter."""
    import math

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    assign = jax.random.randint(k1, (n,), 0, centers.shape[0])
    x = centers[assign] + (noise / math.sqrt(d)) * jax.random.normal(
        k2, (n, d), jnp.float32)
    return jax.block_until_ready(x)


def bench_ivf_curves():
    """IVF (raw bf16 cells) recall/QPS at 1M/2M/4M vs the flat scan —
    substantiates where IVF beats the exact scan (VERDICT item 9).

    Ground truth per size = exact flat bf16 scan over the same chunks
    (a full-probe IVF search materializes [B, N]-scale gathers and
    OOMs the chip at 4M — the flat scan streams). QPS = min over 3
    distinct timed batches (single dispatches over the dev tunnel are
    ±3x noisy)."""
    from codegraph_tpu.index.flat import FlatIndex
    from codegraph_tpu.index.ivf import IVFIndex

    D = 768
    B = 256
    REPS = 3
    n_chunk = 524_288
    centers = jax.random.normal(jax.random.PRNGKey(77), (16_384, D),
                                jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    q_warm = np.asarray(gen_clustered(900, B, D, centers))
    q_gt = np.asarray(gen_clustered(901, B, D, centers))
    q_timed = [np.asarray(gen_clustered(910 + r, B, D, centers))
               for r in range(REPS)]

    def timed_search(index, nprobe=None):
        kw = {"nprobe": nprobe} if nprobe else {}
        index.search(q_warm, 10, **kw)  # warm/compile
        ts = []
        for r in range(REPS):
            tc = time.perf_counter()
            index.search(q_timed[r], 10, **kw)
            ts.append(time.perf_counter() - tc)
        return B / min(ts)

    out = {}
    for n_m, label in ((1, "1M"), (2, "2M"), (4, "4M")):
        N = n_m * 1_048_576
        nlist = 2048 if n_m < 4 else 4096
        # exact ground truth + flat timing over the same data
        flat = FlatIndex(D, dtype="bfloat16", metric="cosine")
        flat.reserve(N)
        for c in range(N // n_chunk):
            flat.add(gen_clustered(200 + c, n_chunk, D, centers))
        _, base_i = flat.search(q_gt, 10)
        flat_qps = round(timed_search(flat), 1)
        print(label, "flat:", flat_qps, flush=True)
        del flat
        gc.collect()

        idx = IVFIndex(D, nlist=nlist, nprobe=16, metric="cosine",
                       dtype="bfloat16", kmeans_iters=6,
                       capacity_factor=1.5)
        t0 = time.perf_counter()
        idx.train(gen_clustered(100, 262_144, D, centers))
        idx.reserve(N)  # one cell alloc: growth would hold old+new
        for c in range(N // n_chunk):
            idx.add(gen_clustered(200 + c, n_chunk, D, centers))
        t_build = time.perf_counter() - t0
        entry = {"rows": idx.n_rows, "build_s": round(t_build, 1),
                 "flat_qps": flat_qps, "curve": {}}
        for nprobe in (4, 16, 64):
            qps = timed_search(idx, nprobe=nprobe)
            _, got_i = idx.search(q_gt, 10, nprobe=nprobe)
            rec = float(np.mean([
                len(set(a) & set(b)) / 10.0 for a, b in zip(got_i, base_i)
            ]))
            entry["curve"][f"nprobe{nprobe}"] = {
                "qps": round(qps, 1), "recall@10": round(rec, 3)}
            print(label, f"nprobe={nprobe}:", entry["curve"][f"nprobe{nprobe}"],
                  flush=True)
        del idx
        gc.collect()
        out[label] = entry
    RESULTS["ivf_curves"] = out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["build", "curves"], default=None,
                    help="run one part (results merge into the json)")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    out_path = ".bench/build_device.json"
    if os.path.exists(out_path):
        with open(out_path) as f:
            RESULTS.update(json.load(f))
    if args.only in (None, "build"):
        bench_ivfpq_build_10m()
    if args.only in (None, "curves"):
        bench_ivf_curves()
    os.makedirs(".bench", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
