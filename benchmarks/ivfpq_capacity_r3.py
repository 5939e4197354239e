"""IVF-PQ capacity-tier records, round 3: pipelined 10M + 100M/chip.

Two upgrades over .bench/ivfpq_pallas.json (round 2):

1. PIPELINED protocol at 10M x 768: round 2 timed single dispatches,
   which on this dev transport pay ~30 ms fixed per call (ROUND3_NOTES
   env lessons). R async dispatches in flight amortize it exactly as
   bench.py does for the flat kernel — this is the number a serving
   loop actually sees.
2. 100M rows on ONE chip: nlist=32768, cap=3072 (100.66M padded rows),
   m=48 sub-quantizers -> 4.84 GB of codes in HBM, a corpus size the
   reference's in-memory SurrealDB HNSW cannot hold on a single node
   at any speed (codegraph.surql:815-823 HNSW is RAM-resident f32:
   100M x 768 f32 = 307 GB). Codes/ids are synthesized on-device with
   iota arithmetic (ADC timing is value-independent; a value-correct
   build is exercised by tests/test_ivfpq_index.py and the 10M build
   record in BENCH_SWEEP_TPU_r2.json).

Run ON TPU: python benchmarks/ivfpq_capacity_r3.py
Writes .bench/ivfpq_capacity_r3.json
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from codegraph_tpu.index.ivfpq import ivfpq_search_pallas
from codegraph_tpu.ops.similarity import l2_normalize

RESULTS = {}
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "ivfpq_capacity_r3.json")


def synth_index_iota(nlist, cap, m, D):
    """Value-independent synthetic index, materialized at exactly its
    resident size. The whole synthesis is ONE jit so XLA fuses the
    iota arithmetic into the u8 output — op-by-op eager execution
    materializes each int32 intermediate at 4 bytes/element (~4 GB
    apiece at 10M rows, ~20 GB total: instant OOM on a 16 GB chip)."""

    @jax.jit
    def _build():
        ci = jax.lax.broadcasted_iota(jnp.int32, (nlist, m, cap), 2)
        mi = jax.lax.broadcasted_iota(jnp.int32, (nlist, m, cap), 1)
        li = jax.lax.broadcasted_iota(jnp.int32, (nlist, m, cap), 0)
        codes = ((ci * 31 + mi * 7 + li * 13) % 256).astype(jnp.uint8)
        ids = jax.lax.broadcasted_iota(
            jnp.int32, (nlist, cap), 0) * cap + jax.lax.broadcasted_iota(
            jnp.int32, (nlist, cap), 1)
        bias = jnp.zeros((nlist, cap), jnp.float32)
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        cents = l2_normalize(jax.random.normal(k1, (nlist, D), jnp.float32))
        dsub = D // m
        books = jax.random.normal(k2, (m, 256, dsub), jnp.float32) * 0.05
        return codes, ids, bias, cents, books

    return _build()


def pipelined(run_fn, qs, R):
    """Submit R async dispatches with DISTINCT query batches, then drain
    on host fetches (the transport result-caches identical dispatches
    and block_until_ready returns early — CLAUDE.md)."""
    np.asarray(run_fn(qs[R])[0])  # warm/compile
    t0 = time.perf_counter()
    outs = [run_fn(qs[r]) for r in range(R)]
    for s, _ in outs:
        np.asarray(s)
    return time.perf_counter() - t0


def _flush():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def bench(tag, nlist, cap, m, D, B, nprobes, R=8):
    n_rows = nlist * cap
    print(f"--- {tag}: {n_rows/1e6:.1f}M padded rows, m={m} "
          f"({nlist*m*cap/2**30:.2f} GiB codes)", flush=True)
    try:
        codes, ids, bias, cents, books = synth_index_iota(nlist, cap, m, D)
        jax.block_until_ready(codes)
    except Exception as e:
        RESULTS[f"{tag}_synth"] = {"error": str(e).split(chr(10))[0][:300]}
        print(tag, "synth FAIL:", str(e)[:200], flush=True)
        _flush()
        return
    rng = np.random.default_rng(7)
    qs = l2_normalize(jnp.asarray(
        rng.standard_normal((R + 1, B, D)).astype(np.float32)))
    for nprobe in nprobes:
        name = f"{tag}_B{B}_np{nprobe}_R{R}"
        try:
            def run(q, _np=nprobe):
                return ivfpq_search_pallas(
                    q, cents, codes, ids, bias, books, 10, _np)
            dt = pipelined(run, qs, R)
            qps = B * R / dt
            RESULTS[name] = {
                "ms_per_call": round(dt / R * 1e3, 2),
                "qps": round(qps, 1),
                "rows": n_rows,
            }
            print(name, f"{dt/R*1e3:.1f} ms/call -> {qps:.0f} QPS", flush=True)
        except Exception as e:
            RESULTS[name] = {"error": str(e).split(chr(10))[0][:300]}
            print(name, "FAIL:", str(e)[:200], flush=True)
        _flush()
    # free HBM before the next (bigger) config
    del codes, ids, bias, cents, books


def main():
    print("devices:", jax.devices(), flush=True)
    # 10M, round-2 shapes, now pipelined (round-2 single-dispatch
    # baseline: 2,589 QPS at B=256 np8)
    bench("pipelined_10M", nlist=4096, cap=2560, m=96, D=768,
          B=256, nprobes=(8, 16))
    # 100M rows on one chip — run LAST: if the big config trips an OOM
    # the relay wedges, but the 10M numbers are already recorded
    bench("capacity_100M", nlist=32768, cap=3072, m=48, D=768,
          B=256, nprobes=(8, 16))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("wrote", OUT, flush=True)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
