"""Assemble BENCH_SWEEP_TPU_r5.json from the .bench/ result files.

Round-5 sweep = the blocks that still describe the shipped state
carried from BENCH_SWEEP_TPU_r4.json, plus the round-5 measurements
per VERDICT r4: the realistic-corpus 10M IVF-PQ operating point with
its diagnosis (items 1), the re-measured median-of-5 headline (item 2),
the completed int8 roofline (item 3), the feature-reranker eval
(item 5), the re-measured agent_eval with the receiver-/import-aware
edge resolution (item 6), and the scanner extraction parity table
(item 7; also in PARITY.md).

Usage: python benchmarks/assemble_sweep_r5.py  (pure host; no TPU)
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, ".bench")
OUT = os.path.join(ROOT, "BENCH_SWEEP_TPU_r5.json")
R4 = os.path.join(ROOT, "BENCH_SWEEP_TPU_r4.json")

# carried over verbatim from the r4 sweep (still-current shipped state)
CARRY = ["kernel_pipelined", "kernel_int8_floor_analysis",
         "kernel_query_resident", "hybrid_e2e_scale", "train_encoder_r3",
         "crossrepo_eval", "ivfpq_capacity", "train_cross_encoder_r3",
         "perlang_eval", "serving_latency_auto"]

BLOCKS = {
    # committed-name: (.bench file, producing script)
    "headline": ("headline_r5.json", "bench.py (median of 5 repeats)"),
    "ivfpq_diag": ("ivfpq_diag_r5.json", "benchmarks/ivfpq_diag_r5.py"),
    "ivfpq_operating_point": ("ivfpq_operating_point_r5.json",
                              "benchmarks/ivfpq_operating_point_r5.py"),
    "flat_int8_10m": ("flat_int8_10m_r5.json",
                      "benchmarks/flat_int8_10m_r5.py"),
    "int8_roofline": ("int8_roofline_r4.json",
                      "benchmarks/int8_roofline_r4.py"),
    "rerank_eval": ("rerank_eval_r5.json", "benchmarks/rerank_eval_r5.py"),
    "agent_eval": ("agent_eval_r3.json", "benchmarks/agent_eval_r3.py"),
    "scanner_parity": ("scanner_parity_r5.json",
                       "benchmarks/scanner_parity_r5.py"),
}

NOTES = {
    "headline": (
        "VERDICT r4 weak 2: bench.py now takes 5 repeats with distinct "
        "query batches and reports the median; the r4 21,931-QPS public "
        "sample was a single timed window straddling a transport stall "
        "on a relay that the same evening killed 5 of 6 roofline probes "
        "(root cause in ROUND5_NOTES.md). Median-of-5 makes one stalled "
        "window unable to move the public number."),
    "ivfpq_diag": (
        "VERDICT r4 weak 1 diagnosis: separates 'nprobe plumbing bug' "
        "from 'corpus artifact' for the r4 nprobe-invariant recall. "
        "Logs the visited-cell sets and candidate overlap at nprobe 4 "
        "vs 64, the oracle-cell-rank histogram (which probe rank holds "
        "the true top-10), ADC-vs-exact margin distortion, and a "
        "uniform-corpus positive control where nprobe DOES move "
        "recall."),
    "ivfpq_operating_point": (
        "The round's north star (VERDICT r4 item 1) re-run on a "
        "DEFENSIBLE corpus: 131k real code chunks (production chunker "
        "over venv Python/JS, /usr/include C/C++, the reference's Rust "
        "crates) embedded with the shipped ensemble provider, expanded "
        "to 10.5M rows by density-calibrated perturbation + mixup; "
        "queries are held-out real chunk embeddings, never indexed. "
        "Index = production 10M config (m=96, nlist=8192, OPQ rotation, "
        "int8_device tiled refine). candidate_recall separates probe "
        "misses from ADC misranking. Bar: recall@10 >= 0.95 vs the "
        "exact f32 oracle at >= 2,900 QPS/chip (10x the reference's "
        "285.7-QPS HNSW midpoint, README.md:425)."),
    "flat_int8_10m": (
        "The 10M operating point that MEETS the bar. The realistic "
        "corpus (unlike r4's near-duplicate synthetic) shows IVF's "
        "limiter is probe coverage: candidate_recall == recall at every "
        "config and both saturate ~0.78 by nprobe=32 — the true top-10 "
        "spreads across many coarse cells at high effective dimension, "
        "while scan cost was flat in nprobe. At 10M rows the dense int8 "
        "MXU scan (Int8FlatIndex, pure int8 ranking over the IDENTICAL "
        "corpus) is the TPU-native answer; IVF-PQ remains the "
        "100M-scale tier where the corpus outgrows HBM."),
    "int8_roofline": (
        "VERDICT r4 item 3 completed: bw_stream/mxu/epilogue "
        "decomposition of the int8 scan with per-probe transient retry "
        "+ re-exec and start-markers so a wedged-relay hang retires the "
        "probe instead of killing the run. Either >= 120k QPS or the "
        "decomposition showing the shipped kernel's distance from the "
        "bandwidth bound."),
    "rerank_eval": (
        "VERDICT r4 item 5: the r3 cross-encoder degraded retrieval "
        "(0.738 -> 0.227 pure). Round 5 ships a feature reranker "
        "(name/snippet/path/degree features at fixed cosine scale 0.05 "
        "stacked on retrieval score: breaks near-ties, cannot overturn "
        "decisive gaps). Gate: recall@1 >= retrieval-only on the "
        "cross-repo pairs; default flips only if met."),
    "agent_eval": (
        "VERDICT r4 item 6 re-measurement: the reference Rust corpus "
        "indexed with the receiver-aware, import-aware edge-resolution "
        "ladder (unresolved 42.2% -> ~0.6% exact-stage on dev runs) and "
        "query-classified soft filters in the default tool path. Gates: "
        "unresolved < 20%, tool_plain recall@1 >= 0.50."),
    "scanner_parity": (
        "VERDICT r4 item 7: scanner-vs-truth extraction parity, "
        "corpus-scale on the reference's own Rust crates + /usr/include "
        "C++ + venv JS against an independent stripper+regex truth "
        "extractor restricted to the reference extractor's per-language "
        "node vocabulary, plus golden fixtures for all 12 scanner "
        "languages. Table also in PARITY.md."),
}


def main():
    results = {
        "round": 5,
        "hardware": "1 TPU chip via remote transport (dev tunnel, "
                     "~30 ms/dispatch)",
    }
    if os.path.exists(R4):
        with open(R4) as f:
            r4 = json.load(f)
        for k in CARRY:
            if k in r4:
                results[k] = r4[k]
                if isinstance(results[k], dict) and \
                        "carried_from" not in results[k]:
                    results[k]["carried_from"] = "BENCH_SWEEP_TPU_r4.json"
    # already-landed blocks survive a wiped .bench/ (results live in the
    # committed sweep; the raw .bench files are gitignored scratch)
    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
    for name, (fname, script) in BLOCKS.items():
        path = os.path.join(BENCH, fname)
        block = {"script": script}
        if name in NOTES:
            block["note"] = NOTES[name]
        if os.path.exists(path):
            with open(path) as f:
                block["data"] = json.load(f)
        elif "data" in prev.get(name, {}):
            block["data"] = prev[name]["data"]
        else:
            block["status"] = "missing"
        results[name] = block
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    missing = [n for n in BLOCKS if results[n].get("status") == "missing"]
    print("wrote", OUT, "missing:", missing or "none")


if __name__ == "__main__":
    main()
