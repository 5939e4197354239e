"""Assemble BENCH_SWEEP_TPU_r4.json from the .bench/ result files.

Round-4 sweep = the round-3 blocks that still describe the shipped
state (kernel, capacity, training) carried over from
BENCH_SWEEP_TPU_r3.json, plus the round-4 measurements: the previously
missing rerank_eval + agent_eval evidence (VERDICT r3 item 1), the
per-language encoder eval (item 8), the auto-policy serving re-run
(item 5), the 10M IVF-PQ recall/QPS operating point (item 3) and the
int8 roofline analysis (item 4).

Usage: python benchmarks/assemble_sweep_r4.py  (pure host; no TPU)
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, ".bench")
OUT = os.path.join(ROOT, "BENCH_SWEEP_TPU_r4.json")
R3 = os.path.join(ROOT, "BENCH_SWEEP_TPU_r3.json")

# carried over verbatim from the r3 sweep (still-current shipped state)
CARRY = ["headline", "kernel_pipelined", "kernel_int8_floor_analysis",
         "kernel_query_resident", "hybrid_e2e_scale", "train_encoder_r3",
         "crossrepo_eval", "ivfpq_capacity", "train_cross_encoder_r3"]

BLOCKS = {
    # committed-name: (.bench file, producing script)
    "rerank_eval": ("rerank_eval_r3.json", "benchmarks/rerank_eval_r3.py"),
    "agent_eval": ("agent_eval_r3.json", "benchmarks/agent_eval_r3.py"),
    "perlang_eval": ("perlang_eval_r4.json",
                     "benchmarks/perlang_eval_r4.py"),
    "serving_latency_auto": ("serving_latency.json",
                             "benchmarks/serving_latency.py --auto"),
    "ivfpq_operating_point": ("ivfpq_operating_point_r4.json",
                              "benchmarks/ivfpq_operating_point_r4.py"),
    "int8_roofline": ("int8_roofline_r4.json",
                      "benchmarks/int8_roofline_r4.py"),
}

NOTES = {
    "rerank_eval": (
        "VERDICT r3 item 1 evidence. The trained r3 cross-encoder does "
        "NOT lift cross-repo retrieval: recall@1 0.738 retrieval-only "
        "vs 0.227 pure rerank / 0.723 blended (recall@10 unchanged). "
        "Train-time pair-accuracy 0.90 did not transfer. Consequence: "
        "the cross-encoder ships OPT-IN (SearchConfig.rerank=False, "
        "reranker='embedding'); agent_eval independently confirms the "
        "drop through the tool path (0.417 -> 0.257)."),
    "agent_eval": (
        "The standing e2e quality gate (VERDICT r3 item 6): the unseen "
        "reference Rust corpus indexed with the REAL ProjectIndexer + "
        "shipped ensemble, scored THROUGH GraphToolExecutor (the MCP "
        "entry point). Latencies here are the eval loop's per-query "
        "single-text embeds over the dev tunnel, not the batched "
        "serving numbers (see serving_latency_auto). rag_pipeline "
        "'degraded' counts queries that tripped the 1000 ms latency "
        "budget, which the tunnel's ~1 s/embed makes common in THIS "
        "environment."),
    "perlang_eval": (
        "Per-language transfer of the shipped encoder (VERDICT r3 item "
        "8) on corpora available without egress: rust = reference "
        "crates; python = this repo's own code (unseen by training); "
        "javascript = real venv JS (JS was synthetic-only in "
        "training); c_cpp = /usr/include (IN-DOMAIN caveat: the "
        "training harvest drew from the same header population). Pass "
        "bar: no language below hash parity (see per-language "
        "beats_hash)."),
    "serving_latency_auto": (
        "QueryService.auto() per-tier policies + admission control "
        "(max_pending shed -> 429) + late batch-slicing, re-measured "
        "open-loop at 1M x 768 (VERDICT r3 item 5). Two passes: the "
        "un-suffixed first pass (pad every flush to max_batch=1024) "
        "exposed the padded-query upload cost on this transport (p50 "
        "492 ms at 200/s); the _buckets pass pads to the smallest of "
        "(64, 256, 1024) compiled shapes instead. *_flush_cost blocks "
        "are the synchronous per-shape floor (query upload + kernel + "
        "result fetch over the dev tunnel) that lower-bounds any "
        "single query's latency here; production direct-attached HBM "
        "does not pay the upload. shed = admission-control rejections "
        "(instant, not latency samples); completed < submitted = "
        "warmup exclusions + drain cap; the arrival schedule is "
        "seed-shared across tiers."),
}


def main():
    results = {
        "round": 4,
        "hardware": "1 TPU chip via remote transport (dev tunnel, "
                     "~30 ms/dispatch)",
    }
    if os.path.exists(R3):
        with open(R3) as f:
            r3 = json.load(f)
        for k in CARRY:
            if k in r3:
                results[k] = r3[k]
                if isinstance(results[k], dict):
                    results[k]["carried_from"] = "BENCH_SWEEP_TPU_r3.json"
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
