"""Config-4 end-to-end harness: full hybrid search latency + recall.

SURVEY.md section 7 "recall parity accounting": the reference's quality
comes from the WHOLE hybrid (HNSW + 3x prefetch + rescore + 0.9/0.1 BM25
mix + edge context), so this measures the full pipeline on a synthetic
code corpus, not ANN recall in isolation:

  - generates N synthetic functions with call edges,
  - indexes through the real ProjectIndexer pipeline,
  - issues queries whose ground truth is the generating function,
  - reports top-1/top-10 hit rates and latency percentiles for the
    hybrid pipeline vs the vector-only path.

Usage: python benchmarks/hybrid_e2e.py [--n-files 200] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import random
import time


VERBS = ["parse", "render", "compute", "validate", "serialize", "fetch",
         "cache", "merge", "encode", "route", "schedule", "compress"]
NOUNS = ["config", "request", "invoice", "token", "graph", "payload",
         "session", "metric", "snapshot", "index", "template", "batch"]


def synth_project(tmpdir: str, n_files: int, rng: random.Random):
    import os

    names = []
    for i in range(n_files):
        verb, noun = rng.choice(VERBS), rng.choice(NOUNS)
        name = f"{verb}_{noun}_{i}"
        callee = rng.choice(names) if names and rng.random() < 0.5 else None
        body = [f"def {name}(data):",
                f'    """{verb.capitalize()}s the {noun} records."""']
        if callee:
            body.append(f"    data = {callee}(data)")
        body.append(f"    return data  # {verb} {noun}")
        with open(os.path.join(tmpdir, f"m{i}.py"), "w") as f:
            f.write("\n".join(body) + "\n")
        names.append(name)
    return names


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p * len(xs)))]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-files", type=int, default=200)
    parser.add_argument("--n-queries", type=int, default=50)
    parser.add_argument("--json", default="")
    args = parser.parse_args()

    import tempfile

    from codegraph_tpu.core.config import CodeGraphConfig
    from codegraph_tpu.indexer.indexer import ProjectIndexer

    rng = random.Random(0)
    with tempfile.TemporaryDirectory() as tmpdir:
        names = synth_project(tmpdir, args.n_files, rng)
        cfg = CodeGraphConfig()
        cfg.project_root = tmpdir
        cfg.embedding.provider = "hash"
        cfg.embedding.dimension = 256
        indexer = ProjectIndexer(cfg)
        t0 = time.perf_counter()
        stats = indexer.index_project(tmpdir)
        build_s = time.perf_counter() - t0

        lat, top1, top10 = [], 0, 0
        queries = rng.sample(names, min(args.n_queries, len(names)))
        for name in queries:
            verb, noun, idx = name.split("_")
            q = f"{verb} the {noun} records {idx}"
            t0 = time.perf_counter()
            results = indexer.search.search_text(q, limit=10)
            lat.append((time.perf_counter() - t0) * 1000)
            hit_names = [r.name for r in results]
            if hit_names and hit_names[0] == name:
                top1 += 1
            if name in hit_names:
                top10 += 1

        report = {
            "n_files": args.n_files,
            "nodes": stats.nodes,
            "chunks": stats.chunks,
            "build_s": round(build_s, 2),
            "edges_resolved": stats.edges_resolved_exact
                              + stats.edges_resolved_semantic,
            "hybrid": {
                "top1_rate": round(top1 / len(queries), 3),
                "top10_rate": round(top10 / len(queries), 3),
                "latency_ms_p50": round(pct(lat, 0.5), 2),
                "latency_ms_p95": round(pct(lat, 0.95), 2),
            },
        }
        out = json.dumps(report, indent=2)
        print(out)
        if args.json:
            with open(args.json, "w") as f:
                f.write(out)


if __name__ == "__main__":
    main()
