"""Hybrid recall parity accounting at scale (SURVEY.md "hard parts").

VERDICT r2 item 5: prove the END-TO-END hybrid (vector + BM25 + edge
boost) at >=1M chunks, not just ANN recall. Method: one GraphStore /
BM25 / edge set, four vector tiers behind the SAME HybridSearch code —

    oracle    flat f32 exact scan      (the exact-search oracle)
    flat_bf16 flat bf16 Pallas scan
    int8      int8 scan + f32 rescore
    ivfpq     IVF-PQ + refine

Hybrid recall@10 for a tier = |top10_tier ∩ top10_oracle| / 10 over the
full pipeline output (vector top-k -> parent nodes -> 0.9/0.1 BM25 mix
-> graph boost -> rank), so it captures prefetch truncation and tier
approximation exactly where the reference's accounting lives
(schema/codegraph.surql:328-536). Served QPS = wall-clock through
HybridSearch.search_embedding (store lookups and all).

Usage: python benchmarks/hybrid_e2e_scale.py [--n 1000000] [--queries 200]
Writes .bench/hybrid_e2e_scale.json.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "hybrid_e2e_scale.json")

VERBS = ["parse", "render", "compute", "validate", "serialize", "fetch",
         "cache", "merge", "encode", "route", "schedule", "compress",
         "shard", "quantize", "gather", "scatter", "reduce", "broadcast"]
NOUNS = ["config", "request", "invoice", "token", "graph", "payload",
         "session", "metric", "snapshot", "index", "template", "batch",
         "tensor", "bucket", "segment", "manifest", "cursor", "ledger"]
ADJ = ["stale", "pending", "sharded", "remote", "batched", "sparse",
       "dense", "atomic", "lazy", "cached", "inline", "padded"]


def build_store(n: int, rng: random.Random):
    """1 node + 1 chunk per row, plus call edges — minimal records, real
    GraphStore/BM25 code paths."""
    from codegraph_tpu.core.types import (
        CodeChunk,
        CodeEdge,
        CodeNode,
        EdgeType,
        Language,
        Location,
        NodeType,
    )
    from codegraph_tpu.graph.store import GraphStore
    from codegraph_tpu.search.bm25 import BM25Index

    store = GraphStore()
    bm25 = BM25Index()
    texts = []
    nodes = []
    t0 = time.perf_counter()
    for i in range(n):
        v = VERBS[i % len(VERBS)]
        nn = NOUNS[(i // len(VERBS)) % len(NOUNS)]
        a = ADJ[(i // (len(VERBS) * len(NOUNS))) % len(ADJ)]
        name = f"{v}_{a}_{nn}_{i}"
        text = (f"def {name}(data):\n    '''{v} the {a} {nn} records "
                f"(variant {i}).'''\n    return {v}_{nn}_impl(data, {i})")
        node = CodeNode.make(
            "bench", name, NodeType.FUNCTION, Language.PYTHON,
            Location(f"src/m{i % 4096}.py", (i % 50) * 8, (i % 50) * 8 + 4),
            content=text,
        )
        nodes.append(node)
        texts.append(text)
        if len(nodes) >= 100_000:
            store.upsert_nodes(nodes)
            nodes = []
    if nodes:
        store.upsert_nodes(nodes)
    node_list = list(store.nodes.values())
    for node in node_list:
        bm25.add(node.row, f"{node.name} {node.content}")
    chunks = [
        CodeChunk.make(node.id, texts[j], 0, 1)
        for j, node in enumerate(node_list)
    ]
    store.upsert_chunks(chunks)
    # call edges: each node calls 2 random earlier nodes
    edges = []
    for j in range(1, len(node_list)):
        for _ in range(2):
            k = rng.randrange(j)
            edges.append(CodeEdge(node_list[j].id, node_list[k].id,
                                  EdgeType.CALLS))
    store.add_edges(edges)
    print(f"store built: {n:,} nodes/chunks, {len(edges):,} edges "
          f"in {time.perf_counter() - t0:.0f}s", flush=True)
    return store, bm25, texts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--dim", type=int, default=384)
    args = ap.parse_args()

    import jax.numpy as jnp

    from codegraph_tpu.core.config import SearchConfig
    from codegraph_tpu.index.flat import FlatIndex
    from codegraph_tpu.index.int8_flat import Int8FlatIndex
    from codegraph_tpu.index.ivfpq import IVFPQIndex
    from codegraph_tpu.models.providers import HashProvider
    from codegraph_tpu.search.hybrid import HybridSearch

    rng = random.Random(0)
    store, bm25, texts = build_store(args.n, rng)
    provider = HashProvider(args.dim)

    t0 = time.perf_counter()
    embs = np.zeros((args.n, args.dim), np.float32)
    BATCH = 50_000
    for lo in range(0, args.n, BATCH):
        embs[lo:lo + BATCH] = provider.embed_texts(texts[lo:lo + BATCH])
    print(f"embedded {args.n:,} chunks in {time.perf_counter() - t0:.0f}s",
          flush=True)

    tiers = {}
    t0 = time.perf_counter()
    oracle = FlatIndex(args.dim, dtype="float32", backend="xla")
    oracle.reserve(args.n)
    oracle.add(embs)
    tiers["oracle_f32_exact"] = oracle
    bf16 = FlatIndex(args.dim, dtype="bfloat16")
    bf16.reserve(args.n)
    bf16.add(embs)
    tiers["flat_bf16"] = bf16
    i8 = Int8FlatIndex(args.dim, rescore_dtype="bfloat16")
    i8.reserve(args.n)
    i8.add(embs)
    tiers["int8_rescore"] = i8
    pq = IVFPQIndex(args.dim, nlist=1024, nprobe=16, m=48, refine="int8",
                    kmeans_iters=5, pq_iters=5, train_sample=131072)
    pq.train(embs[:131072])
    pq.add(embs)
    tiers["ivfpq_refine"] = pq
    print(f"4 tiers built in {time.perf_counter() - t0:.0f}s", flush=True)

    # queries: doc-style paraphrases of sampled nodes
    qidx = rng.sample(range(args.n), args.queries)
    queries = []
    for i in qidx:
        node = store.node_by_row(i)
        v, a, nn = node.name.split("_")[:3]
        queries.append((f"how do we {v} the {a} {nn} data", node.id))
    qvecs = provider.embed_texts([q for q, _ in queries])

    cfgs = SearchConfig()
    report = {"config": {"n": args.n, "dim": args.dim,
                         "queries": args.queries}}
    oracle_results = None
    for tname, index in tiers.items():
        hs = HybridSearch(store, index, provider, bm25, cfgs)
        outs = []
        t0 = time.perf_counter()
        for (qtext, _), qv in zip(queries, qvecs):
            res = hs.search_embedding(np.asarray(qv), limit=10,
                                      text_query=qtext)
            outs.append([r.node_id for r in res])
        wall = time.perf_counter() - t0
        row = {
            "served_qps": round(len(queries) / wall, 1),
            "p50_ms": None,
        }
        if oracle_results is None:
            oracle_results = outs
            # generative ground truth: the paraphrased node in top-10
            hit10 = sum(1 for (q, nid), out in zip(queries, outs)
                        if nid in out) / len(queries)
            row["gt_hit@10"] = round(hit10, 3)
        else:
            rec = np.mean([
                len(set(o) & set(ref)) / max(len(ref), 1)
                for o, ref in zip(outs, oracle_results)
            ])
            row["hybrid_recall@10_vs_oracle"] = round(float(rec), 4)
            hit10 = sum(1 for (q, nid), out in zip(queries, outs)
                        if nid in out) / len(queries)
            row["gt_hit@10"] = round(hit10, 3)
        report[tname] = row
        print(tname, row, flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
