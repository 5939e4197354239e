"""Cross-encoder rerank lift on the cross-repo eval.

Does the trained cross-encoder (train_cross_encoder_r3.py) actually
improve retrieval, per the reference's 3-stage pipeline design
(reranker.rs:250: embedding top-N -> cross-encoder -> final)? Protocol:
retrieve top-RETRIEVE_K with the shipped bi-encoder ensemble over the
cross-repo corpus (reference Rust doc->code, the same 512 pairs as
crossrepo_eval.py), then rerank with (a) the trained cross-encoder,
(b) the lexical-overlap fallback scorer — report recall@1/@10 for
retrieval-only vs each reranker.

Usage (TPU or CPU): python benchmarks/rerank_eval_r3.py
Writes .bench/rerank_eval_r3.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RETRIEVE_K = 20
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "rerank_eval_r3.json")


def recalls(order_rows, n):
    """order_rows[i] = ranked corpus indices for query i (truth = i)."""
    r1 = float(np.mean([row[0] == i for i, row in enumerate(order_rows)]))
    r10 = float(np.mean([i in row[:10] for i, row in enumerate(order_rows)]))
    return {"recall@1": round(r1, 4), "recall@10": round(r10, 4)}


def main():
    from crossrepo_eval import harvest_rust_pairs

    from codegraph_tpu.models.cross_encoder import (
        CrossEncoder,
        default_cross_encoder_checkpoint,
    )
    from codegraph_tpu.models.providers import (
        EnsembleProvider,
        _default_checkpoint,
    )
    from codegraph_tpu.search.reranker import CrossScorerReranker

    pairs = harvest_rust_pairs("/root/reference/crates")
    codes = [c for c, _ in pairs]
    descs = [d for _, d in pairs]
    n = len(pairs)
    print(f"{n} cross-repo pairs", flush=True)

    prov = EnsembleProvider(dimension=768, checkpoint=_default_checkpoint())
    t0 = time.time()
    ec = prov.embed_texts(codes)
    print(f"embedded codes in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ed = prov.embed_texts(descs)
    print(f"embedded descs in {time.time()-t0:.1f}s", flush=True)
    ec = ec / np.maximum(np.linalg.norm(ec, axis=1, keepdims=True), 1e-9)
    ed = ed / np.maximum(np.linalg.norm(ed, axis=1, keepdims=True), 1e-9)
    sims = ed @ ec.T
    retrieved = np.argsort(-sims, axis=1)[:, :RETRIEVE_K]

    results = {"n_pairs": n, "retrieve_k": RETRIEVE_K,
               "retrieval_only": recalls(np.argsort(-sims, axis=1), n)}
    print("retrieval_only:", results["retrieval_only"], flush=True)

    ckpt = default_cross_encoder_checkpoint()
    results["cross_encoder_checkpoint"] = ckpt
    if ckpt:
        ce = CrossEncoder(checkpoint=ckpt)
        t0 = time.time()
        reranked, blended_rows = [], []
        a = ce.BLEND_RETRIEVAL
        for i in range(n):
            cand = retrieved[i]
            scores = ce.score_pairs(descs[i], [codes[j] for j in cand])
            reranked.append(cand[np.argsort(-scores)])
            # what serving does (CrossEncoder.rerank_batch): blend
            # min-max-normalized retrieval + cross-encoder scores
            base = sims[i, cand]

            def _norm(v):
                span = v.max() - v.min()
                return (v - v.min()) / span if span > 0 else np.zeros_like(v)

            blend = a * _norm(base) + (1 - a) * _norm(
                scores.astype(np.float64))
            blended_rows.append(cand[np.argsort(-blend)])
            if (i + 1) % 64 == 0:
                print(f"  reranked {i+1}/{n} "
                      f"({(time.time()-t0)/(i+1):.2f}s/q)", flush=True)
        results["cross_encoder_rerank"] = {
            **recalls(reranked, n),
            "s_per_query": round((time.time() - t0) / n, 3),
        }
        print("cross_encoder_rerank:", results["cross_encoder_rerank"],
              flush=True)
        results["blended_rerank"] = {
            **recalls(blended_rows, n),
            "blend_retrieval_weight": a,
        }
        print("blended_rerank:", results["blended_rerank"], flush=True)

    lex = CrossScorerReranker()
    lex_ranked = []
    for i in range(n):
        cand = retrieved[i]
        scores = np.array([lex.scorer(descs[i], codes[j]) for j in cand])
        lex_ranked.append(cand[np.argsort(-scores)])
    results["lexical_rerank"] = recalls(lex_ranked, n)
    print("lexical_rerank:", results["lexical_rerank"], flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
