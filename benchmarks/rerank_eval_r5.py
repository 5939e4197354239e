"""Feature-reranker eval: is reranking finally net-positive? (r5 item 5)

r4 verdict: the trained cross-encoder DEGRADES retrieval (recall@1
0.738 -> 0.227 pure / 0.723 blended on the Rust cross-repo pairs), so
rerank ships opt-in and the capability "reranking helps" is missing.
This harness evaluates the new FeatureReranker (search/reranker.py):
cheap ranking features (name-token overlap, identifier hits, path
match) STACKED on the z-scored retrieval score, so a zero-feature
candidate keeps its bi-encoder rank.

Protocol (superset of rerank_eval_r3.py):
- CALIBRATE feature weights on the PYTHON per-language pairs (this
  repo's own code, perlang_eval_r4.harvest_python_pairs) — a different
  language and corpus from the eval set, so no leakage;
- EVALUATE on the same 512 Rust cross-repo doc->code pairs as r3/r4:
  retrieval-only vs feature-rerank vs lexical-rerank recall@1/@10.
- Ship bar (VERDICT r4 item 5): feature recall@1 >= retrieval-only
  (0.738-class) — only then flip SearchConfig defaults.

Embeddings are cached in .bench/rerank_emb_r5.npz so feature iteration
doesn't pay the encoder.

Usage (TPU or CPU): python benchmarks/rerank_eval_r5.py
Writes .bench/rerank_eval_r5.json
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".bench", "rerank_eval_r5.json")
CACHE = os.path.join(REPO, ".bench", "rerank_emb_r5.npz")
RETRIEVE_K = 20


def recalls(order_rows, n):
    r1 = float(np.mean([row[0] == i for i, row in enumerate(order_rows)]))
    r10 = float(np.mean([i in row[:10] for i, row in enumerate(order_rows)]))
    return {"recall@1": round(r1, 4), "recall@10": round(r10, 4)}


def embed_sets(sets):
    """sets: {tag: (codes, descs)} -> cached {tag: (ec, ed)}"""
    from codegraph_tpu.models.providers import (
        EnsembleProvider, _default_checkpoint)

    if os.path.exists(CACHE):
        z = np.load(CACHE)
        if all(f"{t}_ec" in z for t in sets):
            return {t: (z[f"{t}_ec"], z[f"{t}_ed"]) for t in sets}
    prov = EnsembleProvider(dimension=768, checkpoint=_default_checkpoint())
    out, payload = {}, {}
    for tag, (codes, descs) in sets.items():
        t0 = time.time()
        ec = np.asarray(prov.embed_texts(codes), np.float32)
        ed = np.asarray(prov.embed_texts(descs), np.float32)
        ec /= np.maximum(np.linalg.norm(ec, axis=1, keepdims=True), 1e-9)
        ed /= np.maximum(np.linalg.norm(ed, axis=1, keepdims=True), 1e-9)
        out[tag] = (ec, ed)
        payload[f"{tag}_ec"], payload[f"{tag}_ed"] = ec, ed
        print(f"embedded {tag}: {len(codes)} pairs in {time.time()-t0:.0f}s",
              flush=True)
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez(CACHE, **payload)
    return out


def rank_with_features(sims, codes, descs, names, paths, weights):
    """Rerank the top-RETRIEVE_K of each row with FeatureReranker."""
    from codegraph_tpu.core.types import SearchResult
    from codegraph_tpu.search.reranker import FeatureReranker

    fr = FeatureReranker(*weights)
    retrieved = np.argsort(-sims, axis=1)[:, :RETRIEVE_K]
    rows = []
    for i in range(sims.shape[0]):
        cand = retrieved[i]
        results = [
            SearchResult(
                node_id=str(j), chunk_id=str(j), score=float(sims[i, j]),
                name=names[j], file_path=paths[j],
                snippet=codes[j][:400],
            )
            for j in cand
        ]
        ranked = fr.rerank(descs[i], results, RETRIEVE_K)
        rows.append(np.array([int(r.node_id) for r in ranked]))
    return rows


def guess_name(code: str) -> str:
    import re

    m = re.search(r"\b(?:fn|def|function|struct|class|trait|impl|enum)\s+"
                  r"([A-Za-z_]\w*)", code)
    return m.group(1) if m else (code.split("(")[0].split()[-1]
                                 if code.split() else "")


def main():
    # honor an explicit JAX_PLATFORMS=cpu (the sitecustomize TPU plugin
    # otherwise claims the chip even for this host-dominated eval)
    from codegraph_tpu.core.config import apply_platform_env
    apply_platform_env()

    from crossrepo_eval import harvest_rust_pairs
    from perlang_eval_r4 import harvest_python_pairs

    rust = harvest_rust_pairs("/root/reference/crates")
    py = harvest_python_pairs([
        os.path.join(REPO, "codegraph_tpu"), os.path.join(REPO, "tests")])
    print(f"{len(rust)} rust eval pairs, {len(py)} python calib pairs",
          flush=True)

    embs = embed_sets({
        "rust": ([c for c, _ in rust], [d for _, d in rust]),
        "py": ([c for c, _ in py], [d for _, d in py]),
    })

    results = {"n_rust": len(rust), "n_py_calib": len(py),
               "retrieve_k": RETRIEVE_K}

    def block(tag, pairs):
        ec, ed = embs[tag]
        sims = ed @ ec.T
        codes = [c for c, _ in pairs]
        descs = [d for _, d in pairs]
        names = [guess_name(c) for c in codes]
        paths = [""] * len(codes)  # pair harvest has no paths
        return sims, codes, descs, names, paths

    # ---- calibrate on python (grid over name/snip weights) --------------
    sims, codes, descs, names, paths = block("py", py)
    base_py = recalls(np.argsort(-sims, axis=1), len(py))
    best_w, best_r1 = None, -1.0
    for wn, ws in itertools.product([0.0, 0.15, 0.3, 0.5],
                                    [0.0, 0.1, 0.2, 0.3]):
        rows = rank_with_features(sims, codes, descs, names, paths,
                                  (wn, ws, 0.0, 0.0))
        r = recalls(rows, len(py))
        if r["recall@1"] > best_r1:
            best_r1, best_w = r["recall@1"], (wn, ws)
    results["calibration"] = {
        "python_retrieval_only": base_py,
        "best_weights": {"w_name": best_w[0], "w_snip": best_w[1]},
        "python_feature_recall@1": round(best_r1, 4),
    }
    print("calibration:", results["calibration"], flush=True)

    # ---- evaluate on rust (untouched weights) ----------------------------
    sims, codes, descs, names, paths = block("rust", rust)
    results["retrieval_only"] = recalls(np.argsort(-sims, axis=1), len(rust))
    rows = rank_with_features(sims, codes, descs, names, paths,
                              (best_w[0], best_w[1], 0.0, 0.0))
    results["feature_rerank"] = recalls(rows, len(rust))
    # default-weight variant (what make_reranker_pipeline constructs)
    rows_d = rank_with_features(sims, codes, descs, names, paths,
                                (0.30, 0.15, 0.10, 0.05))
    results["feature_rerank_default_weights"] = recalls(rows_d, len(rust))

    from codegraph_tpu.search.reranker import CrossScorerReranker
    lex = CrossScorerReranker()
    retrieved = np.argsort(-sims, axis=1)[:, :RETRIEVE_K]
    lex_rows = []
    for i in range(len(rust)):
        cand = retrieved[i]
        scores = np.array([lex.scorer(descs[i], codes[j]) for j in cand])
        lex_rows.append(cand[np.argsort(-scores)])
    results["lexical_rerank"] = recalls(lex_rows, len(rust))

    results["ship_bar"] = {
        "feature_ge_retrieval": results["feature_rerank"]["recall@1"]
        >= results["retrieval_only"]["recall@1"],
        "bar": "feature recall@1 >= retrieval-only recall@1 "
               "(VERDICT r4 item 5)",
    }
    for k in ("retrieval_only", "feature_rerank",
              "feature_rerank_default_weights", "lexical_rerank",
              "ship_bar"):
        print(k, results[k], flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
