"""Diagnose the r4 nprobe-invariant recall (VERDICT r5 item 1).

The r4 10M sweep (.bench/ivfpq_operating_point_r4.json) showed recall@10
bit-identical across nprobe 4->64 at every refine level, with pure-ADC
recall 0.031. Two candidate explanations:
  (a) BUG: the nprobe plumbed into ivfpq_search_pallas doesn't change
      the candidate set;
  (b) CORPUS ARTIFACT: the sigma=0.25 synthetic places each query's
      entire true top-10 inside its top-1 coarse cell (so probing more
      cells only adds cosine~0 strangers), while PQ can't rank the
      ~640-way near-tie inside that cell.

This script separates them with three measurements on a scaled-down
replica of the exact r4 generator (same distribution shape; runs on CPU):

  1. probe-set difference: |cells(np=4) vs cells(np=64)| per query —
     if the sets differ, nprobe IS plumbed through.
  2. oracle-cell rank histogram: for each oracle top-10 neighbor, the
     rank of its cell in the query's coarse-score ordering. If the mass
     sits at rank 0, recall CANNOT depend on nprobe (artifact).
  3. within-cluster margin vs PQ distortion: the score gap between the
     10th and 11th true neighbor, vs the ADC residual-quantization
     error scale. Margin << distortion => ADC ranking is noise (the
     0.031 rf0 recall).

And one positive control: a corpus whose neighbors straddle cells
(uniform, no cluster structure) must show recall RISING with nprobe
through the very same ivfpq_search_pallas/-kernel path — proving the
plumbing works.

Run: python benchmarks/ivfpq_diag_r5.py  (CPU, ~2 min)
Writes .bench/ivfpq_diag_r5.json
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "ivfpq_diag_r5.json")


def main() -> None:
    # This diagnosis is CPU-only by design — it must never contend for
    # the process-exclusive TPU (the op sweep owns it). Force cpu before
    # any backend init; the sitecustomize's env override loses to
    # jax.config.update.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from codegraph_tpu.index.ivfpq import IVFPQIndex

    # scaled replica of the r4 generator: keep rows/centers ratio (~640
    # rows per natural cluster) and nlist/centers ratio (0.5)
    N, D, CENTERS, SIGMA = 262_144, 256, 409, 0.25
    NLIST, M, Q, K = 204, 32, 256, 10
    rng = np.random.default_rng(99)
    centers = rng.normal(size=(CENTERS, D)).astype(np.float32)

    def norm(v):
        return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)

    which = rng.integers(0, CENTERS, N)
    x = norm(centers[which] + SIGMA * rng.normal(size=(N, D)).astype(np.float32))
    qwhich = rng.integers(0, CENTERS, Q)
    q = norm(centers[qwhich] + SIGMA * rng.normal(size=(Q, D)).astype(np.float32))

    # exact oracle
    scores = q @ x.T                                   # [Q, N]
    oracle = np.argsort(-scores, axis=1)[:, : K + 1]   # keep 11th for margins

    idx = IVFPQIndex(D, nlist=NLIST, nprobe=8, m=M, kmeans_iters=8,
                     pq_iters=6, refine="none")
    idx.train(x[:65536])
    idx.add(x)

    res: dict = {"config": {
        "rows": N, "dim": D, "centers": CENTERS, "sigma": SIGMA,
        "nlist": NLIST, "m": M, "queries": Q, "k": K,
        "note": "scaled replica of the r4 10M generator "
                "(same rows/centers and nlist/centers ratios)"}}

    # -- 1. probe sets actually change with nprobe --------------------------
    cents = np.asarray(idx._centroids)
    c_scores = q @ cents.T                              # [Q, nlist]
    probe_order = np.argsort(-c_scores, axis=1)         # [Q, nlist]
    new_cells = [len(set(probe_order[b, :64]) - set(probe_order[b, :4]))
                 for b in range(Q)]
    res["probe_set"] = {
        "mean_new_cells_np4_to_np64": float(np.mean(new_cells)),
        "plumbing": "np=64 probes 60 additional cells per query",
    }

    # -- 2. where do the oracle neighbors live? -----------------------------
    # cell of every row = the cell its id landed in
    ids = np.asarray(idx._ids)                          # [nlist, cap]
    row_cell = np.full(N, -1, np.int64)
    for c in range(NLIST):
        live = ids[c][ids[c] >= 0]
        row_cell[live] = c
    # rank of each oracle neighbor's cell in the query's probe ordering
    rank_of_cell = np.argsort(probe_order, axis=1)      # [Q, nlist]
    nb_cells = row_cell[oracle[:, :K]]                  # [Q, K]
    nb_rank = np.take_along_axis(rank_of_cell, nb_cells, axis=1)  # [Q, K]
    hist = np.bincount(nb_rank.reshape(-1), minlength=NLIST)
    res["oracle_cell_rank"] = {
        "frac_rank0": float(hist[0] / (Q * K)),
        "frac_rank_lt4": float(hist[:4].sum() / (Q * K)),
        "frac_rank_lt64": float(hist[:64].sum() / (Q * K)),
        "meaning": "fraction of true top-10 neighbors whose cell is the "
                   "query's #1 / top-4 / top-64 coarse cell",
    }

    # -- 3. margins vs PQ distortion ----------------------------------------
    s_sorted = -np.sort(-scores, axis=1)
    margin_10_11 = s_sorted[:, K - 1] - s_sorted[:, K]
    # ADC score error per row ~ q . (residual - decode(residual)); measure
    # it directly on a sample
    from codegraph_tpu.ops.pq import pq_decode, pq_encode
    sample = rng.choice(N, 4096, replace=False)
    xs = jnp.asarray(x[sample])
    cells_s = jnp.asarray(row_cell[sample])
    resid = xs - jnp.take(idx._centroids, cells_s, axis=0)
    codes = pq_encode(resid, idx._books)
    recon = pq_decode(codes, idx._books)
    err = np.asarray(resid - recon)                     # [S, D]
    # per-(query,row) ADC error = q . err; std over random pairs
    adc_err = (q[:64] @ err.T).reshape(-1)
    res["margins"] = {
        "true_margin_10_11_mean": float(np.mean(margin_10_11)),
        "adc_score_error_std": float(np.std(adc_err)),
        "ratio_err_over_margin": float(np.std(adc_err)
                                       / max(np.mean(margin_10_11), 1e-9)),
        "meaning": "ADC error >> neighbor margin ==> PQ ranking inside "
                   "the cluster is noise",
    }

    # -- recall vs nprobe on THIS corpus (replicates r4 flatness) -----------
    rec = {}
    for npb in (1, 4, 16, 64):
        _, i_np = idx.search(q, K, nprobe=npb)
        rec[f"np{npb}"] = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(i_np, oracle[:, :K])]))
    res["recall_vs_nprobe_clustered"] = rec

    # -- positive control: uniform corpus, same code path --------------------
    xu = norm(rng.normal(size=(N // 4, D)).astype(np.float32))
    qu = norm(rng.normal(size=(Q, D)).astype(np.float32))
    su = qu @ xu.T
    ou = np.argsort(-su, axis=1)[:, :K]
    idx2 = IVFPQIndex(D, nlist=NLIST, nprobe=8, m=M, kmeans_iters=8,
                      pq_iters=6, refine="f32", refine_factor=8)
    idx2.train(xu[:65536])
    idx2.add(xu)
    rec_u = {}
    for npb in (1, 4, 16, 64):
        _, i_np = idx2.search(qu, K, nprobe=npb)
        rec_u[f"np{npb}"] = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(i_np, ou)]))
    res["recall_vs_nprobe_uniform_control"] = rec_u

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
