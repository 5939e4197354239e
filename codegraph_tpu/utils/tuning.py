"""Auto-tuning coordinator: pick index layout + kernel knobs from the
corpus profile.

Reference: crates/codegraph-core/src/optimization_coordinator.rs:11-589
(memory/CPU/IO "clusters" of tuning knobs). TPU re-design: the knobs
that matter are index kind (flat vs IVF), storage dtype (f32/bf16/int8),
tile sizes, and IVF nlist/nprobe — all derivable from corpus size,
dimension, and the device HBM budget.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass
class IndexPlan:
    kind: str           # flat | ivf | ivfpq
    dtype: str          # float32 | bfloat16 | int8
    tile_n: int
    nlist: int = 0
    nprobe: int = 0
    rescore_k: int = 0
    pq_m: int = 0       # ivfpq: bytes per row
    refine: str = ""    # ivfpq: none | int8 | f32 host rescore store
    reason: str = ""

    def to_dict(self):
        return dataclasses.asdict(self)


# conservative HBM budget per chip for the embedding matrix (bytes);
# v5e has 16GB, leave headroom for activations/duplicates
DEFAULT_HBM_BUDGET = 8 << 30

_DTYPE_BYTES = {"float32": 4, "bfloat16": 2, "int8": 1}


IVF_CAPACITY_FACTOR = 1.5  # padded cell storage overhead vs flat


def plan_index(
    n_vectors: int,
    dim: int,
    hbm_budget_bytes: int = DEFAULT_HBM_BUDGET,
    target_recall: float = 0.95,
    batch_hint: int = 256,
) -> IndexPlan:
    """Choose the index configuration for a corpus.

    Policy (round-2 measured, .bench/build_device.json +
    BENCH_SWEEP_TPU.json):
    * small corpora (< 200k rows): exact flat f32 — scan cost is trivial
      and recall is perfect.
    * bf16 fits the budget: flat bf16 exact scan. Raw-vector IVF is
      DOMINATED by the exact scan at serving batch sizes — measured at
      1M/2M/4M x 768, flat bf16 does 2.6-3.2k QPS at B=256 (exact)
      vs IVF nprobe=4's 1.2-2.4k QPS at recall 0.89-0.96: both are
      dispatch-bound and IVF adds gather overhead while saving FLOPs
      nobody is waiting on. Exception: large offline batches
      (batch_hint >= 1024) amortize dispatch, scan FLOPs dominate, and
      cell probing pays — then IVF bf16 (if its padded cells fit).
    * bf16 over budget, int8 fits: flat int8 + rescore (config 2 —
      6,044 QPS exact at ~10M x 768 on one chip, round 1).
    * int8 over budget (~100M x 768): IVF-PQ capacity tier — m-byte
      residual codes + per-cell-DMA Pallas ADC (2.6k QPS at 10M) +
      int8 host refine.
    """
    f32_bytes = n_vectors * dim * 4
    bf16_bytes = n_vectors * dim * 2
    int8_bytes = n_vectors * dim
    ivf_bf16_bytes = int(bf16_bytes * IVF_CAPACITY_FACTOR)

    nlist = 1 << max(8, min(16, round(math.log2(4 * math.sqrt(n_vectors)))))
    # nprobe fraction rises with target recall; 1.5% at 0.95 is a sane
    # starting point for clustered data, sweep refines it
    frac = 0.01 + 0.08 * max(0.0, target_recall - 0.9)
    nprobe = max(8, min(nlist, int(nlist * frac)))

    if n_vectors < 200_000 and f32_bytes <= hbm_budget_bytes:
        return IndexPlan(
            kind="flat", dtype="float32", tile_n=_tile_n(n_vectors),
            reason="small corpus: exact f32 scan",
        )
    if bf16_bytes <= hbm_budget_bytes:
        if (batch_hint >= 1024 and n_vectors >= 2_000_000
                and ivf_bf16_bytes <= hbm_budget_bytes):
            return IndexPlan(
                kind="ivf", dtype="bfloat16", tile_n=_tile_n(n_vectors),
                nlist=nlist, nprobe=nprobe, rescore_k=100,
                reason=(f"large offline batches (B>={batch_hint}): "
                        f"IVF nlist={nlist} nprobe={nprobe} amortizes "
                        "dispatch, cell probing cuts scan FLOPs"),
            )
        return IndexPlan(
            kind="flat", dtype="bfloat16", tile_n=_tile_n(n_vectors),
            reason=("bf16 exact scan: measured faster than raw IVF at "
                    "serving batch sizes (and exact)"),
        )
    if int8_bytes <= hbm_budget_bytes:
        return IndexPlan(
            kind="flat", dtype="int8", tile_n=_tile_n(n_vectors),
            rescore_k=100,
            reason="bf16 over HBM budget: int8 scan + rescore (config 2)",
        )
    # even 1 byte/dim won't fit: compress rows to m-byte residual PQ
    # codes (index/ivfpq.py) and keep an int8 refine store in host RAM
    pq_m = max(8, dim // 8)
    return IndexPlan(
        kind="ivfpq", dtype="int8", tile_n=_tile_n(n_vectors),
        nlist=nlist, nprobe=nprobe, rescore_k=100,
        pq_m=pq_m, refine="int8",
        reason=(f"int8 matrix over HBM budget: IVF-PQ m={pq_m} "
                f"nlist={nlist} nprobe={nprobe} + int8 host refine"),
    )


def _tile_n(n_vectors: int) -> int:
    if n_vectors < 100_000:
        return 1024
    if n_vectors < 5_000_000:
        return 2048
    return 4096


def apply_plan(config, plan: IndexPlan) -> None:
    """Write a plan into a CodeGraphConfig's index section."""
    config.index.kind = plan.kind
    config.index.dtype = plan.dtype
    if plan.nlist:
        config.index.nlist = plan.nlist
        config.index.nprobe = plan.nprobe
    if plan.rescore_k:
        config.index.rescore_k = plan.rescore_k
    if plan.pq_m:
        config.index.pq_m = plan.pq_m
    if plan.refine:
        config.index.pq_refine = plan.refine


__all__ = ["IndexPlan", "plan_index", "apply_plan", "DEFAULT_HBM_BUDGET"]
