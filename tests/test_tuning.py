import pytest

from codegraph_tpu.core.config import CodeGraphConfig
from codegraph_tpu.utils.tuning import apply_plan, plan_index


def test_small_corpus_exact_f32():
    plan = plan_index(50_000, 384)
    assert plan.kind == "flat" and plan.dtype == "float32"


def test_medium_corpus_bf16():
    plan = plan_index(1_000_000, 768)
    assert plan.kind == "flat" and plan.dtype == "bfloat16"


def test_memory_pressure_int8():
    plan = plan_index(1_500_000, 768, hbm_budget_bytes=2 << 30)
    assert plan.dtype == "int8" and plan.rescore_k == 100


def test_large_corpus_int8_not_raw_ivf():
    """10M x 768: bf16 (15.4GB) over budget but int8 (7.7GB) fits ->
    exact int8 scan (the measured 6k-QPS config), NOT raw IVF whose
    padded bf16 cells could never fit."""
    plan = plan_index(10_000_000, 768)
    assert plan.kind == "flat" and plan.dtype == "int8"


def test_large_batch_hint_selects_ivf():
    """Raw IVF only wins for big offline batches on corpora whose
    padded cells fit (measured: flat beats IVF at B=256 at 1M-4M)."""
    plan = plan_index(4_000_000, 768, batch_hint=2048,
                      hbm_budget_bytes=16 << 30)
    assert plan.kind == "ivf"
    assert plan.nlist & (plan.nlist - 1) == 0  # power of two
    assert 8 <= plan.nprobe <= plan.nlist
    # higher target recall -> more probes
    plan_hi = plan_index(4_000_000, 768, batch_hint=2048,
                         hbm_budget_bytes=16 << 30, target_recall=0.99)
    assert plan_hi.nprobe >= plan.nprobe
    # same corpus at serving batch sizes: exact scan
    serving = plan_index(4_000_000, 768, hbm_budget_bytes=16 << 30)
    assert serving.kind == "flat" and serving.dtype == "bfloat16"


def test_apply_plan():
    cfg = CodeGraphConfig()
    plan = plan_index(4_000_000, 768, batch_hint=2048,
                      hbm_budget_bytes=16 << 30)
    apply_plan(cfg, plan)
    assert cfg.index.kind == "ivf" and cfg.index.nlist == plan.nlist


def test_plan_ivfpq_for_hbm_overflow():
    from codegraph_tpu.utils.tuning import plan_index

    # 100M x 768: int8 matrix alone is 76.8GB >> budget -> IVF-PQ
    plan = plan_index(100_000_000, 768, hbm_budget_bytes=8 << 30)
    assert plan.kind == "ivfpq"
    assert plan.pq_m == 96
    assert plan.refine == "int8"
    assert plan.nlist > 0 and plan.nprobe > 0
