import numpy as np
import pytest

from codegraph_tpu.core.types import CodeNode, Language, Location, NodeType
from codegraph_tpu.ml.ab_testing import ABTestingFramework
from codegraph_tpu.ml.drift import DriftDetector
from codegraph_tpu.ml.features import extract_code_features


def test_ab_assignment_deterministic_and_split():
    fw = ABTestingFramework()
    fw.create("rerank_onoff", ["control", "treatment"], [0.5, 0.5])
    arms = [fw.assign("rerank_onoff", f"user{i}") for i in range(400)]
    assert arms[0] == fw.assign("rerank_onoff", "user0")  # sticky
    frac = arms.count("treatment") / len(arms)
    assert 0.35 < frac < 0.65


def test_ab_significance_and_early_stop(rng):
    fw = ABTestingFramework()
    exp = fw.create("latency", ["a", "b"], min_samples=30)
    for _ in range(100):
        exp.record("a", rng.normal(100, 5))
        exp.record("b", rng.normal(80, 5))  # clearly better (lower)
    t, p = exp.welch_t("a", "b")
    assert p < 0.01
    u, p_mw = exp.mann_whitney("a", "b")
    assert p_mw < 0.01
    diff, (lo, hi) = exp.bootstrap_diff("a", "b", n_boot=200)
    assert lo > 10  # CI excludes 0
    assert exp.check_early_stop(lower_is_better=True) == "b"
    rep = exp.report()
    assert rep["winner"] == "b" and rep["arms"]["a"]["n"] == 100


def test_ab_no_false_positive(rng):
    fw = ABTestingFramework()
    exp = fw.create("noop", ["a", "b"], min_samples=30)
    for _ in range(50):
        exp.record("a", rng.normal(100, 5))
        exp.record("b", rng.normal(100, 5))
    assert exp.check_early_stop() is None or exp.report()["p_value"] < 0.05


def test_drift_detector(rng):
    ref = rng.standard_normal((2000, 32)).astype(np.float32)
    det = DriftDetector(ref)
    same = rng.standard_normal((500, 32)).astype(np.float32)
    rep = det.check(same)
    assert not rep.drifted
    shifted = same + 3.0  # gross mean shift
    rep2 = det.check(shifted)
    assert rep2.drifted
    assert rep2.psi > rep.psi and rep2.ks_statistic > rep.ks_statistic


def test_code_features():
    node = CodeNode.make(
        "p", "compute_total", NodeType.FUNCTION, Language.PYTHON,
        Location("a.py", 1, 6),
        content="def compute_total(xs):\n    # sum them\n    t = 0\n"
                "    for x in xs:\n        if x > 0:\n            t += x\n"
                "    return t",
        complexity=3,
    )
    node.metadata["references"] = 4
    f = extract_code_features(node)
    assert f["n_lines"] == 7
    assert f["cyclomatic"] == 3
    assert f["references"] == 4
    assert f["control_density"] > 0
    assert 0 < f["vocab_richness"] <= 1
