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


def test_pipeline_retrain_trigger(rng):
    """Drift -> retrain loop (ml/pipeline.rs:22-768 retrain triggers):
    consecutive drifted batches + min samples + cooldown fire the
    retrain callback; success resets the baseline to the new regime."""
    from codegraph_tpu.ml.pipeline import MLPipeline, RetrainPolicy

    ref = rng.standard_normal((2000, 32)).astype(np.float32)
    calls = []
    clock = [0.0]

    def retrain(samples):
        calls.append(len(samples))
        return True

    pipe = MLPipeline(
        ref, retrain_fn=retrain,
        policy=RetrainPolicy(consecutive_drifted=3, cooldown_s=10.0,
                             min_samples=500),
        clock=lambda: clock[0],
    )
    # in-distribution batches: no streak, no retrain
    for _ in range(3):
        r = pipe.observe(rng.standard_normal((256, 32)).astype(np.float32))
        assert not r.drifted
    assert pipe.stats()["retrains"] == 0
    # shifted regime: 3 consecutive drifted batches trigger one retrain
    for _ in range(3):
        r = pipe.observe(
            (rng.standard_normal((256, 32)) + 4.0).astype(np.float32))
        assert r.drifted
    assert calls == [768]
    assert pipe.stats()["retrains"] == 1
    assert pipe.events[0].succeeded
    # baseline refreshed: the shifted regime is now normal
    r = pipe.observe((rng.standard_normal((256, 32)) + 4.0).astype(np.float32))
    assert not r.drifted
    # cooldown: immediate new drift can't retrain again
    for _ in range(4):
        pipe.observe((rng.standard_normal((256, 32)) - 6.0).astype(np.float32))
    assert pipe.stats()["retrains"] == 1
    clock[0] = 100.0
    pipe.observe((rng.standard_normal((256, 32)) - 6.0).astype(np.float32))
    assert pipe.stats()["retrains"] == 2


def test_pipeline_failed_retrain_keeps_baseline(rng):
    from codegraph_tpu.ml.pipeline import MLPipeline, RetrainPolicy

    ref = rng.standard_normal((1000, 16)).astype(np.float32)
    pipe = MLPipeline(
        ref, retrain_fn=lambda s: False,
        policy=RetrainPolicy(consecutive_drifted=2, cooldown_s=0.0,
                             min_samples=100),
    )
    for _ in range(2):
        pipe.observe((rng.standard_normal((128, 16)) + 5.0).astype(np.float32))
    assert pipe.stats()["retrains"] == 1
    assert not pipe.events[0].succeeded
    # baseline unchanged: the shifted regime still reads as drifted
    r = pipe.observe((rng.standard_normal((128, 16)) + 5.0).astype(np.float32))
    assert r.drifted


def test_mann_whitney_midranks_on_ties():
    """Tied values get midranks (+ tie-corrected sigma) — the old
    argsort-of-argsort ranks made p depend on arbitrary ordering."""
    from codegraph_tpu.ml.ab_testing import ABExperiment

    t = ABExperiment("exp", arms=["a", "b"], traffic=[0.5, 0.5])
    # identical heavy-tie distributions: U must be exactly n*m/2
    for v in [1.0, 1.0, 2.0, 2.0, 2.0, 3.0]:
        t.record("a", v)
        t.record("b", v)
    u, p = t.mann_whitney("a", "b")
    assert abs(u - 18.0) < 1e-9  # na*nb/2 = 6*6/2
    assert p > 0.9


def test_ml_lifecycle_facade(tmp_path):
    """MLLifecycle composes registry/inference/AB/features/drift behind
    the reference's MLPipeline surface (pipeline.rs:202-660)."""
    import numpy as np

    from codegraph_tpu.ml.pipeline import MLLifecycle, PipelineStatus
    from codegraph_tpu.models.providers import HashProvider

    life = MLLifecycle()
    life.register_model("a", HashProvider(32))
    life.register_model("b", HashProvider(64))

    # inference + registry validation
    e = life.predict("a", "def f(): pass")
    assert e.shape == (32,)
    assert life.predict_batch("b", ["x", "y"]).shape == (2, 64)
    with pytest.raises(KeyError):
        life.predict("missing", "x")

    # A/B: sticky assignment, recorded outcomes, analyzable
    life.start_ab_test("exp", ["a", "b"])
    arm1, emb = life.predict_with_ab_test("exp", "user-1", ["q"])
    arm2, _ = life.predict_with_ab_test("exp", "user-1", ["q"])
    assert arm1 == arm2 and arm1 in ("a", "b")
    life.record_ab("exp", arm1, 0.5)
    rep = life.analyze_ab_test("exp")
    assert rep["arms"][arm1]["n"] == 1

    # pause/resume gates inference
    life.pause()
    assert life.get_status() == PipelineStatus.PAUSED
    with pytest.raises(RuntimeError):
        life.predict("a", "x")
    life.resume()
    assert life.get_status() == PipelineStatus.READY

    # train_model: success registers; failure -> ERROR state
    life.train_model("c", lambda: HashProvider(16))
    assert life.predict("c", "x").shape == (16,)
    with pytest.raises(ValueError):
        life.train_model("d", lambda: (_ for _ in ()).throw(ValueError("x")))
    assert life.get_status() == PipelineStatus.ERROR
    assert "ValueError" in life.get_context()["error"]

    # performance monitoring pulls provider metrics
    perf = life.monitor_performance()
    assert perf["a"]["texts"] >= 1


def test_ml_lifecycle_drift_retrain():
    import numpy as np

    from codegraph_tpu.ml.drift import DriftThresholds
    from codegraph_tpu.ml.pipeline import MLLifecycle, RetrainPolicy

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((512, 16)).astype(np.float32)
    calls = []

    life = MLLifecycle(
        drift_reference=ref,
        retrain_fn=lambda s: (calls.append(len(s)), True)[1],
        policy=RetrainPolicy(consecutive_drifted=2, cooldown_s=0.0,
                             min_samples=64),
    )
    # drifted batches: shifted distribution
    for _ in range(3):
        life.observe(rng.standard_normal((128, 16)).astype(np.float32) + 4.0)
    assert calls, "retrain should have fired on sustained drift"
    assert life.get_context()["drift"]["retrains"] >= 1


def test_ml_lifecycle_model_save_load(tmp_path):
    from codegraph_tpu.ml.pipeline import MLLifecycle
    from codegraph_tpu.models.providers import EncoderProvider

    life = MLLifecycle()
    life.register_model("enc", EncoderProvider(dimension=64, max_len=32))
    path = str(tmp_path / "enc.npz")
    life.save_model("enc", path)
    life.load_model("enc2", path)
    a = life.predict("enc", "def f(): pass")
    b = life.predict("enc2", "def f(): pass")
    import numpy as np

    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
