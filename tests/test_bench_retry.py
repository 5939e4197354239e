"""bench.py wedged-relay retry wrapper (driver-facing resilience).

The driver runs bench.py on the real chip at round end; the axon relay
refuses claims for minutes after any crashed TPU process. The wrapper
must retry transient claim failures by re-exec (jax caches a failed
backend for the process lifetime) and re-raise everything else.
"""

import importlib.util
import os

import pytest


@pytest.fixture()
def benchmod():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("benchmod_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_non_transient_reraises(benchmod, monkeypatch):
    monkeypatch.delenv("BENCH_ATTEMPT", raising=False)
    with pytest.raises(ValueError):
        benchmod._retry_or_raise(ValueError("boom"))


def test_max_attempts_reraises(benchmod, monkeypatch):
    monkeypatch.setenv("BENCH_ATTEMPT", str(benchmod.MAX_ATTEMPTS))
    with pytest.raises(RuntimeError):
        benchmod._retry_or_raise(
            RuntimeError("UNAVAILABLE: TPU backend setup/compile error"))


def test_transient_reexecs(benchmod, monkeypatch):
    calls = {}
    monkeypatch.setenv("BENCH_ATTEMPT", "1")
    monkeypatch.setattr(benchmod.time, "sleep", lambda s: calls.setdefault(
        "slept", s))
    monkeypatch.setattr(benchmod.os, "execv", lambda exe, argv: calls.update(
        exe=exe, argv=argv))
    benchmod._retry_or_raise(
        RuntimeError("UNAVAILABLE: TPU backend setup/compile error"))
    assert calls["slept"] == benchmod.RETRY_WAIT_S
    assert calls["argv"][1].endswith("bench.py")
    assert os.environ["BENCH_ATTEMPT"] == "2"


def test_bad_attempt_env_defaults(benchmod, monkeypatch):
    monkeypatch.setenv("BENCH_ATTEMPT", "not-a-number")
    assert benchmod._attempt() == 1
