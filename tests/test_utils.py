import json

import pytest

from codegraph_tpu.utils.circuit import CircuitBreaker, CircuitState
from codegraph_tpu.utils.heartbeat import HeartbeatMonitor, LivenessState
from codegraph_tpu.utils.perfmon import PerformanceMonitor, PerformanceTargets


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def test_circuit_breaker_trip_and_recover():
    clock = FakeClock()
    cb = CircuitBreaker(failure_threshold=3, backoff_base_s=10.0, clock=clock)
    assert cb.should_allow_request()
    for _ in range(3):
        cb.record_failure()
    assert cb.state == CircuitState.OPEN
    assert not cb.should_allow_request()
    clock.advance(10.1)
    assert cb.should_allow_request()  # half-open probe
    assert cb.state == CircuitState.HALF_OPEN
    cb.record_success()
    assert cb.state == CircuitState.CLOSED


def test_circuit_breaker_exponential_backoff():
    clock = FakeClock()
    cb = CircuitBreaker(failure_threshold=1, backoff_base_s=1.0,
                        backoff_max_s=8.0, clock=clock)
    cb.record_failure()
    assert cb.cooldown_remaining_s == pytest.approx(1.0)
    clock.advance(1.1)
    cb.should_allow_request()  # half-open
    cb.record_failure()        # re-trip doubles
    assert cb.cooldown_remaining_s == pytest.approx(2.0)
    clock.advance(2.1)
    cb.should_allow_request()
    cb.record_failure()
    assert cb.cooldown_remaining_s == pytest.approx(4.0)


def test_heartbeat_states():
    clock = FakeClock()
    hb = HeartbeatMonitor(interval_s=5.0, max_missed=3, clock=clock)
    assert hb.state == LivenessState.HEALTHY
    clock.advance(6)
    assert hb.state == LivenessState.DEGRADED
    clock.advance(10)
    assert hb.state == LivenessState.FAILED
    hb.pong()
    assert hb.state == LivenessState.HEALTHY


def test_perfmon_targets_and_alerts():
    alerts = []
    mon = PerformanceMonitor(on_alert=alerts.append)
    mon.record("vector_search_ms", 50.0)   # beats target
    mon.record("vector_search_ms", 250.0)  # misses 200ms baseline -> alert
    assert len(alerts) == 1
    mon.record("query_qps", 500.0)  # below 1000 baseline (higher better)
    assert len(alerts) == 2
    report = mon.report()
    assert report["vector_search_ms"]["baseline"] == 200.0
    assert "meets_target" in report["vector_search_ms"]


def test_perfmon_timer():
    mon = PerformanceMonitor()
    with mon.timer("node_query_ms"):
        pass
    assert mon.metrics["node_query_ms"].values


def test_debug_logger(tmp_path):
    from codegraph_tpu.utils.debug_logger import DebugLogger

    path = tmp_path / "trace.jsonl"
    log = DebugLogger(str(path))
    log.tool_call("semantic_code_search", {"query": "x"}, "result text")
    log.reasoning("react", "thinking...")
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["kind"] == "tool_call"
    assert lines[1]["kind"] == "reasoning"
    # disabled logger writes nothing
    off = DebugLogger("")
    assert not off.enabled


def test_circuit_half_open_single_probe():
    """HALF_OPEN admits exactly one probe until it resolves — N callers
    must not herd onto a still-failing backend."""
    from codegraph_tpu.utils.circuit import CircuitBreaker, CircuitState

    t = [0.0]
    cb = CircuitBreaker(failure_threshold=1, backoff_base_s=1.0,
                        clock=lambda: t[0])
    cb.record_failure()
    assert cb.state == CircuitState.OPEN
    t[0] = 2.0
    assert cb.should_allow_request()        # the single probe
    assert cb.state == CircuitState.HALF_OPEN
    assert not cb.should_allow_request()    # everyone else waits
    cb.record_failure()                     # probe failed -> reopen
    assert cb.state == CircuitState.OPEN
    t[0] = 10.0
    assert cb.should_allow_request()
    cb.record_success()
    assert cb.state == CircuitState.CLOSED
    assert cb.should_allow_request()
