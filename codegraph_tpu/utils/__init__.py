"""Observability + resilience utilities.

Re-implements the reference's auxiliary subsystems (SURVEY.md section 5):
PerformanceMonitor targets/alerts (codegraph-core/src/
performance_monitor.rs), heartbeat liveness (codegraph-mcp/src/
heartbeat.rs), daemon circuit breaker (codegraph-mcp-daemon/src/daemon/
health.rs), and the agent debug logger (codegraph-mcp-core/src/
debug_logger.rs).
"""

from codegraph_tpu.utils.perfmon import PerformanceMonitor, PerformanceTargets
from codegraph_tpu.utils.heartbeat import HeartbeatMonitor
from codegraph_tpu.utils.circuit import CircuitBreaker, CircuitState
from codegraph_tpu.utils.debug_logger import DebugLogger

__all__ = [
    "PerformanceMonitor",
    "PerformanceTargets",
    "HeartbeatMonitor",
    "CircuitBreaker",
    "CircuitState",
    "DebugLogger",
]
