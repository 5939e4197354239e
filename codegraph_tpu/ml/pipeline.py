"""ML lifecycle pipeline: drift monitoring -> retrain triggers.

Reference: crates/codegraph-vector/src/ml/pipeline.rs:22-768 —
MLPipelineConfig wiring the drift detectors (KL/PSI/KS, :98-108) to
retrain actions with trigger policies. Round 1 shipped detection only
(ml/drift.py); this closes the loop: observed embedding batches feed
the detector, a policy decides when drift warrants retraining
(consecutive drifted batches + cooldown + minimum accumulated samples),
and the retrain callback runs with the accumulated drifted sample pool.
The reference executes its retrain as a training job; here the callback
seam lets deployments plug the contrastive trainer
(models/training.py / benchmarks/train_bpe_encoder.py) or any external
process.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from codegraph_tpu.ml.drift import DriftDetector, DriftReport, DriftThresholds

logger = logging.getLogger("codegraph_tpu.ml")


@dataclass
class RetrainPolicy:
    """When does drift trigger a retrain (pipeline.rs trigger config)."""

    consecutive_drifted: int = 3      # drifted batches in a row
    cooldown_s: float = 3600.0        # min seconds between retrains
    min_samples: int = 512            # accumulated drifted rows needed
    max_pool: int = 50_000            # retain at most this many rows


@dataclass
class RetrainEvent:
    at: float
    reports: List[DriftReport]
    n_samples: int
    succeeded: bool
    detail: str = ""


class MLPipeline:
    """observe(batch) -> DriftReport, firing retrain_fn per policy.

    retrain_fn(samples [N, D]) -> bool; on success the detector's
    reference distribution is refreshed from the pool (the new "normal"),
    matching the reference pipeline's post-retrain baseline reset.
    """

    def __init__(
        self,
        reference: np.ndarray,
        retrain_fn: Optional[Callable[[np.ndarray], bool]] = None,
        policy: Optional[RetrainPolicy] = None,
        thresholds: Optional[DriftThresholds] = None,
        clock: Callable[[], float] = time.monotonic,
    ):
        self._reference = np.asarray(reference, np.float32)
        self._thresholds = thresholds
        self.detector = DriftDetector(self._reference, thresholds=thresholds)
        self.retrain_fn = retrain_fn
        self.policy = policy or RetrainPolicy()
        self._clock = clock
        self._streak: List[DriftReport] = []
        self._pool: List[np.ndarray] = []
        self._pool_rows = 0
        self._last_retrain = -float("inf")
        self.events: List[RetrainEvent] = []

    # -- observation -------------------------------------------------------

    def observe(self, batch: np.ndarray) -> DriftReport:
        report = self.detector.check(batch)
        if report.drifted:
            self._streak.append(report)
            self._pool.append(np.asarray(batch, np.float32))
            self._pool_rows += len(batch)
            while self._pool_rows > self.policy.max_pool and len(self._pool) > 1:
                self._pool_rows -= len(self._pool.pop(0))
        else:
            self._streak = []
        if self._should_retrain():
            self._retrain()
        return report

    def _should_retrain(self) -> bool:
        p = self.policy
        return (
            len(self._streak) >= p.consecutive_drifted
            and self._pool_rows >= p.min_samples
            and (self._clock() - self._last_retrain) >= p.cooldown_s
        )

    # -- retrain -----------------------------------------------------------

    def _retrain(self) -> None:
        samples = np.concatenate(self._pool, axis=0)
        reports = list(self._streak)
        ok = False
        detail = ""
        if self.retrain_fn is not None:
            try:
                ok = bool(self.retrain_fn(samples))
            except Exception as exc:
                detail = f"{type(exc).__name__}: {exc}"
                logger.warning("retrain failed: %s", exc)
        else:
            detail = "no retrain_fn configured"
        self.events.append(RetrainEvent(
            at=self._clock(), reports=reports, n_samples=len(samples),
            succeeded=ok, detail=detail,
        ))
        self._last_retrain = self._clock()
        self._streak = []
        if ok:
            # the drifted distribution becomes the new baseline
            self._reference = samples[-min(len(samples), 10_000):]
            self.detector = DriftDetector(
                self._reference, thresholds=self._thresholds)
            self._pool = []
            self._pool_rows = 0

    # -- introspection -----------------------------------------------------

    def stats(self) -> Dict[str, object]:
        return {
            "streak": len(self._streak),
            "pool_rows": self._pool_rows,
            "retrains": len(self.events),
            "last_succeeded": self.events[-1].succeeded if self.events else None,
        }


__all__ = ["MLPipeline", "RetrainPolicy", "RetrainEvent"]
