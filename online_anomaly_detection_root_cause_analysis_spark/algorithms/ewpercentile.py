"""EWAppxPercentileAuxiliary: decayed-reservoir percentile classifier.

Port of anomaly_detection/detectors/EWAppxPercentileAuxiliary.scala:
21-109 — keeps its own damped reservoir of (record, score) tuples;
threshold = sorted reservoir scores at index `int(percentile * size)`
(:49-55, exact — deliberately NOT percentile_approx). Quirks kept
(SURVEY.md §7.4.3): the warm-up flush compares each buffered record
against the *current* tuple's score (:91-94), and the threshold is
never refreshed after warm-up (no training-period check in the
steady-state branch, :96-100).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any

from .ewfeature import EWFeatureSpec
from .reservoir import AdaptableDampedReservoir


@dataclass
class EWAppxPercentileAuxiliary:
    """`process(record, score)` returns emitted (record, is_outlier)."""

    spec: EWFeatureSpec
    tuple_count: int = 0
    reservoir: AdaptableDampedReservoir | None = None
    current_threshold: float = 0.0
    warmup_input: list[tuple[Any, float]] = field(default_factory=list)

    def _ensure_state(self) -> None:
        if self.reservoir is None:
            self.reservoir = AdaptableDampedReservoir(
                self.spec.sample_size, self.spec.decay_rate, random.Random(0)
            )

    def _update_threshold(self) -> float:
        scores = sorted(s for (_, s) in self.reservoir.get_reservoir())
        index = int(self.spec.percentile * len(scores))
        return scores[index]

    def process(self, record: Any, score: float) -> list[tuple[Any, bool]]:
        self.tuple_count += 1
        self._ensure_state()
        out: list[tuple[Any, bool]] = []
        spec = self.spec

        # reservoir stores (None, score): the record slot is never read
        # back (threshold uses scores only) — same state-size
        # optimization as EWFeatureTransform, behavior bit-identical.
        if self.tuple_count < spec.warmup_count:
            self.warmup_input.append((record, score))
            self.reservoir.insert((None, score))
            if self.tuple_count % (spec.decay_period + 1) == 0:
                self.reservoir.advance_period()
            if self.tuple_count % (spec.training_period + 1) == 0:
                self.current_threshold = self._update_threshold()
        else:
            if self.tuple_count == spec.warmup_count:
                self.current_threshold = self._update_threshold()
                for rec, _ in self.warmup_input:
                    # reference quirk: flag from the CURRENT score
                    out.append((rec, score > self.current_threshold))
                self.warmup_input.clear()
            self.reservoir.insert((None, score))
            out.append((record, score > self.current_threshold))
        return out
