"""EWFeatureTransform: MAD scorer trained on a decayed reservoir.

Port of transformers/EWFeatureTransform.scala:26-115 — for each input
window-aggregate: warm-up buffering into an AdaptableDampedReservoir,
retrain the MAD scorer every `training_period + 1` tuples, decay the
reservoir every `decay_period + 1` tuples, flush the scored warm-up
buffer at `tuple_count == warmup_count`, then steady-state score+emit.

Fix vs reference (SURVEY.md §7.4.4): `tupleCount`/`warmupInput` are
plain fields there (not checkpointed, EWFeatureTransform.scala:31-32);
here they are part of the state object so checkpoint resume is exact.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any

from .mad import MAD
from .reservoir import AdaptableDampedReservoir


@dataclass
class EWFeatureSpec:
    """Subset of EWAppxPercentileOutlierClassifierSpec.scala:10-23
    consumed by the scorer + classifier stages."""

    warmup_count: int
    sample_size: int
    decay_period: int
    decay_rate: float
    training_period: int
    percentile: float = 0.9


@dataclass
class EWFeatureTransform:
    """Single-key stateful scorer; `process(record, metric)` returns the
    list of (record, score) tuples emitted for this input."""

    spec: EWFeatureSpec
    tuple_count: int = 0
    reservoir: AdaptableDampedReservoir | None = None
    scorer: MAD | None = None
    warmup_input: list[tuple[Any, float]] = field(default_factory=list)

    def _ensure_state(self) -> None:
        if self.reservoir is None:
            self.reservoir = AdaptableDampedReservoir(
                self.spec.sample_size, self.spec.decay_rate, random.Random(0)
            )
        if self.scorer is None:
            self.scorer = MAD()

    def _train(self) -> None:
        # scorer trains on the reservoir of (record, metric) pairs
        self.scorer.train([m for (_, m) in self.reservoir.get_reservoir()])

    def process(self, record: Any, metric: float) -> list[tuple[Any, float]]:
        """`metric` is the window-aggregate `current` value; `record` is
        the opaque payload carried through (EWFeatureTransform.scala:57+)."""
        self.tuple_count += 1
        self._ensure_state()
        out: list[tuple[Any, float]] = []
        spec = self.spec

        # reservoir note: the reference inserts the FULL record
        # (EWFeatureTransform.scala:76,103) but only ever reads the
        # metric back out (train() maps _.current); storing None in the
        # record slot keeps checkpoint state O(sample_size) floats
        # instead of O(sample_size) records — emitted values, RNG draws
        # and training sets are bit-identical.
        if self.tuple_count < spec.warmup_count:
            self.warmup_input.append((record, metric))
            self.reservoir.insert((None, metric))
            if self.tuple_count % (spec.training_period + 1) == 0:
                self._train()
            if self.tuple_count % (spec.decay_period + 1) == 0:
                self.reservoir.advance_period()
        else:
            if self.tuple_count == spec.warmup_count:
                self._train()
                for rec, m in self.warmup_input:
                    out.append((rec, self.scorer.score(m)))
                self.warmup_input.clear()
            if self.tuple_count % (spec.training_period + 1) == 0:
                self._train()
            if self.tuple_count % (spec.decay_period + 1) == 0:
                self.reservoir.advance_period()
            self.reservoir.insert((None, metric))
            out.append((record, self.scorer.score(metric)))
        return out
