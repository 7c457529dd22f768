"""Weighted reservoir sampling (A-Chao) with exponential damping.

Port of the reference's AChao (utils/sample/AChao.scala:6-86) and
AdaptableDampedReservoir (utils/sample/AdaptableDampedReservoir.scala:
9-24), themselves MacroBase lineage. Semantics preserved:

- overweight items (capacity*w/runningCount > 1) wait in a max-weight
  priority queue and re-enter when their relative weight drops
  (AChao.scala:40-53);
- `decay_weights` scales the running count and queued weights
  (AChao.scala:54-59);
- `get_reservoir` returns overweight items first, padded with a
  shuffled sample of the reservoir (AChao.scala:64-85).

RNG note (SURVEY.md §7.4.6): the reference uses `scala.util.Random
(seed=0)` plus the *global* `Random.shuffle`; Python's seeded
`random.Random(0)` produces a different stream, so element-exact
parity with AChaoTest.scala is not defined — the structural
assertions (sizes, overweight membership) are.
"""

from __future__ import annotations

import heapq
import random
from typing import Any


class AChao:
    def __init__(self, capacity: int, rng: random.Random | None = None) -> None:
        self.capacity = capacity
        self.rng = rng if rng is not None else random.Random(0)
        self.running_count: float = 0.0
        self.reservoir: list[Any] = []
        # max-heap of (-weight, seq, record); seq breaks ties deterministically
        self._overweight: list[tuple[float, int, Any]] = []
        self._seq = 0

    def insert(self, record: Any, weight: float = 1.0) -> None:
        self.running_count += weight
        self._update_overweight_items()
        if len(self.reservoir) < self.capacity:
            self.reservoir.append(record)
        else:
            p_insertion = self.capacity * weight / self.running_count
            if p_insertion > 1:
                heapq.heappush(self._overweight, (-weight, self._seq, record))
                self._seq += 1
            elif self.rng.random() < p_insertion:
                self.reservoir[self.rng.randrange(self.capacity)] = record

    def _update_overweight_items(self) -> None:
        while self._overweight:
            neg_w, _, rec = self._overweight[0]
            if self.capacity * (-neg_w) / self.running_count <= 1:
                heapq.heappop(self._overweight)
                self.insert(rec, -neg_w)
            else:
                return

    def decay_weights(self, decay: float) -> None:
        self.running_count *= decay
        self._overweight = [
            (neg_w * decay, seq, rec) for (neg_w, seq, rec) in self._overweight
        ]
        heapq.heapify(self._overweight)

    def get_reservoir(self) -> list[Any]:
        self._update_overweight_items()
        if self._overweight:
            overweight = [rec for (_, _, rec) in sorted(self._overweight)]
            assert len(overweight) <= self.capacity
            shuffled = list(self.reservoir)
            self.rng.shuffle(shuffled)
            remaining = self.capacity - len(overweight)
            return overweight + shuffled[:remaining]
        return list(self.reservoir)


class AdaptableDampedReservoir(AChao):
    """AChao + explicit period advancement: each period multiplies
    weights by (1-bias)^k (AdaptableDampedReservoir.scala:17-22)."""

    def __init__(
        self, capacity: int, bias: float, rng: random.Random | None = None
    ) -> None:
        if not (0 <= bias < 1):
            raise ValueError("Bias parameter must be between 0 and 1.")
        super().__init__(capacity, rng)
        self.bias = bias

    def advance_period(self, num_periods: int = 1) -> None:
        self.decay_weights((1 - self.bias) ** num_periods)
