"""Amortized-maintenance heavy-hitter counter (SpaceSaving variant).

Port of utils/count/AmortizedMaintenanceCounter.scala:30-132 in
/root/reference/online-ad-rca (MacroBase lineage): O(1) observe —
new items enter at `prev_epoch_max_evicted + count` — with lazy
global decay via a multiplicative `decay_factor`, and truncation to
`max_stable_size` on decay.

Two reference quirks kept deliberately:
- `multiply_all_counts` *shadows* the `prevEpochMaxEvicted` field with
  a local (AmortizedMaintenanceCounter.scala:62), so evictions never
  raise the floor for future items — reproduced here.
- truncation drops the first `size - max_stable_size` entries in map
  iteration order (JVM HashMap order there, insertion order here:
  deterministic, and statistically equivalent for the decay test).
"""

from __future__ import annotations

import sys

DECAY_RESET_THRESHOLD = sys.float_info.max * 0.5


class AmortizedMaintenanceCounter:
    def __init__(self, max_stable_size: int) -> None:
        self.max_stable_size = max_stable_size
        self.decay_factor: float = 1.0
        self.counts: dict[int, float] = {}
        self.total_count: float = 0.0
        self.prev_epoch_max_evicted: float = 0.0

    def multiply_all_counts(self, by: float) -> None:
        self.decay_factor /= by
        if self.decay_factor > DECAY_RESET_THRESHOLD:
            self._reset_decay_factor()
        if len(self.counts) > self.max_stable_size:
            to_remove = len(self.counts) - self.max_stable_size
            # NOTE: the reference assigns the max evicted value to a
            # *local* variable here, never the field — kept faithfully.
            for key in list(self.counts.keys())[:to_remove]:
                del self.counts[key]

    def get_counts(self) -> dict[int, float]:
        self._reset_decay_factor()
        return self.counts

    def _reset_decay_factor(self) -> None:
        for key in self.counts:
            self.counts[key] /= self.decay_factor
        self.total_count /= self.decay_factor
        self.decay_factor = 1.0

    def observe(self, item: int, count: float = 1.0) -> None:
        var_count = count * self.decay_factor
        value = self.counts.get(item)
        if value is None:
            value = self.prev_epoch_max_evicted + var_count
            self.total_count += value
        else:
            value = value + var_count
            self.total_count += var_count
        self.counts[item] = value
        if value > DECAY_RESET_THRESHOLD and self.decay_factor > 1:
            self._reset_decay_factor()

    def observe_all(self, items: list[int]) -> None:
        for item in items:
            self.observe(item)

    def get_total_count(self) -> float:
        return self.total_count / self.decay_factor

    def get_count(self, item: int) -> float:
        value = self.counts.get(item)
        if value is None:
            return self.prev_epoch_max_evicted / self.decay_factor
        return value / self.decay_factor
