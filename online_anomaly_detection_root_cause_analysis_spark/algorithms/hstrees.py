"""Half-Space Trees: isolation-forest-style STREAMING anomaly scoring
(north_star: "streaming z-score/EWMA and isolation-forest-style
anomaly scoring held in the state store").

Streaming Half-Space Trees (Tan, Ting, Liu — IJCAI 2011) are the
streaming member of the isolation-forest family: an ensemble of
random binary trees whose structure is drawn ONCE from a seeded RNG
over a fixed workspace — never from the data — so the model needs no
fitting pass and scoring is O(depth) per point. Each tree maintains
per-node mass counts over a reference window of the stream; a point
falling into a region that held little mass in the previous window is
isolated (anomalous), exactly the isolation-forest notion of
"few points reach this region" without rebuilding trees online.

This implementation keeps the published design with two deliberate
simplifications, both documented for the oracle gate:
- the metric stream here is 1-D (window totals), so each node splits
  the interval at a seeded uniform point and the full-depth leaves
  form a partition of [lo, hi) into 2^depth random intervals;
- scoring uses the LEAF mass of the previous completed reference
  block (the paper's non-overlapping reference/latest window pair),
  score(x) = sum over trees of ref_mass(leaf(x)); low mass = anomaly.

Because the tree structure is a pure function of (n_trees, depth,
seed) and the mass counts are pure functions of the quantized input
sequence, the whole detector is bit-replayable in SQL: the driver
oracle materializes the SAME leaf intervals (hs_tree_intervals) as a
VALUES table and recomputes block masses with a grouped count.
"""

from __future__ import annotations

from bisect import bisect_right
from dataclasses import dataclass, field

import numpy as np


def hs_tree_intervals(
    n_trees: int = 8, depth: int = 6, seed: int = 5
) -> list[list[float]]:
    """Per-tree sorted internal split points over the [0, 1) workspace
    — 2^depth - 1 boundaries per tree, drawn by recursive seeded
    bisection (each node [a, b) splits at a + r*(b-a), r ~ U(0,1)).
    Rounded to 9dp so engine and SQL oracle share EXACT literals.
    Both the streaming tail and the DuckDB oracle call this function:
    there is one source of truth for the tree structure."""
    out: list[list[float]] = []
    for t in range(n_trees):
        rng = np.random.RandomState(seed + 1009 * t)
        cuts: list[float] = []

        def split(a: float, b: float, d: int) -> None:
            if d == 0:
                return
            s = round(a + rng.random_sample() * (b - a), 9)
            cuts.append(s)
            split(a, s, d - 1)
            split(s, b, d - 1)

        split(0.0, 1.0, depth)
        out.append(sorted(cuts))
    return out


@dataclass
class HalfSpaceTrees:
    """Picklable streaming scorer. update(x) consumes one (normalized,
    [0,1]-workspace) value and returns (score, is_outlier): score is
    None during the first reference block (no mass history yet),
    otherwise the summed previous-block leaf mass across trees;
    is_outlier = score <= threshold (sparse region)."""

    n_trees: int = 8
    depth: int = 6
    window: int = 32          # reference block size (tuples)
    threshold: float = 8.0    # score <= threshold -> outlier
    seed: int = 5
    tuple_count: int = 0
    ref_counts: list[dict[int, int]] = field(default_factory=list)
    cur_counts: list[dict[int, int]] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.cuts = hs_tree_intervals(self.n_trees, self.depth, self.seed)
        if not self.ref_counts:
            self.ref_counts = [{} for _ in range(self.n_trees)]
            self.cur_counts = [{} for _ in range(self.n_trees)]

    def leaf(self, tree: int, x: float) -> int:
        return bisect_right(self.cuts[tree], x)

    def update(self, x: float) -> tuple[float | None, bool]:
        self.tuple_count += 1
        block = (self.tuple_count - 1) // self.window
        leaves = [self.leaf(t, x) for t in range(self.n_trees)]
        score: float | None = None
        if block > 0:
            score = float(
                sum(self.ref_counts[t].get(lf, 0) for t, lf in zip(range(self.n_trees), leaves))
            )
        for t, lf in zip(range(self.n_trees), leaves):
            self.cur_counts[t][lf] = self.cur_counts[t].get(lf, 0) + 1
        if self.tuple_count % self.window == 0:  # block completed
            self.ref_counts = self.cur_counts
            self.cur_counts = [{} for _ in range(self.n_trees)]
        return score, (score is not None and score <= self.threshold)
