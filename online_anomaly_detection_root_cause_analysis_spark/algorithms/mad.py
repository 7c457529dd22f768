"""Median-absolute-deviation scorer.

Port of the reference MAD trainer (utils/stats/MAD.scala:9-78):
median + MAD over a training sample of window aggregates, with a 5%
trimmed-mean fallback when MAD == 0 (MAD.scala:56-66) and score =
|x - median| / MAD (MAD.scala:69-72). Golden values reproduced in
tests (MADTest.scala:10-69): 1.98/0.02 on 0..99, 27/0 on the
zero-MAD series, z-score 5.0 / 1.4826.
"""

from __future__ import annotations

import numpy as np

TRIMMED_MEAN_FALLBACK = 0.05
# https://en.wikipedia.org/wiki/Median_absolute_deviation#Relation_to_standard_deviation
MAD_TO_ZSCORE_COEFFICIENT = 1.4826


class MAD:
    def __init__(self) -> None:
        self.median: float = 0.0
        self.mad: float = 0.0

    def train(self, metrics: list[float] | np.ndarray) -> None:
        arr = np.sort(np.asarray(metrics, dtype=np.float64))
        n = len(arr)
        # even/odd median split exactly as MAD.scala:28-35
        if n % 2 == 0:
            self.median = (arr[n // 2 - 1] + arr[n // 2]) / 2.0
        else:
            self.median = arr[n // 2]

        residuals = np.sort(np.abs(arr - self.median))
        if n % 2 == 0:
            self.mad = (residuals[n // 2 - 1] + residuals[n // 2]) / 2.0
        else:
            self.mad = residuals[n // 2]

        if self.mad == 0:
            # trimmed-mean fallback (MAD.scala:56-66); index arithmetic
            # uses toInt truncation like the reference
            lo = int(n * TRIMMED_MEAN_FALLBACK)
            hi = int(n * (1 - TRIMMED_MEAN_FALLBACK))
            self.mad = float(np.sum(residuals[lo:hi])) / (hi - lo)

    def score(self, point: float) -> float:
        return abs(point - self.median) / self.mad

    def score_many(self, points: np.ndarray) -> np.ndarray:
        return np.abs(points - self.median) / self.mad

    def z_score_equivalent(self, zscore: float) -> float:
        return zscore / MAD_TO_ZSCORE_COEFFICIENT
