"""EWMA mean/variance z-score detector (north_star: "streaming
z-score/EWMA ... anomaly scoring held in the state store").

Not ported from the reference (its detectors are threshold and the
MacroBase MAD/percentile chain); this is the standard exponentially
weighted moving average control chart:

    mean_t = a*x_t + (1-a)*mean_{t-1}
    var_t  = (1-a)*(var_{t-1} + a*(x_t - mean_{t-1})^2)

scored against the PREVIOUS state: z_t = (x_t - mean_{t-1}) /
sqrt(var_{t-1}), outlier when |z_t| > z_threshold.

Determinism contract: mean/var are quantized to 6dp (floor(x*1e6+0.5))
after every update — the same discipline as the contributor stats —
so a DuckDB recursive CTE reproduces the sequence bit-for-bit and the
driver's value-hash gate can cover the detector. The outlier test is
the multiplication form (x-m)^2 > z^2 * v, never a division, so the
var==0 warm-up state needs no IEEE-divide special cases.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


def _q6(x: float) -> float:
    if math.isnan(x) or math.isinf(x):
        return x
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _q4(x: float) -> float:
    if math.isnan(x) or math.isinf(x):
        return x
    return math.floor(x * 10000.0 + 0.5) / 10000.0


@dataclass
class EWMAZScore:
    """Picklable state-store payload; one update per finalized window."""

    alpha: float = 0.1
    z_threshold: float = 3.0
    mean: float | None = None
    var: float = 0.0
    n: int = 0

    def update(self, x: float) -> tuple[bool, float | None, float | None]:
        """Score x against the previous state, then fold it in.
        Returns (is_outlier, z, mean_prev).

        x itself is quantized to 6dp on entry (ADVICE r2): the raw
        window total feeds both the quantized recursion AND the alert
        test (x-mean_prev)^2 > z^2*var_prev, so a ulp-level cross-
        engine summation difference in x could flip a quantization
        boundary or an alert decision even with mean/var quantized.
        Idempotent for already-quantized inputs."""
        x = _q6(x)
        self.n += 1
        if self.mean is None:
            self.mean = _q6(x)
            self.var = 0.0
            return False, None, None
        mean_prev, var_prev = self.mean, self.var
        diff = x - mean_prev
        is_outlier = var_prev > 0.0 and diff * diff > (
            self.z_threshold * self.z_threshold
        ) * var_prev
        z = _q4(diff / math.sqrt(var_prev)) if var_prev > 0.0 else None
        self.mean = _q6(self.alpha * x + (1.0 - self.alpha) * mean_prev)
        self.var = _q6((1.0 - self.alpha) * (var_prev + self.alpha * diff * diff))
        return is_outlier, z, mean_prev
