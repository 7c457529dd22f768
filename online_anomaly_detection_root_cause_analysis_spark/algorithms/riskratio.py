"""Relative risk of an attribute pattern in outliers vs inliers.

Port of utils/itemset/RiskRatio.scala:6-85 + RiskRatioResult.scala:8-19
(MacroBase lineage). Edge cases preserved exactly (RiskRatio.scala:
17-34): no exposure / no exposed outliers / everything exposed -> 0;
no unexposed outliers -> +inf. -1.0 inputs coerce to 0
(RiskRatio.scala:46-83). The z=2 correction term keeps the
reference's literal `unexposedInlierCount / unexposedInlierCount`
(== 1) numerator (RiskRatio.scala:39; SURVEY.md §7.4.5 — goldens
depend on corrected values).
"""

from __future__ import annotations

import math
from typing import NamedTuple


class RiskRatioResult(NamedTuple):
    risk_ratio: float
    correction: float = 0.0

    def get(self) -> float:
        return self.risk_ratio

    def get_corrected(self) -> float:
        return self.correction

    def get_corrected_risk_ratio(self) -> float:
        return self.risk_ratio - self.correction


def compute_risk_ratio(
    exposed_inlier_count: float,
    exposed_outlier_count: float,
    total_inliers: float,
    total_outliers: float,
) -> RiskRatioResult:
    if exposed_inlier_count == -1.0:
        exposed_inlier_count = 0.0
    if exposed_outlier_count == -1.0:
        exposed_outlier_count = 0.0
    if total_inliers == -1.0:
        total_inliers = 0.0
    if total_outliers == -1.0:
        total_outliers = 0.0

    total_exposed = exposed_inlier_count + exposed_outlier_count
    total_minus_exposed = total_inliers + total_outliers - total_exposed
    unexposed_outliers = total_outliers - exposed_outlier_count
    unexposed_inliers = total_inliers - exposed_inlier_count

    if total_exposed == 0:
        return RiskRatioResult(0.0)
    if exposed_outlier_count == 0:
        return RiskRatioResult(0.0)
    if total_minus_exposed == 0:
        return RiskRatioResult(0.0)
    if unexposed_outliers == 0:
        return RiskRatioResult(math.inf)

    z = 2.0
    # Scala Double: 0.0/0.0 = NaN (Python raises) — reachable when the
    # summarizer is fed only outliers (e.g. threshold detection +
    # macrobase RCA: the detector emits no inlier events, so
    # unexposedInlierCount == 0). NaN correction propagates to a NaN
    # corrected ratio, which fails every downstream >= comparison —
    # identical to the reference's behavior.
    unexposed_inlier_term = (
        math.nan if unexposed_inliers == 0.0 else 1.0
    )  # literal unexposedInlierCount / unexposedInlierCount (:39)
    correction = z * math.sqrt(
        (exposed_inlier_count / exposed_outlier_count) / total_exposed
        + unexposed_inlier_term / total_minus_exposed
    )
    ratio = (exposed_outlier_count / total_exposed) / (
        unexposed_outliers / total_minus_exposed
    )
    return RiskRatioResult(ratio, correction)
