"""ThirdEye contributor stats + simple cost, pure-Python form (used by
the streaming tail where breakdowns live in operator state; the batch
path uses the column-math twins in operators/contributors.py).

Ports: Stats.scala:8-75, SimpleContributorsCost.scala:14-22,
SimpleContributorsFinder.scala:44-76.
"""

from __future__ import annotations

import math

from .models import Dimension, DimensionSummary

MIN_CONTRIBUTION_OF_INTEREST_PCT = 3.0


def _jround4(x: float) -> float:
    # Java Math.round(x*1e4)/1e4 (Stats.scala:72-74)
    if math.isnan(x) or math.isinf(x):
        return x
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def value_change_percentage(baseline: float, current: float) -> float:
    if baseline != 0.0:
        return _jround4((current - baseline) / baseline * 100.0)
    return math.nan


def contribution_change_percentage(
    baseline: float, current: float, baseline_total: float, current_total: float
) -> float:
    if current_total != 0.0 and baseline_total != 0.0:
        return _jround4((current / current_total - baseline / baseline_total) * 100.0)
    return math.nan


def contribution_to_overall_change_percentage(
    baseline: float, current: float, baseline_total: float, current_total: float
) -> float:
    if baseline_total != 0.0:
        return _jround4(
            (current - baseline) / abs(current_total - baseline_total) * 100.0
        )
    return math.nan


def simple_cost(vcp: float, ccp: float, ctoc: float) -> float:
    if abs(ctoc) < MIN_CONTRIBUTION_OF_INTEREST_PCT:
        return 0.0
    return abs(ctoc) + abs(ccp)


def simple_contributor_summaries(
    current_breakdown: dict[Dimension, float],
    baseline_breakdown: dict[Dimension, float],
    current_total: float,
    baseline_total: float,
    summary_size: int = 5,
) -> list[DimensionSummary]:
    """SimpleContributorsFinder.computeSummaries: keyset union with
    zero-fill, cost>0 filter, cost-desc sort, take k."""
    out: list[DimensionSummary] = []
    for dim in set(current_breakdown) | set(baseline_breakdown):
        cv = current_breakdown.get(dim, 0.0)
        bv = baseline_breakdown.get(dim, 0.0)
        vcp = value_change_percentage(bv, cv)
        ccp = contribution_change_percentage(bv, cv, baseline_total, current_total)
        ctoc = contribution_to_overall_change_percentage(
            bv, cv, baseline_total, current_total
        )
        cost = simple_cost(vcp, ccp, ctoc)
        out.append(DimensionSummary(dim, cv, bv, cost, vcp, ccp, ctoc))
    out = [s for s in out if s.cost > 0]
    out.sort(key=lambda s: (-s.cost, s.dimension.name, s.dimension.value))
    return out[:summary_size]
