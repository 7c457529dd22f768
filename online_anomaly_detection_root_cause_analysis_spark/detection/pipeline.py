"""Composite detector pipelines (reference §2.8 wiring, batch form).

ThresholdDetector chain (ThresholdDetector.scala:22-44): sliding
window totals (A1) -> offset baseline over the last n window
aggregates (A2/W4) -> threshold filter -> alerts -> RCA contributor
search joined back against the long-form windowed dimension
aggregates. Batch mode doubles as the replay oracle for the streaming
job (identical math, Catalyst window functions instead of the state
store).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..config import EngineConfig
from ..operators.baseline import breakdown_with_baseline, with_offset_baseline
from ..operators.contributors import hierarchical_contributors, simple_contributors
from ..operators.threshold import threshold_alerts
from ..operators.windows import dimension_breakdown, sliding_window_totals


@dataclass
class ThresholdPipelineResult:
    totals: DataFrame
    with_baseline: DataFrame
    alerts: DataFrame
    breakdown: DataFrame
    breakdown_wb: DataFrame
    rca: DataFrame


def run_threshold_pipeline(
    records: DataFrame,
    cfg: EngineConfig,
    size_s: int = 300,
    slide_s: int = 60,
    baseline_n: int = 10,
    min_value: float = float("-inf"),
    max_value: float = float("inf"),
    summary_size: int | None = None,
    rca_method: str = "simple",
    parent_value_exprs=None,
    salt_buckets: int = 0,
) -> ThresholdPipelineResult:
    summary_size = summary_size if summary_size is not None else cfg.summary_size

    totals = sliding_window_totals(records, size_s, slide_s)
    wb = with_offset_baseline(totals, baseline_n)
    alerts = threshold_alerts(wb, min_value, max_value)

    breakdown = dimension_breakdown(
        records, cfg, size_s, slide_s, salt_buckets=salt_buckets
    )
    breakdown_wb = breakdown_with_baseline(breakdown, wb, baseline_n, targets=alerts)

    if rca_method == "simple":
        rca = simple_contributors(alerts, breakdown_wb, summary_size)
    elif rca_method == "hierarchical":
        rca = hierarchical_contributors(
            alerts,
            breakdown_wb,
            parent_of=dict(cfg.hierarchy_pairs()),
            parent_value_exprs=parent_value_exprs,
            summary_size=summary_size,
        )
    else:
        raise ValueError(f"unknown rca_method: {rca_method}")

    return ThresholdPipelineResult(totals, wb, alerts, breakdown, breakdown_wb, rca)
