"""Record types flowing through the stateful AD+RCA chain.

Python analogs of the reference's case classes (models/*.scala in
/root/reference/online-ad-rca): Dimension (Dimension.scala:7),
AggregatedRecordsWBaseline (AggregatedRecordsWBaseline.scala:5-12),
AnomalyEvent (AnomalyEvent.scala:6-12), RCAResult (RCAResult.scala:7-17),
DimensionSummary (DimensionSummary.scala:7-15), ItemsetWithCount
(ItemsetWithCount.scala:5-10).

Deviation (SURVEY.md §7.4.1): the reference stamps AnomalyEvent with
`UUID.randomUUID()` and wall-clock `now()`; here ids are deterministic
(sequence/event-time derived, supplied by the caller) so output rows
are replay-stable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple


class Dimension(NamedTuple):
    name: str
    value: str
    group: str
    level: int


class ItemsetWithCount(NamedTuple):
    items: frozenset[int]
    count: float


@dataclass
class AggregatedRecordsWBaseline:
    current: float
    baseline: float
    current_dimensions_breakdown: dict[Dimension, float]
    baseline_dimensions_breakdown: dict[Dimension, float]
    dimensions_hierarchy: dict[Dimension, Dimension]
    records_in_baseline_offset: int


@dataclass
class AnomalyEvent:
    anomaly_id: str
    detected_at: int  # deterministic stamp (input sequence number)
    epoch: int
    record: AggregatedRecordsWBaseline
    is_outlier: bool


class DimensionSummary(NamedTuple):
    dimension: Dimension
    current_value: float
    baseline_value: float
    cost: float
    value_change_percentage: float
    contribution_change_percentage: float
    contribution_to_overall_change_percentage: float


@dataclass
class RCAResult:
    related_anomaly_id: str | None
    detected_at: int
    current_total: float
    baseline_total: float
    support: float
    num_records: float
    ratio_to_inliers: float
    dimension_group: str
    dimension_summaries: list[DimensionSummary] = field(default_factory=list)
