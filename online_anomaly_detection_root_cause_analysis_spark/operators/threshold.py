"""Threshold detector (reference P1/P2).

ThresholdDetector.scala:40-63: a window-aggregate is anomalous when
`current < min || current > max`; every emitted AnomalyEvent carries
isOutlier=true (ThresholdDetector.scala:41). The reference stamps
random UUIDs + wall-clock now() (AnomalyEvent.scala:19-30); here the
anomaly id is a deterministic hash of (window_start, current) so
replayed streams produce identical alert rows (SURVEY.md §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_threshold_spec(min_value: float, max_value: float) -> None:
    # ThresholdDetectorSpec validation (ThresholdDetector.scala:16-18)
    if min_value >= max_value:
        raise ValueError(
            "You cannot set a min threshold higher or equal to max threshold"
        )


def threshold_alerts(
    with_baseline: DataFrame, min_value: float, max_value: float
) -> DataFrame:
    validate_threshold_spec(min_value, max_value)
    return with_baseline.filter(
        (F.col("current") < F.lit(min_value)) | (F.col("current") > F.lit(max_value))
    ).select(
        F.sha2(
            F.concat_ws(
                "|",
                F.date_format("window_start", "yyyy-MM-dd'T'HH:mm:ss"),
                F.format_string("%.6f", F.col("current")),
            ),
            256,
        ).alias("anomaly_id"),
        F.col("window_start").alias("detected_at"),
        F.unix_timestamp("window_start").alias("epoch"),
        "window_start",
        "window_idx",
        "current",
        "baseline",
        "records_in_baseline_offset",
        F.lit(True).alias("is_outlier"),
    )
