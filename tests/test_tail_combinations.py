"""Detection-method x RCA-method cross product (reference
MainJob.scala:25-110: anomaly_detection.method and
root_cause_analysis.method are independent config axes). The tail must
support all 2 x 3 combinations; the three reference-default pairings
are covered elsewhere (test_streaming*.py), these are the cross terms.

Faithful quirk: the contributor finders map EVERY AnomalyEvent the
detector emits — no isOutlier filter (HierarchicalContributorsFinder
.scala:19-25, SimpleContributorsFinder.scala:16-19) — so macrobase
detection + simple/hierarchical RCA emits RCA rows for inlier windows
too.
"""

from functools import partial

from pyspark.sql import functions as F

from online_anomaly_detection_root_cause_analysis_spark.algorithms.ewfeature import (
    EWFeatureSpec,
)
from online_anomaly_detection_root_cause_analysis_spark.algorithms.summarizer import (
    SummarizerSpec,
)
from online_anomaly_detection_root_cause_analysis_spark.config import (
    modulo_parent_value,
)
from online_anomaly_detection_root_cause_analysis_spark.streaming.job import (
    long_form_window_aggs,
)
from online_anomaly_detection_root_cause_analysis_spark.streaming.state import (
    TailConfig,
    make_batch_tail,
)

SF = "/root/testdata/sf0.001"


def _aggs(spark):
    import __spark_entry__ as entrymod

    df = spark.read.parquet(f"{SF}/events.parquet")
    records = df.select(
        F.col("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_type"),
        (F.col("user_id") % 5).cast("string").alias("user_band"),
        (F.col("user_id") % 10).cast("string").alias("user_bucket"),
    )
    return records, long_form_window_aggs(
        records, entrymod.hier_events_config(), 300, 60
    )


def _detector_spec():
    return EWFeatureSpec(
        warmup_count=20, sample_size=50, decay_period=100,
        decay_rate=0.01, training_period=100, percentile=0.95,
    )


def _summarizer_spec():
    return SummarizerSpec(
        summary_update_period=50, decay_rate=0.01,
        outlier_item_summary_size=500, inlier_item_summary_size=500,
        min_oi_ratio=1, min_support=0.05,
        attributes=["event_type", "user_band", "user_bucket"],
        attribute_combinations=True, summary_generation_period=100,
    )


def test_threshold_detection_with_macrobase_summarizer(spark):
    records, aggs = _aggs(spark)
    from online_anomaly_detection_root_cause_analysis_spark.operators.windows import (
        sliding_window_totals,
    )

    avg = sliding_window_totals(records, 300, 60).agg(F.avg("current")).collect()[0][0]
    tail = TailConfig(
        mode="threshold", rca_mode="macrobase",
        min_value=0.4 * avg, max_value=1.6 * avg,
        summarizer_spec=_summarizer_spec(),
    )
    out = make_batch_tail(aggs, tail).cache()
    alerts = out.filter(F.col("row_type") == "alert")
    rca = out.filter(F.col("row_type") == "rca")
    assert alerts.count() > 0
    # Faithful quirk: a threshold detector emits ONLY outlier events,
    # so the summarizer's inlier reservoir stays empty and every
    # corrected risk ratio degenerates to 0 (pattern in all outliers:
    # totalMinusExposed == 0, RiskRatio.scala:24-26) or NaN
    # (unexposedInlierCount/unexposedInlierCount = 0/0, :39) — both
    # fail the minRatio gate, so this reference combination produces
    # alerts but no RCA summaries. The pipeline must survive it
    # without error (round-1 port raised ZeroDivisionError here).
    assert rca.count() == 0
    out.unpersist()


def test_macrobase_detection_with_simple_rca(spark):
    _, aggs = _aggs(spark)
    tail = TailConfig(
        mode="macrobase", rca_mode="simple", detector_spec=_detector_spec(),
    )
    out = make_batch_tail(aggs, tail).cache()
    alerts = out.filter(F.col("row_type") == "alert")
    rca = out.filter(F.col("row_type") == "rca")
    assert alerts.count() > 0
    # contributor output shape: cost populated, no summarizer fields
    assert rca.count() > 0
    assert rca.filter(F.col("cost").isNotNull()).count() == rca.count()
    assert rca.filter(F.col("support").isNotNull()).count() == 0
    # the unfiltered-map quirk: RCA rows exist for inlier events too
    inlier_seqs = {r.seq for r in alerts.filter(~F.col("is_outlier")).collect()}
    rca_seqs = {r.seq for r in rca.collect()}
    assert inlier_seqs & rca_seqs
    out.unpersist()


def test_macrobase_detection_with_hierarchical_rca(spark):
    _, aggs = _aggs(spark)
    tail = TailConfig(
        mode="macrobase", rca_mode="hierarchical", detector_spec=_detector_spec(),
        parent_of={"user_bucket": "user_band"},
        parent_value_fn=partial(modulo_parent_value, 5),
    )
    out = make_batch_tail(aggs, tail).cache()
    rca = out.filter(F.col("row_type") == "rca")
    assert rca.count() > 0
    # hierarchical rows carry group + level, including level-2 children
    assert rca.filter(F.col("dim_group").isNull()).count() == 0
    assert rca.filter(F.col("dim_level") == 2).count() > 0
    out.unpersist()


def test_rca_mode_defaults_match_reference_pairings():
    from online_anomaly_detection_root_cause_analysis_spark.streaming.state import (
        StreamingTail,
    )

    assert StreamingTail(TailConfig(mode="threshold")).rca == "simple"
    t = StreamingTail(
        TailConfig(
            mode="macrobase",
            detector_spec=_detector_spec(),
            summarizer_spec=_summarizer_spec(),
        )
    )
    assert t.rca == "macrobase"
