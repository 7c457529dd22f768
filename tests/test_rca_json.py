"""RCAResult JSON sink contract (VERDICT r1 next-steps #4): field
names, nesting and order must match the reference's ObjectNode layout
(models/RCAResult.scala:32-52, DimensionSummary.scala:30-42,
Dimension.scala:13-21); summaries ordered by cost desc; from_json
round-trips losslessly."""

import json

from pyspark.sql import functions as F

from online_anomaly_detection_root_cause_analysis_spark.config import events_config
from online_anomaly_detection_root_cause_analysis_spark.operators.baseline import (
    breakdown_with_baseline,
    with_offset_baseline,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.contributors import (
    hierarchical_contributors,
    simple_contributors,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.windows import (
    dimension_breakdown,
    sliding_window_totals,
)
from online_anomaly_detection_root_cause_analysis_spark.streaming.rca_json import (
    rca_result_schema,
    rca_results_json,
)

SF = "/root/testdata/sf0.001"

RESULT_KEYS = [
    "relatedAnomalyId", "detectedAt", "currentTotal", "baselineTotal",
    "support", "numRecords", "ratioToInliers", "dimensionGroup",
    "dimensionSummaries",
]
SUMMARY_KEYS = [
    "dimension", "currentValue", "baselineValue", "cost",
    "valueChangePercentage", "contributionChangePercentage",
    "contributionToOverallChangePercentage",
]
DIMENSION_KEYS = ["name", "value", "group", "level"]


def _simple_rca(spark):
    import __spark_entry__ as entrymod

    records = entrymod._events(spark, SF)
    cfg = events_config()
    totals = sliding_window_totals(records, 300, 60)
    wb = with_offset_baseline(totals, 10)
    avg = totals.agg(F.avg("current")).collect()[0][0]
    alerts = (
        wb.filter((F.col("current") > 2 * avg) | (F.col("current") < 0.2 * avg))
        .withColumn("anomaly_id", F.unix_timestamp("window_start").cast("string"))
    )
    bd = dimension_breakdown(records, cfg, 300, 60)
    bdw = breakdown_with_baseline(bd, wb, 10, targets=alerts)
    return simple_contributors(alerts, bdw, 5)


def test_simple_rca_json_shape(spark):
    out = rca_results_json(_simple_rca(spark)).collect()
    assert len(out) > 0
    for row in out:
        doc = json.loads(row.value)
        assert list(doc.keys()) == RESULT_KEYS
        assert doc["dimensionGroup"] == "all"
        assert doc["support"] == 0.0 and doc["numRecords"] == 0.0
        assert 1 <= len(doc["dimensionSummaries"]) <= 5
        costs = []
        for s in doc["dimensionSummaries"]:
            assert list(s.keys()) == SUMMARY_KEYS
            assert list(s["dimension"].keys()) == DIMENSION_KEYS
            assert s["cost"] > 0
            costs.append(s["cost"])
        assert costs == sorted(costs, reverse=True)
        # detectedAt uses the reference ISO pattern
        assert len(doc["detectedAt"]) == 19 and doc["detectedAt"][10] == "T"


def test_hierarchical_rca_json_shape(spark):
    import __spark_entry__ as entrymod

    df = spark.read.parquet(f"{SF}/events.parquet")
    records = df.select(
        F.col("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_type"),
        (F.col("user_id") % 5).cast("string").alias("user_band"),
        (F.col("user_id") % 10).cast("string").alias("user_bucket"),
    )
    cfg = entrymod.hier_events_config()
    totals = sliding_window_totals(records, 300, 60)
    wb = with_offset_baseline(totals, 10)
    avg = totals.agg(F.avg("current")).collect()[0][0]
    alerts = (
        wb.filter((F.col("current") > 2 * avg) | (F.col("current") < 0.2 * avg))
        .withColumn("anomaly_id", F.unix_timestamp("window_start").cast("string"))
    )
    bd = dimension_breakdown(records, cfg, 300, 60)
    bdw = breakdown_with_baseline(bd, wb, 10, targets=alerts)
    rca = hierarchical_contributors(
        alerts, bdw,
        parent_of={"user_bucket": "user_band"},
        parent_value_exprs={
            "user_bucket": (F.col("dim_value").cast("int") % 5).cast("string")
        },
        summary_size=5,
    )
    out = rca_results_json(rca, hierarchical=True).collect()
    assert len(out) > 0
    groups = set()
    for row in out:
        doc = json.loads(row.value)
        assert list(doc.keys()) == RESULT_KEYS
        groups.add(doc["dimensionGroup"])
        for s in doc["dimensionSummaries"]:
            assert s["dimension"]["group"] == doc["dimensionGroup"]
            assert s["dimension"]["level"] in (1, 2)
    # one RCAResult per (anomaly, group) — keyByDimensionGroup
    assert groups == {"type", "user"}


def test_rca_json_roundtrip(spark):
    js = rca_results_json(_simple_rca(spark))
    parsed = js.select(
        F.from_json("value", rca_result_schema()).alias("r")
    ).select("r.*")
    rows = parsed.collect()
    assert all(r.relatedAnomalyId is not None for r in rows)
    assert all(r.dimensionSummaries and r.dimensionSummaries[0].cost > 0 for r in rows)
    # re-serialize: byte-identical round trip
    re_js = parsed.select(
        F.to_json(
            F.struct(*[F.col(f.name) for f in rca_result_schema().fields]),
            {"ignoreNullFields": "false"},
        ).alias("value")
    )
    assert sorted(r.value for r in js.collect()) == sorted(
        r.value for r in re_js.collect()
    )
