"""RCAResult JSON output shape (reference sink contract).

The reference serializes each RCAResult to a JSON object with a fixed
field layout (models/RCAResult.scala:32-52 toObjectNode,
models/DimensionSummary.scala:30-42, models/Dimension.scala:13-21,
written by serialization/RCAResultSerializationSchema.scala via
sinks/kafka/RCAResultJsonProducer.scala:11-20). This module rebuilds
that exact layout with `to_json(struct(...))` — JVM-side, codegen —
over the engine's long-form RCA rows (one row per dimension summary,
the output of simple_contributors / hierarchical_contributors).

Field order follows the reference's ObjectNode insertion order:
relatedAnomalyId, detectedAt, currentTotal, baselineTotal, support,
numRecords, ratioToInliers, dimensionGroup, dimensionSummaries[
{dimension{name,value,group,level}, currentValue, baselineValue,
cost, valueChangePercentage, contributionChangePercentage,
contributionToOverallChangePercentage}].

Determinism deviation (SURVEY.md §7.4.1): the reference stamps
detectedAt with wall-clock now(); here it is the anomaly's window
start formatted with the reference's ISO pattern, so output is
replay-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO_PATTERN = "yyyy-MM-dd'T'HH:mm:ss"


def _summary_struct(group_expr) -> "F.Column":
    return F.struct(
        F.col("rank").cast("int").alias("rank"),  # sort key, stripped below
        F.struct(
            F.col("dim_name").alias("name"),
            F.col("dim_value").alias("value"),
            group_expr.alias("group"),
            F.col("dim_level").cast("int").alias("level"),
        ).alias("dimension"),
        F.col("current_value").alias("currentValue"),
        F.col("baseline_value").alias("baselineValue"),
        F.col("cost").alias("cost"),
        F.col("value_change_pct").alias("valueChangePercentage"),
        F.col("contribution_change_pct").alias("contributionChangePercentage"),
        F.col("contribution_to_overall_change_pct").alias(
            "contributionToOverallChangePercentage"
        ),
    )


def rca_results_json(
    rca: DataFrame,
    hierarchical: bool = False,
    support: float = 0.0,
    num_records: float = 0.0,
    ratio_to_inliers: float = 0.0,
) -> DataFrame:
    """Long-form RCA rows -> one JSON string per RCAResult.

    hierarchical=False: one result per anomaly, dimensionGroup="all"
    (SimpleContributorsFinder.scala:21-42). hierarchical=True: one
    result per (anomaly, dimension group) — keyByDimensionGroup
    (HierarchicalContributorsFinder.scala:150-177); expects the
    `dimension_group` column the hierarchical finder emits.
    support/numRecords/ratioToInliers are 0.0 for both contributor
    finders (reference :29-32); the MacroBase summarizer path carries
    real values through the same shape.
    """
    if hierarchical:
        result_group = F.col("dimension_group")
        dim_group = F.col("dimension_group")
    else:
        result_group = F.lit("all")
        dim_group = F.col("dim_group")

    summaries = rca.groupBy(
        "anomaly_id",
        result_group.alias("_group"),
        "window_start",
        "current_total",
        "baseline_total",
    ).agg(F.collect_list(_summary_struct(dim_group)).alias("_s"))

    # cost-desc order == rank asc; array_sort on (rank, ...) structs
    # sorts by the leading field, then the sort key is stripped
    ordered = F.transform(
        F.array_sort("_s"),
        lambda s: F.struct(
            s["dimension"].alias("dimension"),
            s["currentValue"].alias("currentValue"),
            s["baselineValue"].alias("baselineValue"),
            s["cost"].alias("cost"),
            s["valueChangePercentage"].alias("valueChangePercentage"),
            s["contributionChangePercentage"].alias("contributionChangePercentage"),
            s["contributionToOverallChangePercentage"].alias(
                "contributionToOverallChangePercentage"
            ),
        ),
    )
    node = F.struct(
        F.col("anomaly_id").alias("relatedAnomalyId"),
        F.date_format("window_start", ISO_PATTERN).alias("detectedAt"),
        F.col("current_total").alias("currentTotal"),
        F.col("baseline_total").alias("baselineTotal"),
        F.lit(float(support)).alias("support"),
        F.lit(float(num_records)).alias("numRecords"),
        F.lit(float(ratio_to_inliers)).alias("ratioToInliers"),
        F.col("_group").alias("dimensionGroup"),
        ordered.alias("dimensionSummaries"),
    )
    # ignoreNullFields=false keeps the fixed field layout: the engine's
    # NULL-for-NaN stat policy (see operators/contributors.py) must not
    # drop keys the reference always writes (it writes NaN doubles)
    return summaries.select(
        F.to_json(node, {"ignoreNullFields": "false"}).alias("value")
    )


def rca_result_schema() -> T.StructType:
    """Schema of the JSON layout, for from_json round-trips/tests."""
    dim = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("group", T.StringType()),
            T.StructField("level", T.IntegerType()),
        ]
    )
    summary = T.StructType(
        [
            T.StructField("dimension", dim),
            T.StructField("currentValue", T.DoubleType()),
            T.StructField("baselineValue", T.DoubleType()),
            T.StructField("cost", T.DoubleType()),
            T.StructField("valueChangePercentage", T.DoubleType()),
            T.StructField("contributionChangePercentage", T.DoubleType()),
            T.StructField("contributionToOverallChangePercentage", T.DoubleType()),
        ]
    )
    return T.StructType(
        [
            T.StructField("relatedAnomalyId", T.StringType()),
            T.StructField("detectedAt", T.StringType()),
            T.StructField("currentTotal", T.DoubleType()),
            T.StructField("baselineTotal", T.DoubleType()),
            T.StructField("support", T.DoubleType()),
            T.StructField("numRecords", T.DoubleType()),
            T.StructField("ratioToInliers", T.DoubleType()),
            T.StructField("dimensionGroup", T.StringType()),
            T.StructField("dimensionSummaries", T.ArrayType(summary)),
        ]
    )
