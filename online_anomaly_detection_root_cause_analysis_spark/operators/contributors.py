"""RCA contributor finders (ThirdEye ports — reference R1-R4).

Reference logic (root_cause_analysis/*.scala in /root/reference):
- Stats.scala:8-75: valueChangePercentage, contributionChangePercentage,
  contributionToOverallChangePercentage — each `Math.round(x*1e4)/1e4`
  rounded, NaN on zero denominators.
- SimpleContributorsCost.scala:14-22: |ctoc| < 3 -> 0 else |ctoc|+|cc|.
- SimpleContributorsFinder.scala:15-77: keyset union of current+baseline
  breakdowns zero-filled, cost>0 filter, sort cost desc, take k.
- HierarchicalContributorsFinder.scala:14-199 +
  HierarchicalContributorsCost.scala:3-111: per dimension-group split,
  parent-ratio balanced cost with one-sided ln(2-r) variants, per-level
  top-k roll-up.

Spark mapping: everything is column math over the long-form
`breakdown_with_baseline` rows — a broadcast-joined alert set, `when`/
`log`/`abs` expressions and one `row_number` per (anomaly[, group])
partition. No UDFs, fully whole-stage-codegen'd.

NaN policy: the reference's zero-denominator stats are Double.NaN,
which poisons downstream costs and then fails its `cost > 0` filter;
NULL propagates through Spark arithmetic and fails the same filter, so
surviving rows and values are identical — we use NULL (documented
deviation, keeps DuckDB oracle comparison exact).

dimensionImportance note: the reference folds per-level top-k lists
into a final top-k (HierarchicalContributorsFinder.scala:184-198);
top-k of unions of per-level top-k's equals the global top-k over all
levels, so the roll-up is a single row_number <= k per (anomaly,
group), modulo tie order (made deterministic here by dim_name,
dim_value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _jround6(col: Column) -> Column:
    """floor(x*1e6+0.5)/1e6 — Java Math.round-style half-up at 6dp."""
    return F.floor(col * 1000000.0 + 0.5) / 1000000.0


def _jround(col: Column) -> Column:
    """Java Math.round(x*10000)/10000d (Stats.scala:72-74):
    floor(x*1e4 + 0.5)/1e4 — matches DuckDB floor() for the oracle."""
    return F.floor(col * 10000.0 + 0.5) / 10000.0


def stats_cols(
    dim_current: Column,
    dim_baseline: Column,
    current_total: Column,
    baseline_total: Column,
    strict_parity: bool = False,
) -> dict[str, Column]:
    vcp = F.when(
        dim_baseline != 0.0,
        _jround((dim_current - dim_baseline) / dim_baseline * 100.0),
    )
    ccp = F.when(
        (current_total != 0.0) & (baseline_total != 0.0),
        _jround(
            (dim_current / current_total - dim_baseline / baseline_total) * 100.0
        ),
    )
    ctoc = F.when(
        (baseline_total != 0.0) & (current_total != baseline_total),
        _jround(
            (dim_current - dim_baseline)
            / F.abs(current_total - baseline_total)
            * 100.0
        ),
    )
    if strict_parity:
        # Replicate the reference's Math.round(±Inf) saturation on
        # equal-totals windows instead of dropping the row (NULL/NaN):
        # Long.Max/Min / 1e4, and 0/0 -> round(NaN) == 0 (ADVICE r3;
        # algorithms/stats.py CTOC_SATURATION_*). Default path keeps the
        # documented NULL-drop deviation, which the DuckDB oracle gates.
        from ..algorithms.stats import CTOC_SATURATION_NEG, CTOC_SATURATION_POS

        ctoc = F.when(
            (baseline_total != 0.0) & (current_total == baseline_total),
            F.when(dim_current > dim_baseline, F.lit(CTOC_SATURATION_POS))
            .when(dim_current < dim_baseline, F.lit(CTOC_SATURATION_NEG))
            .otherwise(F.lit(0.0)),
        ).otherwise(ctoc)
    return {
        "value_change_pct": vcp,
        "contribution_change_pct": ccp,
        "contribution_to_overall_change_pct": ctoc,
    }


def summary_report(contributors: DataFrame, key: str = "window_start_epoch") -> DataFrame:
    """R6 SummaryReport (root_cause_analysis/SummaryReport.scala — an
    empty class in the reference pointing at ThirdEye's cube
    SummaryResponse): roll the ranked per-anomaly contributor rows up
    into one human-readable report row per anomaly, the "present data
    cube changes" shape the stub describes. Pure JVM column ops:
    collect_list(struct(rank, label)) -> array_sort -> transform ->
    concat_ws; numeric roll-ups stay numeric columns (floats are never
    rendered into the string, so the DuckDB oracle compares exactly).

    One groupBy on the (tiny) contributor set — scale-free."""
    labeled = contributors.withColumn(
        "_label", F.concat_ws("=", F.col("dim_name"), F.col("dim_value"))
    )
    return labeled.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_contributors"),
        F.concat_ws(
            " > ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rank"), F.col("_label")))
                ),
                lambda x: x["_label"],
            ),
        ).alias("report"),
        F.sum("cost").alias("total_cost"),
        F.max("cost").alias("max_cost"),
    )


def _alert_breakdown(alerts: DataFrame, breakdown_wb: DataFrame) -> DataFrame:
    """Alerts joined back to their window's long-form breakdown rows —
    the explicit form of the reference's carried-along breakdown maps
    (SURVEY.md §2.11). Alert set is small: broadcast."""
    a = alerts.select(
        "anomaly_id",
        F.col("window_start").alias("_aws"),
        F.col("current").alias("current_total"),
        F.col("baseline").alias("baseline_total"),
    )
    return breakdown_wb.join(
        F.broadcast(a), breakdown_wb.window_start == a._aws, "inner"
    ).drop("_aws")


def simple_contributors(
    alerts: DataFrame, breakdown_wb: DataFrame, summary_size: int = 5,
    strict_parity: bool = False,
) -> DataFrame:
    """R1-R3: per-anomaly dimension summaries ranked by the balanced
    simple cost. strict_parity=True switches the equal-totals ctoc to
    the reference's Math.round(±Inf) saturation instead of the default
    NULL-drop (see stats_cols / COVERAGE.md deviations)."""
    j = _alert_breakdown(alerts, breakdown_wb)
    # pre-round stat inputs to 6dp — the reference's float-stabilizing
    # rounding map (P6, EWStreamingSummarizerTest.scala:101-120); the
    # floor(x*1e6+0.5) form (not engine round()) is IEEE-deterministic
    # given identical input doubles, so the DuckDB oracle matches bitwise
    dc = _jround6(F.col("dim_current"))
    db = _jround6(F.coalesce(F.col("dim_baseline"), F.lit(0.0)))
    ct = _jround6(F.col("current_total"))
    bt = _jround6(F.col("baseline_total"))
    st = stats_cols(dc, db, ct, bt, strict_parity=strict_parity)
    cost = F.when(F.abs(st["contribution_to_overall_change_pct"]) < 3.0, F.lit(0.0)).otherwise(
        F.abs(st["contribution_to_overall_change_pct"])
        + F.abs(st["contribution_change_pct"])
    )
    scored = j.select(
        "anomaly_id",
        "window_start",
        "current_total",
        "baseline_total",
        "dim_name",
        "dim_value",
        "dim_group",
        "dim_level",
        dc.alias("current_value"),
        db.alias("baseline_value"),
        cost.alias("cost"),
        st["value_change_pct"].alias("value_change_pct"),
        st["contribution_change_pct"].alias("contribution_change_pct"),
        st["contribution_to_overall_change_pct"].alias(
            "contribution_to_overall_change_pct"
        ),
    ).filter(F.col("cost") > 0)
    rank_w = Window.partitionBy("anomaly_id").orderBy(
        F.col("cost").desc(), "dim_name", "dim_value"
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= summary_size)
    )


def hierarchical_contributors(
    alerts: DataFrame,
    breakdown_wb: DataFrame,
    parent_of: dict[str, str],
    parent_value_exprs: dict[str, Column] | None = None,
    summary_size: int = 5,
    parent_pairs: DataFrame | None = None,
) -> DataFrame:
    """R4: balanced-cost hierarchical finder, split per dimension group.

    parent_of: child dim_name -> parent dim_name (level-1 dims absent:
    their parent is the window total).
    parent_value_exprs: child dim_name -> Column deriving the parent's
    dim_value from `dim_value` (e.g. url_host -> its url_domain) —
    only usable when the parent IS a function of the child value.
    parent_pairs: alternative for DATA-DEPENDENT hierarchies
    (DimensionHierarchiesBuilder.scala:9-16 semantics, where the parent
    is an independent record field): long-form (window_start, dim_name,
    dim_value, parent_name, parent_value) rows from
    operators.windows.hierarchy_cooccurrence, joined per (window,
    child value). Children absent from the anomalous window (grid rows
    that exist only in the trailing baseline) have no co-occurrence
    pair there and fall back to the NULL->ratio-1 rule — the same
    window-scoped semantic the streaming tail applies.
    """
    j = _alert_breakdown(alerts, breakdown_wb)

    if parent_pairs is not None:
        # data-dependent parents: per-(window, child value) lookup
        pp = parent_pairs.select(
            F.col("window_start").alias("_hws"),
            F.col("dim_name").alias("_hname"),
            F.col("dim_value").alias("_hvalue"),
            F.col("parent_name").alias("_parent_name"),
            F.col("parent_value").alias("_parent_value"),
        )
        j = j.join(
            pp,
            (j.window_start == pp._hws)
            & (j.dim_name == pp._hname)
            & (j.dim_value == pp._hvalue),
            "left",
        ).drop("_hws", "_hname", "_hvalue")
    else:
        # derive the parent (name, value) for each row; level-1 rows
        # keep NULLs
        parent_name = F.lit(None).cast("string")
        parent_value = F.lit(None).cast("string")
        for child, parent in parent_of.items():
            cond = F.col("dim_name") == child
            parent_name = F.when(cond, F.lit(parent)).otherwise(parent_name)
            if parent_value_exprs and child in parent_value_exprs:
                parent_value = F.when(cond, parent_value_exprs[child]).otherwise(
                    parent_value
                )
        j = j.withColumn("_parent_name", parent_name).withColumn(
            "_parent_value", parent_value
        )

    # parent breakdown lookup (self-join on the long-form rows);
    # missing parent rows -> 0 (HierarchicalContributorsFinder.scala:141-145)
    parents = breakdown_wb.select(
        F.col("window_start").alias("_pws"),
        F.col("dim_name").alias("_pname"),
        F.col("dim_value").alias("_pvalue"),
        # parents quantized like the child stats inputs — unrounded
        # parent ratios can flip near-zero cost signs between engines
        _jround6(F.col("dim_current")).alias("_parent_current"),
        _jround6(F.coalesce(F.col("dim_baseline"), F.lit(0.0))).alias("_parent_baseline"),
    )
    j = j.join(
        parents,
        (j.window_start == parents._pws)
        & (j._parent_name == parents._pname)
        & (j._parent_value == parents._pvalue),
        "left",
    )

    dc = _jround6(F.col("dim_current"))
    db = _jround6(F.coalesce(F.col("dim_baseline"), F.lit(0.0)))
    ct = _jround6(F.col("current_total"))
    bt = _jround6(F.col("baseline_total"))

    p_cur = F.when(F.col("dim_level") == 1, ct).otherwise(
        F.coalesce(F.col("_parent_current"), F.lit(0.0))
    )
    p_base = F.when(F.col("dim_level") == 1, bt).otherwise(
        F.coalesce(F.col("_parent_baseline"), F.lit(0.0))
    )

    # computeChangeRatio (HierarchicalContributorsCost.scala:103-110):
    # NULL/0 -> 1 (checkedParentRatio, :12-17)
    raw_ratio = F.when(p_base != 0.0, p_cur / p_base)
    r = F.when(raw_ratio.isNull() | (raw_ratio == 0.0), F.lit(1.0)).otherwise(raw_ratio)

    # contribution with epsilon floor (:90-101)
    contrib_raw = (db + dc) / (bt + ct)
    contribution = F.when(F.abs(contrib_raw) < 1e-5, F.lit(0.0)).otherwise(contrib_raw)

    # balanced cost (:19-77)
    expected_baseline = r * db
    error_both = (dc - expected_baseline) * F.log(
        (dc / expected_baseline - 1.0) * contribution + 1.0
    )
    error_empty_baseline = dc * F.log(F.when(r > 1.0, 2.0 - r).otherwise(r))
    error_empty_current = -db * F.log(F.when(r < 1.0, 2.0 - r).otherwise(r))
    cost_inner = (
        F.when((db != 0.0) & (dc != 0.0), error_both)
        .when(db == 0.0, error_empty_baseline)
        .otherwise(error_empty_current)
    )

    st = stats_cols(dc, db, ct, bt)
    # nodes below the contribution-of-interest threshold get cost 0
    # (HierarchicalContributorsFinder.scala:70-80)
    cost = F.when(
        F.abs(st["contribution_to_overall_change_pct"]) < 3.0, F.lit(0.0)
    ).otherwise(cost_inner)

    scored = j.select(
        "anomaly_id",
        "window_start",
        "current_total",
        "baseline_total",
        F.col("dim_group").alias("dimension_group"),
        "dim_name",
        "dim_value",
        "dim_level",
        dc.alias("current_value"),
        db.alias("baseline_value"),
        cost.alias("cost"),
        st["value_change_pct"].alias("value_change_pct"),
        st["contribution_change_pct"].alias("contribution_change_pct"),
        st["contribution_to_overall_change_pct"].alias(
            "contribution_to_overall_change_pct"
        ),
    ).filter(F.col("cost") > 0)

    rank_w = Window.partitionBy("anomaly_id", "dimension_group").orderBy(
        F.col("cost").desc(), "dim_name", "dim_value"
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= summary_size)
    )
