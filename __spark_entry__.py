"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship threshold-AD + simple-RCA pipeline on
/root/testdata/sf0.001. `queries()` exposes each implemented operator
from SURVEY.md §2 as (spark, sf_dir) -> DataFrame over the driver
tables; `oracle_sql()` gives the DuckDB-equivalent SQL the correctness
gate compares against (timestamps normalized to epoch BIGINT, float
aggregates rounded to 4 decimals on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from online_anomaly_detection_root_cause_analysis_spark.config import events_config
from online_anomaly_detection_root_cause_analysis_spark.operators.baseline import (
    breakdown_with_baseline,
    with_offset_baseline,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.contributors import (
    simple_contributors,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.windows import (
    dimension_breakdown,
    session_window_agg,
    sliding_window_totals,
    tumbling_window_totals,
)
from online_anomaly_detection_root_cause_analysis_spark.sources.records import (
    build_event_records,
)

SIZE_S = 300
SLIDE_S = 60
BASELINE_N = 10
SUMMARY_SIZE = 5


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return build_event_records(df, events_config())


def _epoch(col: str = "window_start"):
    return F.unix_timestamp(col)


def _r4(col) -> object:
    """Half-up rounding at 4dp via floor(x*1e4+0.5) — bit-identical to
    the same expression in DuckDB given identical input doubles
    (engine round() builtins disagree on repr-boundary doubles)."""
    return F.floor(F.col(col) * 10000.0 + 0.5) / 10000.0


# ---------------------------------------------------------------- queries

def q_tumbling_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    totals = tumbling_window_totals(_events(spark, sf_dir), SIZE_S)
    return totals.select(
        _epoch().alias("window_start_epoch"),
        _r4("current").alias("current"),
        "records_aggregated",
    )


def q_sliding_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    totals = sliding_window_totals(_events(spark, sf_dir), SIZE_S, SLIDE_S)
    return totals.select(
        _epoch().alias("window_start_epoch"),
        _r4("current").alias("current"),
        "records_aggregated",
    )


def q_offset_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    totals = sliding_window_totals(_events(spark, sf_dir), SIZE_S, SLIDE_S)
    wb = with_offset_baseline(totals, BASELINE_N)
    return wb.select(
        _epoch().alias("window_start_epoch"),
        F.col("window_idx").cast("long").alias("window_idx"),
        _r4("current").alias("current"),
        _r4("baseline").alias("baseline"),
        "records_in_baseline_offset",
    )


def _alerts_df(spark: SparkSession, sf_dir: str):
    records = _events(spark, sf_dir)
    totals = sliding_window_totals(records, SIZE_S, SLIDE_S)
    wb = with_offset_baseline(totals, BASELINE_N)
    # data-relative thresholds (2x / 0.2x the mean window total) so the
    # same query is meaningful at every scale factor
    avg_current = totals.agg(F.avg("current").alias("_avg"))
    wb2 = wb.crossJoin(F.broadcast(avg_current))
    alerts = wb2.filter(
        (F.col("current") > 2 * F.col("_avg")) | (F.col("current") < 0.2 * F.col("_avg"))
    ).drop("_avg")
    return records, totals, wb, alerts


def q_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, _, alerts = _alerts_df(spark, sf_dir)
    return alerts.select(
        _epoch().alias("window_start_epoch"),
        _r4("current").alias("current"),
        _r4("baseline").alias("baseline"),
        "records_in_baseline_offset",
    )


def q_dimension_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    bd = dimension_breakdown(
        _events(spark, sf_dir), events_config(), SIZE_S, SLIDE_S
    )
    return bd.select(
        _epoch().alias("window_start_epoch"),
        "dim_name",
        "dim_value",
        _r4("dim_sum").alias("dim_sum"),
        "dim_count",
    )


def q_dimension_breakdown_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (salted) aggregation variant — identical result set,
    skew-resistant plan (north_rule skew handling)."""
    bd = dimension_breakdown(
        _events(spark, sf_dir), events_config(), SIZE_S, SLIDE_S, salt_buckets=8
    )
    return bd.select(
        _epoch().alias("window_start_epoch"),
        "dim_name",
        "dim_value",
        _r4("dim_sum").alias("dim_sum"),
        "dim_count",
    )


def q_simple_contributors(spark: SparkSession, sf_dir: str) -> DataFrame:
    records, totals, wb, alerts_raw = _alerts_df(spark, sf_dir)
    # deterministic anomaly id = the window epoch
    alerts = alerts_raw.withColumn("anomaly_id", _epoch().cast("string"))
    bd = dimension_breakdown(records, events_config(), SIZE_S, SLIDE_S)
    bdw = breakdown_with_baseline(bd, wb, BASELINE_N, targets=alerts)
    rca = simple_contributors(alerts, bdw, SUMMARY_SIZE)
    return rca.select(
        _epoch().alias("window_start_epoch"),
        "dim_name",
        "dim_value",
        _r4("current_value").alias("current_value"),
        _r4("baseline_value").alias("baseline_value"),
        _r4("cost").alias("cost"),
        "value_change_pct",
        "contribution_change_pct",
        "contribution_to_overall_change_pct",
        F.col("rank").cast("long").alias("rank"),
    )


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = session_window_agg(df, key="user_id", gap_s=1800, ts="ts", value="value")
    return s.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start_epoch"),
        _r4("current").alias("current"),
        "records_aggregated",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_simple_contributors(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tumbling_window_sum": q_tumbling_window_sum,
        "sliding_window_sum": q_sliding_window_sum,
        "offset_baseline": q_offset_baseline,
        "threshold_alerts": q_threshold_alerts,
        "dimension_breakdown": q_dimension_breakdown,
        "dimension_breakdown_salted": q_dimension_breakdown_salted,
        "simple_contributors": q_simple_contributors,
        "session_windows": q_session_windows,
    }


# ---------------------------------------------------------------- oracles

_EV = "SELECT ts, value, event_type, CAST(user_id % 10 AS VARCHAR) AS user_bucket FROM events"

# one row per (event, covering sliding window): size 300 s / slide 60 s
# => exactly 5 aligned window starts per event
_SLIDING_LF = f"""
  SELECT CAST(floor(epoch(ts)/60)*60 - 60*k AS BIGINT) AS ws, value, event_type, user_bucket
  FROM ({_EV}), UNNEST([0,1,2,3,4]) AS t(k)
"""

_TOT = f"SELECT ws, sum(value) AS current, count(*) AS n FROM ({_SLIDING_LF}) GROUP BY ws"

_WB = f"""
  SELECT ws, current, n,
         row_number() OVER (ORDER BY ws) AS window_idx,
         avg(current) OVER (ORDER BY ws ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING) AS baseline,
         count(current) OVER (ORDER BY ws ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING) AS rbo
  FROM ({_TOT})
"""

_BD_LF = f"""
  SELECT ws, 'event_type' AS dim_name, event_type AS dim_value, value FROM ({_SLIDING_LF})
  UNION ALL
  SELECT ws, 'user_bucket' AS dim_name, user_bucket AS dim_value, value FROM ({_SLIDING_LF})
"""

_BD = f"SELECT ws, dim_name, dim_value, sum(value) AS dim_sum, count(*) AS dim_count FROM ({_BD_LF}) GROUP BY 1, 2, 3"

_SIMPLE_CONTRIBUTORS_SQL = f"""
WITH wb AS ({_WB}),
stats AS (SELECT avg(current) AS avgc FROM ({_TOT})),
alerts AS (
  SELECT ws, window_idx, current AS current_total, baseline AS baseline_total
  FROM wb, stats WHERE current > 2*avgc OR current < 0.2*avgc
),
bdi AS (
  SELECT bd.*, wb.window_idx FROM ({_BD}) bd JOIN wb ON bd.ws = wb.ws
),
cur AS (SELECT window_idx AS tidx, dim_name, dim_value, dim_sum AS dim_current FROM bdi),
fut AS (
  SELECT window_idx + k AS tidx, dim_name, dim_value, dim_sum
  FROM bdi, UNNEST([1,2,3,4,5,6,7,8,9]) AS t(k)
),
tr AS (SELECT tidx, dim_name, dim_value, sum(dim_sum) AS tsum FROM fut GROUP BY 1,2,3),
grid AS (
  SELECT tidx, dim_name, dim_value,
         COALESCE(c.dim_current, 0) AS dim_current, t.tsum
  FROM cur c FULL OUTER JOIN tr t USING (tidx, dim_name, dim_value)
),
wbb AS (
  SELECT g.*, wb.ws, wb.rbo FROM grid g JOIN wb ON g.tidx = wb.window_idx
),
joined AS (
  SELECT w.ws, a.current_total, a.baseline_total, w.dim_name, w.dim_value,
         w.dim_current,
         CASE WHEN w.rbo > 0 THEN COALESCE(w.tsum, 0) / w.rbo END AS dim_baseline
  FROM wbb w JOIN alerts a ON w.ws = a.ws
),
st AS (
  SELECT ws, dim_name, dim_value,
         floor(dim_current*1000000 + 0.5)/1000000 AS cv,
         floor(COALESCE(dim_baseline, 0)*1000000 + 0.5)/1000000 AS bv,
         floor(current_total*1000000 + 0.5)/1000000 AS ct,
         floor(baseline_total*1000000 + 0.5)/1000000 AS bt
  FROM joined
),
pct AS (
  SELECT ws, dim_name, dim_value, cv, bv,
    CASE WHEN bv != 0 THEN floor((cv - bv)/bv*100*10000 + 0.5)/10000 END AS vcp,
    CASE WHEN ct != 0 AND bt != 0 THEN floor((cv/ct - bv/bt)*100*10000 + 0.5)/10000 END AS ccp,
    CASE WHEN bt != 0 AND ct != bt THEN floor((cv - bv)/abs(ct - bt)*100*10000 + 0.5)/10000 END AS ctoc
  FROM st
),
costed AS (
  SELECT *, CASE WHEN abs(ctoc) < 3 THEN 0 ELSE abs(ctoc) + abs(ccp) END AS cost FROM pct
)
SELECT ws AS window_start_epoch, dim_name, dim_value,
       floor(cv*10000 + 0.5)/10000 AS current_value, floor(bv*10000 + 0.5)/10000 AS baseline_value,
       floor(cost*10000 + 0.5)/10000 AS cost,
       vcp AS value_change_pct, ccp AS contribution_change_pct,
       ctoc AS contribution_to_overall_change_pct,
       row_number() OVER (PARTITION BY ws ORDER BY cost DESC, dim_name, dim_value) AS rank
FROM costed
WHERE cost > 0
QUALIFY rank <= {SUMMARY_SIZE}
"""

_SESSION_SQL = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
       floor(sum(value)*10000 + 0.5)/10000 AS current,
       count(*) AS records_aggregated
FROM s GROUP BY user_id, sid
"""


def oracle_sql() -> dict[str, str]:
    breakdown_sql = f"""
        SELECT ws AS window_start_epoch, dim_name, dim_value,
               floor(dim_sum*10000 + 0.5)/10000 AS dim_sum, dim_count
        FROM ({_BD})
    """
    return {
        "tumbling_window_sum": """
            SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS window_start_epoch,
                   floor(sum(value)*10000 + 0.5)/10000 AS current,
                   count(*) AS records_aggregated
            FROM events GROUP BY 1
        """,
        "sliding_window_sum": f"""
            SELECT ws AS window_start_epoch, floor(sum(value)*10000 + 0.5)/10000 AS current,
                   count(*) AS records_aggregated
            FROM ({_SLIDING_LF}) GROUP BY ws
        """,
        "offset_baseline": f"""
            SELECT ws AS window_start_epoch, window_idx,
                   floor(current*10000 + 0.5)/10000 AS current, floor(baseline*10000 + 0.5)/10000 AS baseline,
                   rbo AS records_in_baseline_offset
            FROM ({_WB})
        """,
        "threshold_alerts": f"""
            WITH wb AS ({_WB}), stats AS (SELECT avg(current) AS avgc FROM ({_TOT}))
            SELECT ws AS window_start_epoch,
                   floor(current*10000 + 0.5)/10000 AS current,
                   floor(baseline*10000 + 0.5)/10000 AS baseline,
                   rbo AS records_in_baseline_offset
            FROM wb, stats WHERE current > 2*avgc OR current < 0.2*avgc
        """,
        "dimension_breakdown": breakdown_sql,
        "dimension_breakdown_salted": breakdown_sql,
        "simple_contributors": _SIMPLE_CONTRIBUTORS_SQL,
        "session_windows": _SESSION_SQL,
    }
