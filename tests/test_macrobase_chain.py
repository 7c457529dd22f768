"""End-to-end MacroBase chain golden tests — the analog of the
reference's crown-jewel pipeline tests (EWStreamingSummarizerTest
.scala:53-348), on deterministically re-synthesized fixtures
(FIXTURES.md): specs match the reference tests; goldens are the same
qualitative assertions (planted root cause is what gets reported)."""

import pandas as pd
import pytest

from online_anomaly_detection_root_cause_analysis_spark.algorithms.ewfeature import (
    EWFeatureSpec,
)
from online_anomaly_detection_root_cause_analysis_spark.algorithms.summarizer import (
    SummarizerSpec,
)
from online_anomaly_detection_root_cause_analysis_spark.detection.macrobase import (
    run_macrobase_chain,
)

from .fixtures import make_sensor10k_power, make_sensor10k_temp, make_simple_low_metric


def _rows_from_df(df: pd.DataFrame, metric_col: str):
    """The reference readCSV convention (EWStreamingSummarizerTest
    .scala:19-51): metric column = current = baseline; every other
    column is a level-1 dimension."""
    dim_cols = [c for c in df.columns if c != metric_col]
    for i, row in enumerate(df.itertuples(index=False)):
        d = row._asdict()
        metric = float(d[metric_col])
        yield i, metric, metric, {c: str(d[c]) for c in dim_cols}


def _summaries(rows_long: list[dict]) -> list[list[tuple[str, str]]]:
    by_id: dict[int, list[tuple[str, str]]] = {}
    for r in rows_long:
        by_id.setdefault(r["summary_id"], []).append((r["dim_name"], r["dim_value"]))
    return [by_id[k] for k in sorted(by_id)]


def test_mad_analyzer_simple():
    # spec: EWStreamingSummarizerTest.scala:66-89 (testMADAnalyzer)
    det = EWFeatureSpec(
        warmup_count=10, sample_size=10, decay_period=50, decay_rate=0.01,
        training_period=50, percentile=0.99,
    )
    summ = SummarizerSpec(
        summary_update_period=50, decay_rate=0.01, outlier_item_summary_size=1000,
        inlier_item_summary_size=1000, min_oi_ratio=1, min_support=0.02,
        attributes=["A1", "A2", "A3", "A4"], attribute_combinations=True,
        summary_generation_period=99,
    )
    df = make_simple_low_metric()
    out = run_macrobase_chain(_rows_from_df(df, "A5"), det, summ)
    summaries = _summaries(out)
    assert len(summaries) >= 1
    # golden (reference asserts 1 summary whose top dimension is A1=0;
    # emission order is (num_records desc, size desc) so the planted
    # root cause leads)
    assert summaries[0][0] == ("A1", "0")


def test_sensor10k_power():
    # spec: EWStreamingSummarizerTest.scala:152-175 (testSensor10KPower)
    det = EWFeatureSpec(
        warmup_count=100, sample_size=1000, decay_period=1000, decay_rate=0.01,
        training_period=1000, percentile=0.99,
    )
    summ = SummarizerSpec(
        summary_update_period=50, decay_rate=0.01, outlier_item_summary_size=1000,
        inlier_item_summary_size=1000, min_oi_ratio=1, min_support=0.01,
        attributes=["device_id"], attribute_combinations=True,
        summary_generation_period=9999,
    )
    df = make_sensor10k_power()
    out = run_macrobase_chain(_rows_from_df(df, "power_drain"), det, summ)
    summaries = _summaries(out)
    # golden: exactly one summary, its single dimension is device 2040
    assert len(summaries) == 1
    assert summaries[0] == [("device_id", "2040")]


def test_sensor10k_temp():
    # spec: EWStreamingSummarizerTest.scala:246-270 (testSensor10KTemp)
    det = EWFeatureSpec(
        warmup_count=100, sample_size=1000, decay_period=1000, decay_rate=0.01,
        training_period=1000, percentile=0.99,
    )
    summ = SummarizerSpec(
        summary_update_period=1000, decay_rate=0.01, outlier_item_summary_size=1000,
        inlier_item_summary_size=1000, min_oi_ratio=1, min_support=0.06,
        attributes=["device_id", "model", "firmware_version"],
        attribute_combinations=True, summary_generation_period=9999,
    )
    df = make_sensor10k_temp()
    out = run_macrobase_chain(_rows_from_df(df, "temperature"), det, summ)
    summaries = _summaries(out)
    assert len(summaries) >= 1
    # golden: every reported dimension is firmware 0.4 and/or M101,
    # never more than 2 dims per summary
    for s in summaries:
        assert len(s) <= 2
        for name, value in s:
            if name == "firmware_version":
                assert value == "0.4"
            elif name == "model":
                assert value == "M101"
            else:
                pytest.fail(f"unexpected dimension {name}={value}")


def test_macrobase_spark_wrapper(spark):
    """Same chain through the Spark applyInPandas wrapper."""
    from online_anomaly_detection_root_cause_analysis_spark.detection.macrobase import (
        macrobase_summaries,
    )

    det = EWFeatureSpec(
        warmup_count=10, sample_size=10, decay_period=50, decay_rate=0.01,
        training_period=50, percentile=0.99,
    )
    summ = SummarizerSpec(
        summary_update_period=50, decay_rate=0.01, outlier_item_summary_size=1000,
        inlier_item_summary_size=1000, min_oi_ratio=1, min_support=0.02,
        attributes=["A1", "A2", "A3", "A4"], attribute_combinations=True,
        summary_generation_period=99,
    )
    df = make_simple_low_metric()
    rows = [
        (seq, cur, base, dims)
        for seq, cur, base, dims in _rows_from_df(df, "A5")
    ]
    sdf = spark.createDataFrame(
        rows, "seq long, current double, baseline double, dims map<string,string>"
    )
    out = macrobase_summaries(sdf, det, summ).collect()
    # identical to the pure-Python run
    pure = run_macrobase_chain(_rows_from_df(df, "A5"), det, summ)
    assert len(out) == len(pure)
    spark_set = sorted(
        (r.summary_id, r.num_records, r.dim_name, r.dim_value) for r in out
    )
    pure_set = sorted(
        (r["summary_id"], r["num_records"], r["dim_name"], r["dim_value"]) for r in pure
    )
    assert spark_set == pure_set
