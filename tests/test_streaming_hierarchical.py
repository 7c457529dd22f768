"""Streaming hierarchical RCA (VERDICT r1 next-steps #3): the
reference streaming job dispatches hierarchical | simple | macrobase
RCA (jobs/MainJob.scala:86-110); TailConfig(rca_mode="hierarchical")
is the streaming-tail twin of the batch column form
operators/contributors.py::hierarchical_contributors.

Two gates:
1. streaming applyInPandasWithState output == pure-Python replay of
   the same finalized windows (mirror of test_streaming_macrobase);
2. batch replay of the tail == the oracle-verified batch column form
   on the events table (same alerts, same ranked dimensions, costs
   within float tolerance — the column form quantizes stat inputs to
   6dp, the tail computes on raw doubles).
"""

from functools import partial

from pyspark.sql import functions as F

from online_anomaly_detection_root_cause_analysis_spark.config import (
    modulo_parent_value,
    web_pages_config,
    web_pages_parent_value,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.baseline import (
    breakdown_with_baseline,
    with_offset_baseline,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.contributors import (
    hierarchical_contributors,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.windows import (
    dimension_breakdown,
    sliding_window_totals,
)
from online_anomaly_detection_root_cause_analysis_spark.sources.pages import (
    PagesSpec,
    generate_pages,
    read_pages_stream,
)
from online_anomaly_detection_root_cause_analysis_spark.sources.records import (
    build_page_records,
)
from online_anomaly_detection_root_cause_analysis_spark.streaming.job import (
    StreamingJob,
    long_form_window_aggs,
)
from online_anomaly_detection_root_cause_analysis_spark.streaming.state import (
    StreamingTail,
    TailConfig,
    make_batch_tail,
    rows_to_windows,
)

from .test_streaming import _write_chunks

CFG = web_pages_config()


def _pages_tail(max_value: float) -> TailConfig:
    return TailConfig(
        mode="threshold",
        rca_mode="hierarchical",
        max_value=max_value,
        parent_of=dict(CFG.hierarchy_pairs()),
        parent_value_fn=web_pages_parent_value,
        summary_size=5,
    )


def test_streaming_hierarchical_matches_replay(spark, tmp_path):
    pdf = generate_pages(PagesSpec(n_pages=1500)).sort_values("warc_ts")
    pages = tmp_path / "pages"
    pages.mkdir()
    _write_chunks(pdf, pages, 5)

    # absolute threshold below the upper-quartile window total so a
    # healthy share of windows alert
    records_batch = build_page_records(
        spark.createDataFrame(pdf), CFG
    )
    totals = sliding_window_totals(records_batch, 300, 60)
    max_value = totals.approxQuantile("current", [0.5], 0.0)[0]
    tail_cfg = _pages_tail(max_value)

    job = StreamingJob(
        work_dir=str(tmp_path / "job"), cfg=CFG, tail=tail_cfg,
        size_s=300, slide_s=60,
    )
    stream = build_page_records(read_pages_stream(spark, str(pages)), CFG)
    q1 = job.start_aggregate_query(stream)
    q1.processAllAvailable()
    q1.stop()
    q2 = job.start_detect_query(spark)
    q2.processAllAvailable()
    q2.stop()

    alerts = spark.read.parquet(job.alerts_dir)
    rca = spark.read.parquet(job.rca_dir)
    assert alerts.count() > 0
    assert rca.count() > 0
    # hierarchical rows carry group + level; levels beyond 1 present
    assert rca.filter(F.col("dim_level") > 1).count() > 0

    import os

    import pandas as pd

    replay = StreamingTail(tail_cfg)
    expected = []
    for f in sorted(os.listdir(job.aggs_dir)):
        if not f.endswith(".parquet"):
            continue
        chunk = pd.read_parquet(os.path.join(job.aggs_dir, f))
        if len(chunk) == 0:
            continue
        for ws, cur, rec, bd, hier in rows_to_windows(chunk):
            expected.extend(replay.process_window(ws, cur, rec, bd, hier))

    exp_rca = [e for e in expected if e["row_type"] == "rca"]
    got = sorted(
        (r.seq, r.dim_group, r.dim_level, r.dim_name, r.dim_value, f"{r.cost:.6f}")
        for r in rca.collect()
    )
    want = sorted(
        (e["seq"], e["dim_group"], e["dim_level"], e["dim_name"], e["dim_value"],
         f"{e['cost']:.6f}")
        for e in exp_rca
    )
    assert got == want


def test_batch_tail_matches_column_form(spark):
    """Python twin vs the (DuckDB-oracle-verified) batch column form,
    over the sf0.001 events table with the user_bucket -> user_band
    hierarchy."""
    sf_dir = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    records = df.select(
        F.col("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_type"),
        (F.col("user_id") % 5).cast("string").alias("user_band"),
        (F.col("user_id") % 10).cast("string").alias("user_bucket"),
    )
    import __spark_entry__ as entrymod

    cfg = entrymod.hier_events_config()
    totals = sliding_window_totals(records, 300, 60)
    wb = with_offset_baseline(totals, 10)
    avg = totals.agg(F.avg("current")).collect()[0][0]

    # batch column form with the same absolute thresholds
    alerts = (
        wb.filter((F.col("current") > 2 * avg) | (F.col("current") < 0.2 * avg))
        .withColumn("anomaly_id", F.unix_timestamp("window_start").cast("string"))
    )
    bd = dimension_breakdown(records, cfg, 300, 60)
    bdw = breakdown_with_baseline(bd, wb, 10, targets=alerts)
    batch = hierarchical_contributors(
        alerts,
        bdw,
        parent_of={"user_bucket": "user_band"},
        parent_value_exprs={
            "user_bucket": (F.col("dim_value").cast("int") % 5).cast("string")
        },
        summary_size=5,
    ).collect()

    tail_cfg = TailConfig(
        mode="threshold",
        rca_mode="hierarchical",
        min_value=0.2 * avg,
        max_value=2 * avg,
        parent_of={"user_bucket": "user_band"},
        parent_value_fn=partial(modulo_parent_value, 5),
        summary_size=5,
    )
    aggs = long_form_window_aggs(records, cfg, 300, 60)
    tail_out = make_batch_tail(aggs, tail_cfg)
    tail_rca = tail_out.filter(F.col("row_type") == "rca").collect()

    got = {
        (r.window_start_epoch, r.dim_group, r.dim_name, r.dim_value): r.cost
        for r in tail_rca
    }
    want = {
        (
            int(r.window_start.timestamp()),
            r.dimension_group,
            r.dim_name,
            r.dim_value,
        ): r.cost
        for r in batch
    }
    assert set(got) == set(want)
    for k, cost in want.items():
        assert abs(got[k] - cost) <= max(1e-6, 1e-6 * abs(cost)), (k, got[k], cost)


def test_hierarchy_cooccurrence_conflict_rule(spark):
    """The deterministic max-conflict rule, in both resolution paths:
    when a child value co-occurs with several parent values inside one
    window, the MAX parent wins — in hierarchy_cooccurrence (batch
    pairs) and in long_form_window_aggs(with_hierarchy=True) (the
    streaming carry), identically; and the mapping is window-scoped."""
    import pandas as pd

    from online_anomaly_detection_root_cause_analysis_spark.config import (
        DimensionSpec,
        EngineConfig,
    )
    from online_anomaly_detection_root_cause_analysis_spark.operators.windows import (
        hierarchy_cooccurrence,
    )

    cfg = EngineConfig(
        timestamp_field="ts",
        value_field="value",
        dimensions=[
            DimensionSpec("parent_dim", group="g"),
            DimensionSpec("child_dim", group="g", parent="parent_dim"),
        ],
    )
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # window 0: child c1 co-occurs with parents pa and pz -> pz wins
        (base + pd.Timedelta(seconds=10), 1.0, "c1", "pa"),
        (base + pd.Timedelta(seconds=20), 1.0, "c1", "pz"),
        # window 0: child c2 with a single parent
        (base + pd.Timedelta(seconds=30), 1.0, "c2", "pm"),
        # next window (tumbling 300s): c1 now maps to pb ONLY there
        (base + pd.Timedelta(seconds=310), 1.0, "c1", "pb"),
    ]
    records = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "value", "child_dim", "parent_dim"])
    )
    pairs = {
        (int(r.window_start.timestamp()) % 3600, r.dim_value): r.parent_value
        for r in hierarchy_cooccurrence(records, cfg, 300, None).collect()
    }
    assert pairs == {(0, "c1"): "pz", (0, "c2"): "pm", (300, "c1"): "pb"}

    aggs = long_form_window_aggs(records, cfg, 300, None, with_hierarchy=True)
    carried = {
        (r.window_start_epoch % 3600, r.dim_value): r.parent_value
        for r in aggs.filter(F.col("dim_name") == "child_dim").collect()
    }
    assert carried == pairs


def test_batch_tail_cooc_matches_column_form(spark):
    """Data-dependent hierarchy parity (VERDICT r2 #2): the tail with
    hierarchy_from_data=True (parent values carried on the aggregate
    rows by long_form_window_aggs(with_hierarchy=True)) must rank the
    same dimensions at the same costs as the oracle-verified batch
    column form joining hierarchy_cooccurrence pairs. Parent user_seg
    ('vip' iff user_id % 97 == 0) is NOT derivable from the
    user_bucket value."""
    from online_anomaly_detection_root_cause_analysis_spark.operators.windows import (
        hierarchy_cooccurrence,
    )

    sf_dir = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    records = df.select(
        F.col("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_type"),
        F.when(F.col("user_id") % 97 == 0, F.lit("vip"))
        .otherwise(F.lit("std"))
        .alias("user_seg"),
        (F.col("user_id") % 10).cast("string").alias("user_bucket"),
    )
    import __spark_entry__ as entrymod

    cfg = entrymod.hier_cooc_events_config()
    totals = sliding_window_totals(records, 300, 60)
    wb = with_offset_baseline(totals, 10)
    avg = totals.agg(F.avg("current")).collect()[0][0]

    alerts = (
        wb.filter((F.col("current") > 2 * avg) | (F.col("current") < 0.2 * avg))
        .withColumn("anomaly_id", F.unix_timestamp("window_start").cast("string"))
    )
    bd = dimension_breakdown(records, cfg, 300, 60)
    bdw = breakdown_with_baseline(bd, wb, 10, targets=alerts)
    pairs = hierarchy_cooccurrence(records, cfg, 300, 60)
    batch = hierarchical_contributors(
        alerts,
        bdw,
        parent_of={"user_bucket": "user_seg"},
        parent_pairs=pairs,
        summary_size=5,
    ).collect()

    tail_cfg = TailConfig(
        mode="threshold",
        rca_mode="hierarchical",
        min_value=0.2 * avg,
        max_value=2 * avg,
        parent_of={"user_bucket": "user_seg"},
        hierarchy_from_data=True,
        summary_size=5,
    )
    aggs = long_form_window_aggs(records, cfg, 300, 60, with_hierarchy=True)
    tail_rca = (
        make_batch_tail(aggs, tail_cfg).filter(F.col("row_type") == "rca").collect()
    )

    got = {
        (r.window_start_epoch, r.dim_group, r.dim_name, r.dim_value): r.cost
        for r in tail_rca
    }
    want = {
        (
            int(r.window_start.timestamp()),
            r.dimension_group,
            r.dim_name,
            r.dim_value,
        ): r.cost
        for r in batch
    }
    assert set(got) == set(want)
    # the hierarchy must have actually influenced level-2 rows
    assert any(k[2] == "user_bucket" for k in want)
    for k, cost in want.items():
        assert abs(got[k] - cost) <= max(1e-6, 1e-6 * abs(cost)), (k, got[k], cost)


def test_streaming_hierarchy_from_data_matches_fn_and_replay(spark, tmp_path):
    """Streaming run with with_hierarchy=True aggregate rows and the
    data-dependent tail: (1) streaming output == pure-Python replay of
    the finalized windows; (2) because every pages host determines its
    domain (and domain its tld), the co-occurrence-resolved hierarchy
    must agree EXACTLY with the derivable parent_value_fn tail — a
    cross-validation of the two resolution paths on the same stream."""
    import os

    import pandas as pd

    pdf = generate_pages(PagesSpec(n_pages=1500)).sort_values("warc_ts")
    pages = tmp_path / "pages"
    pages.mkdir()
    _write_chunks(pdf, pages, 5)

    records_batch = build_page_records(spark.createDataFrame(pdf), CFG)
    totals = sliding_window_totals(records_batch, 300, 60)
    max_value = totals.approxQuantile("current", [0.5], 0.0)[0]

    tail_data = TailConfig(
        mode="threshold",
        rca_mode="hierarchical",
        max_value=max_value,
        parent_of=dict(CFG.hierarchy_pairs()),
        hierarchy_from_data=True,
        summary_size=5,
    )
    job = StreamingJob(
        work_dir=str(tmp_path / "job"), cfg=CFG, tail=tail_data,
        size_s=300, slide_s=60, with_hierarchy=True,
    )
    stream = build_page_records(read_pages_stream(spark, str(pages)), CFG)
    q1 = job.start_aggregate_query(stream)
    q1.processAllAvailable()
    q1.stop()
    q2 = job.start_detect_query(spark)
    q2.processAllAvailable()
    q2.stop()

    rca = spark.read.parquet(job.rca_dir)
    assert rca.filter(F.col("dim_level") > 1).count() > 0

    def _replay(cfg: TailConfig):
        replay = StreamingTail(cfg)
        out = []
        for f in sorted(os.listdir(job.aggs_dir)):
            if not f.endswith(".parquet"):
                continue
            chunk = pd.read_parquet(os.path.join(job.aggs_dir, f))
            if len(chunk) == 0:
                continue
            for ws, cur, rec, bd, hier in rows_to_windows(chunk):
                out.extend(replay.process_window(ws, cur, rec, bd, hier))
        return sorted(
            (e["seq"], e["dim_group"], e["dim_level"], e["dim_name"],
             e["dim_value"], f"{e['cost']:.6f}")
            for e in out if e["row_type"] == "rca"
        )

    got = sorted(
        (r.seq, r.dim_group, r.dim_level, r.dim_name, r.dim_value, f"{r.cost:.6f}")
        for r in rca.collect()
    )
    assert got == _replay(tail_data)
    # co-occurrence resolution == derivable-fn resolution on pages
    assert got == _replay(_pages_tail(max_value))


def test_streaming_zscore_matches_replay(spark, tmp_path):
    """EWMA z-score state held in the state store across micro-batches
    (north_star): streaming output == pure-Python replay of the same
    finalized windows."""
    import os

    import pandas as pd

    from online_anomaly_detection_root_cause_analysis_spark.sources.pages import (
        PagesSpec,
        generate_pages,
        read_pages_stream,
    )

    pdf = generate_pages(PagesSpec(n_pages=1500)).sort_values("warc_ts")
    pages = tmp_path / "pages"
    pages.mkdir()
    _write_chunks(pdf, pages, 5)

    tail_cfg = TailConfig(mode="zscore", ewma_alpha=0.2, ewma_z_threshold=1.5)
    job = StreamingJob(
        work_dir=str(tmp_path / "job"), cfg=CFG, tail=tail_cfg,
        size_s=300, slide_s=60,
    )
    stream = build_page_records(read_pages_stream(spark, str(pages)), CFG)
    q1 = job.start_aggregate_query(stream)
    q1.processAllAvailable()
    q1.stop()
    q2 = job.start_detect_query(spark)
    q2.processAllAvailable()
    q2.stop()

    alerts = spark.read.parquet(job.alerts_dir)
    assert alerts.count() > 0

    replay = StreamingTail(tail_cfg)
    expected = []
    for f in sorted(os.listdir(job.aggs_dir)):
        if not f.endswith(".parquet"):
            continue
        chunk = pd.read_parquet(os.path.join(job.aggs_dir, f))
        if len(chunk):
            for ws, cur, rec, bd, hier in rows_to_windows(chunk):
                expected.extend(replay.process_window(ws, cur, rec, bd, hier))

    got = sorted(
        (r.seq, r.window_start_epoch, f"{r.current:.6f}", f"{r.baseline:.6f}",
         f"{r.score:.6f}" if r.score is not None else "null")
        for r in alerts.collect()
    )
    want = sorted(
        (e["seq"], e["window_start_epoch"], f"{e['current']:.6f}",
         f"{e['baseline']:.6f}",
         f"{e['score']:.6f}" if e["score"] is not None else "null")
        for e in expected if e["row_type"] == "alert"
    )
    assert got == want


def test_checkpoint_resume_hierarchy_cooc(spark, tmp_path):
    """Kill/resume with the DATA-DEPENDENT hierarchy (VERDICT r4 #5):
    the carried (parent_name, parent_value) columns ride the aggregate
    checkpoint, and the tail's window-scoped co-occurrence resolution
    must survive a restart — the resumed run's rca table equals one
    uninterrupted run, including level-2 rows whose parents were
    resolved from the data."""
    from .test_streaming import _norm_rows

    pdf = generate_pages(PagesSpec(n_pages=1500)).sort_values("warc_ts")
    inc = tmp_path / "pages_inc"
    inc.mkdir()
    _write_chunks(pdf.iloc[:750], inc, 3, start_idx=0)

    records_batch = build_page_records(spark.createDataFrame(pdf), CFG)
    totals = sliding_window_totals(records_batch, 300, 60)
    max_value = totals.approxQuantile("current", [0.5], 0.0)[0]
    tail_data = TailConfig(
        mode="threshold",
        rca_mode="hierarchical",
        max_value=max_value,
        parent_of=dict(CFG.hierarchy_pairs()),
        hierarchy_from_data=True,
        summary_size=5,
    )

    def run(pages_dir, work):
        job = StreamingJob(
            work_dir=work, cfg=CFG, tail=tail_data,
            size_s=300, slide_s=60, with_hierarchy=True,
        )
        stream = build_page_records(read_pages_stream(spark, str(pages_dir)), CFG)
        q1 = job.start_aggregate_query(stream)
        q1.processAllAvailable()
        q1.stop()
        q2 = job.start_detect_query(spark)
        q2.processAllAvailable()
        q2.stop()
        return job

    work = str(tmp_path / "job_inc")
    job = run(inc, work)
    mid_rca = spark.read.parquet(job.rca_dir).count()

    _write_chunks(pdf.iloc[750:], inc, 3, start_idx=3)
    job = run(inc, work)

    alldir = tmp_path / "pages_all"
    alldir.mkdir()
    _write_chunks(pdf, alldir, 6)
    gold = run(alldir, str(tmp_path / "job_gold"))

    got = spark.read.parquet(job.rca_dir)
    want = spark.read.parquet(gold.rca_dir)
    assert want.count() > mid_rca  # the resume actually added output
    assert want.filter(F.col("dim_level") > 1).count() > 0
    assert _norm_rows(got) == _norm_rows(want)
