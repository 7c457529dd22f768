"""Streaming MacroBase tail: the pickled scorer/classifier/summarizer
state must survive micro-batch boundaries and checkpoints — streaming
output == single-pass batch replay of the same finalized windows."""

import os

from pyspark.sql import functions as F

from online_anomaly_detection_root_cause_analysis_spark.algorithms.ewfeature import (
    EWFeatureSpec,
)
from online_anomaly_detection_root_cause_analysis_spark.algorithms.summarizer import (
    SummarizerSpec,
)
from online_anomaly_detection_root_cause_analysis_spark.config import web_pages_config
from online_anomaly_detection_root_cause_analysis_spark.sources.pages import (
    PagesSpec,
    generate_pages,
    read_pages_stream,
)
from online_anomaly_detection_root_cause_analysis_spark.sources.records import (
    build_page_records,
)
from online_anomaly_detection_root_cause_analysis_spark.streaming.job import StreamingJob
from online_anomaly_detection_root_cause_analysis_spark.streaming.state import (
    StreamingTail,
    TailConfig,
    rows_to_windows,
)

from .test_streaming import _write_chunks

CFG = web_pages_config()


def _macrobase_tail() -> TailConfig:
    return TailConfig(
        mode="macrobase",
        detector_spec=EWFeatureSpec(
            warmup_count=20, sample_size=50, decay_period=100,
            decay_rate=0.01, training_period=100, percentile=0.95,
        ),
        summarizer_spec=SummarizerSpec(
            summary_update_period=50, decay_rate=0.01,
            outlier_item_summary_size=500, inlier_item_summary_size=500,
            min_oi_ratio=1, min_support=0.05,
            attributes=[d.name for d in CFG.dimensions],
            attribute_combinations=True, summary_generation_period=100,
        ),
    )


def test_streaming_macrobase_matches_replay(spark, tmp_path):
    pdf = generate_pages(PagesSpec(n_pages=2500)).sort_values("warc_ts")
    pages = tmp_path / "pages"
    pages.mkdir()
    _write_chunks(pdf, pages, 6)

    job = StreamingJob(
        work_dir=str(tmp_path / "job"), cfg=CFG, tail=_macrobase_tail(),
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

    # pure-Python replay over the identical finalized windows
    import pandas as pd

    replay = StreamingTail(_macrobase_tail())
    expected = []
    for f in sorted(os.listdir(job.aggs_dir)):
        if not f.endswith(".parquet"):
            continue
        chunk = pd.read_parquet(os.path.join(job.aggs_dir, f))
        if len(chunk) == 0:
            continue
        for ws, cur, rec, bd, hier in rows_to_windows(chunk):
            expected.extend(replay.process_window(ws, cur, rec, bd, hier))

    exp_alerts = [e for e in expected if e["row_type"] == "alert"]
    exp_rca = [e for e in expected if e["row_type"] == "rca"]
    got_alerts = sorted(
        (r.seq, r.window_start_epoch, bool(r.is_outlier), f"{r.score:.6f}")
        for r in alerts.collect()
    )
    want_alerts = sorted(
        (e["seq"], e["window_start_epoch"], bool(e["is_outlier"]), f"{e['score']:.6f}")
        for e in exp_alerts
    )
    assert got_alerts == want_alerts
    got_rca = sorted(
        (r.seq, r.dim_name, r.dim_value, f"{r.ratio_to_inliers:.6f}" if r.ratio_to_inliers is not None else "inf")
        for r in rca.collect()
    )
    want_rca = sorted(
        (e["seq"], e["dim_name"], e["dim_value"],
         f"{e['ratio_to_inliers']:.6f}" if e["ratio_to_inliers"] is not None else "inf")
        for e in exp_rca
    )
    assert got_rca == want_rca
