"""End-to-end two-job dedup topology through the REAL CLIs (r7 VERDICT
#6): jobs/run_streaming.py --fuzzy-dedup-col --fuzzy-old-banded writes
the online candidate table, jobs/run_dedup.py --clusterer auto
verifies + clusters it offline, and the final keep-list must equal the
batch composition of the same operators (streaming_incremental_lsh's
batch twin -> verify_candidate_pairs -> near_dup_clusters_star). The
pieces are parity-tested individually; this test exercises the GLUE —
argv parsing, xxhash64(url) keying on both sides, the parquet
candidate handoff, banding-param agreement between the CLI defaults
and banded_signature_table, and the auto-clusterer provenance rule."""

import importlib
import os
import sys
import threading
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from online_anomaly_detection_root_cause_analysis_spark.operators.dedup import (
    banded_signature_table,
    near_dup_clusters_star,
    streaming_incremental_lsh,
    verify_candidate_pairs,
)
from online_anomaly_detection_root_cause_analysis_spark.sources.pages import (
    PagesSpec,
    generate_pages,
)


def _write_chunks(pdf, path, n_files: int, start_idx: int = 0) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    chunk = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part) == 0:
            continue
        table = pa.Table.from_pandas(part, preserve_index=False)
        f = path / f"chunk-{start_idx + i:05d}.parquet"
        pq.write_table(table, f)
        os.utime(f, (1e9 + (start_idx + i), 1e9 + (start_idx + i)))


def test_two_job_topology_cli_end_to_end(spark, tmp_path, monkeypatch):
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "jobs")
    )
    run_streaming = importlib.import_module("run_streaming")
    run_dedup = importlib.import_module("run_dedup")

    # corpus: 20 curated pages; stream = 25 fresh + 8 re-crawls of
    # curated text (new url) + 4 in-stream mirrors of fresh pages
    pdf = generate_pages(PagesSpec(n_pages=45)).sort_values("warc_ts")
    curated = pdf.head(20).copy()
    fresh = pdf.iloc[20:].copy()
    recrawls = curated.head(8).copy()
    recrawls["url"] = recrawls["url"] + "?recrawl=1"
    mirrors = fresh.head(4).copy()
    mirrors["url"] = mirrors["url"] + "?mirror=1"
    stream_pdf = (
        pd.concat([fresh, recrawls, mirrors])
        .sort_values("warc_ts")
        .reset_index(drop=True)
    )
    t0 = stream_pdf["warc_ts"].min()
    stream_pdf["warc_ts"] = (
        t0 + pd.to_timedelta(stream_pdf.index * 30, unit="s")
    ).astype("datetime64[us]")

    old_docs = spark.createDataFrame(curated[["url", "text"]]).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    old_dir = str(tmp_path / "old_banded")
    banded_signature_table(old_docs).write.parquet(old_dir)

    src = tmp_path / "pages"
    src.mkdir()
    _write_chunks(stream_pdf, src, 3)
    work = str(tmp_path / "work")

    # ---- job 1: the streaming CLI, flags exercised for real.
    # main() blocks on awaitAnyTermination, so it runs on a thread and
    # the test drains + stops its queries through spark.streams
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_streaming.py",
            "--input", str(src),
            "--work", work,
            "--fuzzy-dedup-col", "text",
            "--fuzzy-watermark", "2 hours",
            "--fuzzy-old-banded", old_dir,
        ],
    )
    t = threading.Thread(target=run_streaming.main, daemon=True)
    t.start()
    deadline = time.time() + 120
    wanted = {"aggregate", "detect", "lsh_candidates"}
    while time.time() < deadline:
        live = {q.name for q in spark.streams.active}
        if wanted <= live:
            break
        time.sleep(0.5)
    else:
        pytest.fail(f"streaming queries never started: {live}")
    by_name = {q.name: q for q in spark.streams.active}
    by_name["aggregate"].processAllAvailable()
    by_name["lsh_candidates"].processAllAvailable()
    by_name["detect"].processAllAvailable()
    for q in spark.streams.active:
        q.stop()
    t.join(timeout=60)
    assert not t.is_alive()

    cands_dir = os.path.join(work, "near_dup_candidates")
    cands = spark.read.parquet(cands_dir)
    assert {"old", "new"} == {
        r.side for r in cands.select("side").distinct().collect()
    }

    # ---- job 2: offline verify + cluster via the run_dedup CLI;
    # --candidates present -> auto picks star (provenance rule)
    stream_docs = spark.createDataFrame(stream_pdf[["url", "text"]]).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    all_docs = old_docs.unionByName(stream_docs)
    docs_dir = str(tmp_path / "docs")
    all_docs.write.parquet(docs_dir)
    out_dir = str(tmp_path / "dedup")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_dedup.py",
            "--input", docs_dir,
            "--out", out_dir,
            "--candidates", cands_dir,
        ],
    )
    run_dedup.main()
    kept = {r.doc_id for r in spark.read.parquet(out_dir + "/keep").collect()}

    # ---- batch composition of the same operators = expected keep set
    batch_stream = spark.createDataFrame(
        stream_pdf[["url", "text", "warc_ts"]]
    ).select(
        F.xxhash64("url").alias("doc_id"), "text", F.col("warc_ts").alias("ts")
    )
    batch_cands = streaming_incremental_lsh(
        batch_stream, spark.read.parquet(old_dir), watermark="2 hours"
    )
    verified = verify_candidate_pairs(
        all_docs,
        batch_cands.select("doc_a", "doc_b").distinct(),
        n=3,
        threshold=0.3,
    )
    expected_clusters = near_dup_clusters_star(
        verified.select("doc_a", "doc_b"), all_docs=all_docs
    )
    expected_keep = {
        r.doc_id
        for r in expected_clusters.filter(
            F.col("doc_id") == F.col("cluster_rep")
        ).collect()
    }
    assert kept == expected_keep

    # planted semantics: each recrawl clusters with its curated
    # original — exactly one of the two survives; ditto mirrors; and
    # every never-duplicated doc survives
    key = {
        r.url: r.k
        for r in spark.createDataFrame(
            pd.concat([curated, stream_pdf])[["url"]].drop_duplicates()
        ).select("url", F.xxhash64("url").alias("k")).collect()
    }
    for u in recrawls["url"]:
        a, b = key[u.replace("?recrawl=1", "")], key[u]
        assert (a in kept) != (b in kept), u
    for u in mirrors["url"]:
        a, b = key[u.replace("?mirror=1", "")], key[u]
        assert (a in kept) != (b in kept), u
    dup_urls = set(recrawls["url"]) | set(mirrors["url"]) | set(
        curated.head(8)["url"]
    ) | set(fresh.head(4)["url"])
    for u in set(curated["url"]) | set(stream_pdf["url"]):
        if u not in dup_urls:
            assert key[u] in kept, u
