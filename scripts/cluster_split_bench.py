"""near_dup_clusters cost split + pairs-materialized topology bench
(r5 VERDICT #2).

Measures, at the bench scale factor, in ONE JVM (sequential, so the
shares are comparable; absolute numbers carry the usual co-tenancy
spread):

  1. upstream_pairs_sec   — deriving the verified near-dup pair list
                            (LSH candidates + exact-Jaccard verify),
                            materialized via a count()
  2. full_query_sec       — the driver query as shipped (pairs
                            re-derived inside the clustering query)
  3. materialized_sec     — the production two-job topology: write the
                            pairs to parquet, read back, cluster
                            (write + read-cluster timed separately)

The interesting number is full - upstream vs materialized.read_cluster:
iteration cost is the same in both; the materialized variant pays the
pair pipeline ONCE (and on a real pipeline it is already materialized
as the verify job's output table).

Usage: python scripts/cluster_split_bench.py [sf_dir] > BENCH/near_dup_clusters_split.json
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from online_anomaly_detection_root_cause_analysis_spark.operators.dedup import (
        near_dup_clusters,
        near_duplicates,
    )
    from online_anomaly_detection_root_cause_analysis_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="cluster-split-bench",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    corpus = entrymod._doc_corpus(spark, sf_dir)

    # 1. upstream pair derivation alone
    t0 = time.time()
    n_pairs = near_duplicates(corpus, n=3, threshold=0.3, bands=32).count()
    upstream = time.time() - t0

    # 2. full driver query (pairs re-derived inside the clustering job)
    t0 = time.time()
    n_rows = entrymod.q_near_dup_clusters(spark, sf_dir).count()
    full = time.time() - t0

    # 3. pairs-materialized two-job topology
    tmp = tempfile.mkdtemp(prefix="ndc-pairs-")
    try:
        pairs_path = os.path.join(tmp, "pairs.parquet")
        t0 = time.time()
        near_duplicates(corpus, n=3, threshold=0.3, bands=32).write.mode(
            "overwrite"
        ).parquet(pairs_path)
        write_sec = time.time() - t0
        t0 = time.time()
        n_rows2 = near_dup_clusters(
            spark.read.parquet(pairs_path), all_docs=corpus
        ).count()
        read_cluster_sec = time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert n_rows2 == n_rows, (n_rows2, n_rows)

    print(
        json.dumps(
            {
                "metric": "near_dup_clusters_cost_split",
                "sf_dir": sf_dir,
                "n_pairs": n_pairs,
                "n_cluster_rows": n_rows,
                "upstream_pairs_sec": round(upstream, 2),
                "full_query_sec": round(full, 2),
                "iteration_share_sec": round(full - upstream, 2),
                "materialized": {
                    "write_pairs_sec": round(write_sec, 2),
                    "read_and_cluster_sec": round(read_cluster_sec, 2),
                },
                "note": (
                    "single JVM, sequential; the materialized topology is "
                    "what production runs (pairs are the verify job's "
                    "output table) — read_and_cluster is the clustering "
                    "job's true bill"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
