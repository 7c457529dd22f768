"""Star-contraction vs min-label-propagation clustering bench
(r5 VERDICT #2c — "optionally try alternating large-star/small-star").

Two workloads, one JVM, sequential:

  1. REAL pair graph (the driver operating point): the sf near-dup
     pairs, materialized to parquet once, clustered by BOTH
     algorithms. Near-dup components are shallow (diameter 1-2), so
     propagation's O(diameter) rounds ~= 2 and star's extra per-round
     pass is pure overhead — this measures how much.
  2. ADVERSARIAL diameter: parallel chains (configurable diameter d,
     default 64) over n_nodes synthetic vertices. Propagation pays d
     rounds; star contraction pays O(log d) doubled passes. This is
     the regime the alternative exists for.

Both workloads assert EXACT output equality (exceptAll both ways)
before timing is reported — a faster wrong answer is not a result.

Usage: python scripts/cluster_star_bench.py [sf_dir] \
         > BENCH/near_dup_clusters_star.json
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _assert_equal(a, b):
    assert a.exceptAll(b).limit(1).count() == 0
    assert b.exceptAll(a).limit(1).count() == 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    diameter = int(os.environ.get("STAR_BENCH_DIAMETER", "64"))
    n_nodes = int(os.environ.get("STAR_BENCH_NODES", "200000"))

    from pyspark.sql import functions as F

    from online_anomaly_detection_root_cause_analysis_spark.operators.dedup import (
        near_dup_clusters,
        near_dup_clusters_star,
        near_duplicates,
    )
    from online_anomaly_detection_root_cause_analysis_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="cluster-star-bench",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    corpus = entrymod._doc_corpus(spark, sf_dir)

    out = {
        "metric": "near_dup_clusters_star_vs_propagation",
        "sf_dir": sf_dir,
    }

    tmp = tempfile.mkdtemp(prefix="ndc-star-")
    try:
        pairs_path = os.path.join(tmp, "pairs.parquet")
        near_duplicates(corpus, n=3, threshold=0.3, bands=32).write.mode(
            "overwrite"
        ).parquet(pairs_path)
        pairs = spark.read.parquet(pairs_path)
        out["n_pairs"] = pairs.count()

        t0 = time.time()
        prop = near_dup_clusters(pairs, all_docs=corpus)
        out["real_graph_propagation_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        star = near_dup_clusters_star(pairs, all_docs=corpus)
        out["real_graph_star_sec"] = round(time.time() - t0, 2)
        _assert_equal(prop, star)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # adversarial diameter: parallel chains, block size = diameter + 1
    block = diameter + 1
    chain = (
        spark.range(n_nodes)
        .filter(F.col("id") % block != block - 1)
        .filter(F.col("id") + 1 < n_nodes)
        .select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        .persist()
    )
    out["chain_edges"] = chain.count()
    out["chain_diameter"] = diameter

    t0 = time.time()
    prop_c = near_dup_clusters(chain, max_iters=diameter + 2)
    prop_c.count()
    out["chain_propagation_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    star_c = near_dup_clusters_star(chain, max_iters=diameter + 2)
    star_c.count()
    out["chain_star_sec"] = round(time.time() - t0, 2)
    _assert_equal(prop_c, star_c)
    chain.unpersist()

    out["note"] = (
        "single JVM, sequential, exact-equality-asserted; real near-dup "
        "graphs are shallow so propagation's fewer per-round passes win "
        "there — star contraction is the deep-graph insurance"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
