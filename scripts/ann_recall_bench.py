#!/usr/bin/env python3
"""ANN recall-vs-cost sweep (r7 VERDICT #7): the driver gates
embedding_topk_lsh / embedding_topk_ivf at recall-saturating operating
points; this script measures WHY those points were chosen, from data —
recall@10 vs wall time and vs candidate volume across the knob grid
(tables x multiprobe for LSH at the gate's bits=5; nprobe for IVF at
n_centroids=16) at sf0.1, against exact brute-force ground truth.
Writes BENCH/ann_recall_curve.json; render_bench_md.py reports it.

Protocol: one JVM (the sweep compares configs against each other, and
a fresh JVM per cell would drown 1-3 s cells in 20 s startups); ground
truth first, then each config timed over `reps` repeats, median
reported, plus the scored-candidate count per config (the scale-cost
proxy: candidates/query ~ N * probes / 2^bits for LSH, N * nprobe /
n_centroids for IVF).
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import functions as F

    from online_anomaly_detection_root_cause_analysis_spark.session import get_spark
    from online_anomaly_detection_root_cause_analysis_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        train_ivf_centroids,
    )
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="ann-recall", cpus=32, shuffle_partitions=32)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vecs = emb.count()
    queries = entry_mod._query_vectors(spark, sf_dir)
    n_q = queries.count()

    def truth_sets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    t0 = time.time()
    truth = truth_sets(brute_force_topk(emb, queries, k=10))
    brute_sec = round(time.time() - t0, 3)

    def measure(fn):
        # recall from one run, timing = median of `reps` count() runs
        got = truth_sets(fn())
        recall = statistics.mean(
            len(got.get(q, set()) & truth[q]) / len(truth[q]) for q in truth
        )
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn().count()
            times.append(time.time() - t0)
        return round(recall, 4), round(statistics.median(times), 3)

    results = {
        "sf_dir": sf_dir,
        "n_vectors": n_vecs,
        "n_queries": n_q,
        "k": 10,
        "reps": reps,
        "brute_force_sec": brute_sec,
        "lsh": [],
        "ivf": [],
    }

    # LSH grid at the gate's bits=5 (32 buckets/table)
    for tables in (2, 4, 8, 16):
        for multiprobe in (0, 2, 5):
            def lsh():
                return lsh_topk(
                    emb, queries, k=10, bits=5, tables=tables,
                    multiprobe=multiprobe,
                )
            recall, sec = measure(lsh)
            # scored candidates per query (cost proxy): the post-dedup
            # (query, vec) pairs the exact scorer touches
            results["lsh"].append(
                {
                    "bits": 5,
                    "tables": tables,
                    "multiprobe": multiprobe,
                    "recall_at_10": recall,
                    "median_sec": sec,
                    "probes_per_query": tables * (1 + multiprobe),
                }
            )
            print(f"lsh tables={tables} mp={multiprobe}: r={recall} {sec}s",
                  flush=True)

    # IVF: train once (the production topology trains offline), sweep nprobe
    cents = train_ivf_centroids(emb, n_centroids=16)
    for nprobe in (1, 2, 4, 8, 12, 16):
        def ivf():
            return ivf_topk(
                emb, queries, k=10, n_centroids=16, nprobe=nprobe,
                centroids=cents,
            )
        recall, sec = measure(ivf)
        results["ivf"].append(
            {
                "n_centroids": 16,
                "nprobe": nprobe,
                "recall_at_10": recall,
                "median_sec": sec,
                "expected_candidate_fraction": round(nprobe / 16, 3),
            }
        )
        print(f"ivf nprobe={nprobe}: r={recall} {sec}s", flush=True)

    spark.stop()
    dest = os.path.join(REPO, "BENCH", "ann_recall_curve.json")
    with open(dest, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"wrote": dest, "lsh_cells": len(results["lsh"]),
                      "ivf_cells": len(results["ivf"])}))


if __name__ == "__main__":
    main()
