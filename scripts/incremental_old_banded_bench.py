"""Bench the incremental_near_dups old-side contract (r6 VERDICT #4):
recompute-old-MinHash (self-contained mode) vs consuming the previous
run's persisted banded_signature_table (`old_banded` — the production
mode). Same corpus split as q_incremental_near_dups; interleaved A/B
timed runs; results + the result-equality check go to
BENCH/incremental_old_banded.json.

Usage: python scripts/incremental_old_banded_bench.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from online_anomaly_detection_root_cause_analysis_spark.operators.dedup import (  # noqa: E402
    banded_signature_table,
    incremental_near_dups,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    tmp = tempfile.mkdtemp(prefix="inc_banded_")
    banded_dir = os.path.join(tmp, "old_banded")
    docs.count()  # warm the JVM/scan path so t_build isn't first-job cost
    t0 = time.monotonic()
    banded_signature_table(old, bands=32).write.parquet(banded_dir)
    t_build = time.monotonic() - t0

    def run(with_table: bool) -> float:
        ob = spark.read.parquet(banded_dir) if with_table else None
        t0 = time.monotonic()
        incremental_near_dups(old, new, bands=32, old_banded=ob).agg(
            F.sum("n_old_matches"), F.sum(F.col("kept").cast("long"))
        ).collect()
        return time.monotonic() - t0

    recompute, precomputed = [], []
    for i in range(n_runs + 1):
        a, b = run(False), run(True)
        if i == 0:
            continue
        recompute.append(a)
        precomputed.append(b)

    same = (
        incremental_near_dups(old, new, bands=32).orderBy("doc_id").collect()
        == incremental_near_dups(
            old, new, bands=32, old_banded=spark.read.parquet(banded_dir)
        ).orderBy("doc_id").collect()
    )

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out = {
        "sf_dir": sf_dir,
        "old_rows": old.count(),
        "new_rows": new.count(),
        "banded_table_build_s": round(t_build, 3),
        "protocol": f"interleaved A/B x{n_runs} after 1 warm-up pair, one JVM, "
        f"local[{cpus}]",
        "recompute_runs_s": [round(x, 3) for x in recompute],
        "precomputed_runs_s": [round(x, 3) for x in precomputed],
        "recompute_median_s": round(med(recompute), 3),
        "precomputed_median_s": round(med(precomputed), 3),
        "results_identical": bool(same),
        "note": (
            "precomputed = the production monthly-refresh contract: the "
            "previous run's banded_signature_table is read back, so the "
            "incremental job hashes only the new dump. The saved work is "
            "the old-side MinHash (64 hashes/doc over the full curated "
            "corpus), which grows with corpus size while the dump stays "
            "fixed — at 100 TB the recompute mode re-hashes the whole "
            "corpus every refresh and the delta dominates."
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/incremental_old_banded.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if "runs" not in k and k != "note"}))


if __name__ == "__main__":
    main()
