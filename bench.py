"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf", ...}.

`value` is total wall-clock seconds over the headline suite; the dict
also carries derived throughput (windows/sec over the sliding-window
count) since BASELINE.json's metric is alert throughput. Set
SPARK_GRAFT_BENCH_SCALING=1 to additionally run the same suite at
local[8] vs local[32] and report scaling efficiency (the sandbox proxy
for N vs 4N executors — see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _run_suite(cpus: int, sf_dir: str) -> dict:
    from online_anomaly_detection_root_cause_analysis_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name=f"bench-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    qs = entry_mod.queries()
    # warm the JVM + parquet footer cache once with a trivial action
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    for name, fn in qs.items():
        t0 = time.time()
        counts[name] = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    n_windows = counts.get("sliding_window_sum", 0)
    result = {
        "cpus": cpus,
        "total_sec": total,
        "queries": timings,
        "counts": counts,
        "windows_per_sec": round(
            n_windows / timings["sliding_window_sum"], 1
        )
        if timings.get("sliding_window_sum")
        else None,
    }
    spark.stop()
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    main_run = _run_suite(cpus, sf_dir)

    out = {
        "metric": "headline_suite_wall_clock",
        "value": main_run["total_sec"],
        "unit": "sec",
        "queries": main_run["queries"],
        "sf": float(sf),
        "cpus": cpus,
        "windows_per_sec": main_run["windows_per_sec"],
        "row_counts": main_run["counts"],
    }

    if os.environ.get("SPARK_GRAFT_BENCH_SCALING") == "1":
        lo = _run_suite(8, sf_dir)
        hi = _run_suite(32, sf_dir)
        speedup = lo["total_sec"] / hi["total_sec"] if hi["total_sec"] else None
        out["scaling"] = {
            "local8_sec": lo["total_sec"],
            "local32_sec": hi["total_sec"],
            "speedup": round(speedup, 3) if speedup else None,
            "efficiency_vs_4x": round(speedup / 4.0, 3) if speedup else None,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
