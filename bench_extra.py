"""Per-query isolation bench (guide §1.4): times selected declared
queries in ONE fresh JVM with the noop sink (computation only, no
collect/count pruning games beyond what the sink implies — noop
materializes every column of every row), and optionally dumps
`.explain("formatted")` per query.

This file is NOT bench.py (which is frozen for driver measurement);
it exists for guide-§1 isolation numbers cited in OPTIMIZATION_r09.md.

Usage:
  python bench_extra.py [--sf DIR] [--plans OUTDIR] [--runs N] q1 q2 ...
Prints one JSON line {"sf_dir":..., "queries": {name: [secs...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="dir to write <q>.txt explain output")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--suffix", default="", help="appended to plan file names")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from online_anomaly_detection_root_cause_analysis_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-extra", cpus=cpus, shuffle_partitions=cpus)
    qs = entry_mod.queries()
    # warm JVM + parquet footer cache, mirroring bench.py
    spark.read.parquet(f"{args.sf}/events.parquet").count()

    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            if hasattr(entry_mod, "cleanup"):
                entry_mod.cleanup()
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if hasattr(entry_mod, "cleanup"):
                entry_mod.cleanup()
        out[name] = runs
    print(json.dumps({"sf_dir": args.sf, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
