#!/usr/bin/env python3
"""Interleaved A/B for the r6->r7 curation_pipeline regression
(r7 VERDICT #3): BENCH_r6 recorded 4.6 s, BENCH_r7 9.5 s, but the r7
registry reorder also moved the query's position (cold-JIT/page-cache
effects are worth 1-3 s) and host co-tenancy varies 25-35%. This
script attributes the delta: variant A = HEAD's q_curation_pipeline,
variant B = the r6 commit's (run from a git-worktree snapshot at
.ab_r6, its own package tree on sys.path), each in a FRESH JVM with
the same warmup action, interleaved ABBA ABBA ... so slow host
windows hit both variants equally — the BENCH/skew_salted.json
protocol. Writes BENCH/curation_ab_r8.json.

Usage:
    git worktree add .ab_r6 <r6-commit>   # 88f7ebc; .ab_r6 is gitignored
    python scripts/curation_ab_bench.py [pairs] [sf_dir]
    git worktree remove --force .ab_r6    # keep LoC diagnostics honest
Worker mode (internal): --worker head|r6 <sf_dir> -> one timing line.
"""

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R6 = os.path.join(REPO, ".ab_r6")


def worker(variant: str, sf_dir: str) -> None:
    root = REPO if variant == "head" else R6
    sys.path.insert(0, root)
    os.chdir(root)
    from online_anomaly_detection_root_cause_analysis_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name=f"curation-ab-{variant}", cpus=32,
                      shuffle_partitions=32)
    # identical warmup to bench.py: JVM + parquet footer cache
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    t0 = time.time()
    n = entry_mod.q_curation_pipeline(spark, sf_dir).count()
    dt = time.time() - t0
    if hasattr(entry_mod, "cleanup"):
        entry_mod.cleanup()
    spark.stop()
    print(json.dumps({"variant": variant, "sec": round(dt, 3), "rows": n}))


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # ABBA blocks: first-mover advantage alternates
    sched = []
    for i in range(pairs):
        sched += ["head", "r6"] if i % 2 == 0 else ["r6", "head"]
    runs = []
    for i, variant in enumerate(sched):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", variant,
             sf_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-3000:])
            raise RuntimeError(f"worker {variant} failed")
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        runs.append(rec)
        print(f"[{i + 1}/{len(sched)}] {rec}", flush=True)
    by = {
        v: sorted(r["sec"] for r in runs if r["variant"] == v)
        for v in ("head", "r6")
    }
    res = {
        "sf_dir": sf_dir,
        "pairs": pairs,
        "protocol": "fresh JVM per run, ABBA interleave, same warmup",
        "runs": runs,
        "median_head_sec": statistics.median(by["head"]),
        "median_r6_sec": statistics.median(by["r6"]),
        "rows_head": next(r["rows"] for r in runs if r["variant"] == "head"),
        "rows_r6": next(r["rows"] for r in runs if r["variant"] == "r6"),
        "head_over_r6": round(
            statistics.median(by["head"]) / statistics.median(by["r6"]), 3
        ),
    }
    dest = os.path.join(REPO, "BENCH", "curation_ab_r8.json")
    with open(dest, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items() if k != "runs"}))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(sys.argv[i + 1], sys.argv[i + 2])
    else:
        main()
