#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4): per-query isolation
with the noop sink, repeated timings, and .explain("formatted") capture.

NOT part of the driver contract — bench.py stays the frozen measurement.

Usage:
  python bench_extra.py queries [--reps 3] [--names a1,j1,...] \
      [--plans plans/r07 --suffix before]
  python bench_extra.py noop --names dedup_minhash_lsh

Prints one JSON line per mode with {"name": {"first": s, "min": s, ...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["queries", "noop"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--names", default="")
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in args.names.split(",") if n] or HEADLINE

    import engine.queries as q
    import engine.queries_ops  # noqa: F401
    from engine.session import get_spark
    reg = q.queries()

    spark = get_spark(app="bench-extra", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py run_queries
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            if args.mode == "noop":
                (reg[name](spark, sf_dir)
                 .write.format("noop").mode("overwrite").save())
            else:
                reg[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        out[name] = {"first": times[0], "min": min(times), "all": times}
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = reg[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print("BENCH_EXTRA " + json.dumps(out))


if __name__ == "__main__":
    main()
