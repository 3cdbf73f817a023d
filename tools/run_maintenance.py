"""spark-submit entrypoint for the maintenance cadence (the north rule's
deployment shape: ``spark-submit --py-files engine.zip`` on a multi-executor
cluster at N and 4N executors).

Build the zip once (any python, no Spark needed)::

    python tools/run_maintenance.py --make-pyfiles engine.zip

Then submit against a cluster (or local[N] as the sandbox stand-in)::

    spark-submit --master <cluster-or-local[N]> --py-files engine.zip \
        tools/run_maintenance.py --table /path/to/table \
        [--target-bytes 134217728] [--strategy zorder] [--keep-last 2] \
        [--grace-seconds 3600] [--separate-compaction] [--json]

The job uses the ambient SparkSession (spark-submit's), so every --master /
--num-executors / --conf flag behaves normally; cluster-size scaling is a
matter of submitting the SAME invocation at N and 4N executors. Prints the
per-stage metrics dict (one JSON line with --json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def make_pyfiles(out: str) -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(here, "engine")
    with zipfile.ZipFile(out, "w") as z:
        for r, _, fs in os.walk(pkg):
            for f in fs:
                if f.endswith(".py"):
                    full = os.path.join(r, f)
                    z.write(full, os.path.relpath(full, here))
    print(f"wrote {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-pyfiles", metavar="ZIP", default=None,
                    help="write the --py-files zip and exit (no Spark)")
    ap.add_argument("--table", help="table root path")
    ap.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    ap.add_argument("--strategy", choices=["zorder", "hilbert"],
                    default="zorder")
    ap.add_argument("--keep-last", type=int, default=2)
    ap.add_argument("--grace-seconds", type=float, default=3600.0)
    ap.add_argument("--pass-id", default=None,
                    help="stable id to resume a crashed pass")
    ap.add_argument("--delete-backlog-fraction", type=float, default=0.02,
                    help="merge-on-read cadence policy: major-compact the "
                         "delete backlog only past this fraction of table "
                         "rows (0.0 = every pass)")
    ap.add_argument("--separate-compaction", action="store_true",
                    help="compact/cluster as standalone passes instead of "
                         "fusing the clustering into the MERGE rewrite")
    ap.add_argument("--json", action="store_true",
                    help="print metrics as one JSON line")
    args = ap.parse_args()

    if args.make_pyfiles:
        make_pyfiles(args.make_pyfiles)
        return
    if not args.table:
        ap.error("--table is required (or use --make-pyfiles)")

    from pyspark.sql import SparkSession

    # ambient session: spark-submit owns master/executors/conf; the engine
    # package arrives via --py-files
    spark = SparkSession.builder.getOrCreate()
    from engine.format import Table
    from engine.maintain import run_maintenance

    out = run_maintenance(spark, Table(args.table),
                          target_bytes=args.target_bytes,
                          strategy=args.strategy,
                          keep_last=args.keep_last,
                          grace_seconds=args.grace_seconds,
                          delete_backlog_fraction=args.delete_backlog_fraction,
                          pass_id=args.pass_id,
                          separate_compaction=args.separate_compaction)
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # direct `python tools/...` invocation
    main()
