"""spark-submit entrypoint:

    spark-submit --py-files .engine-pyfiles.zip -m ... OR simply
    python -m engine <cmd> [args]

Commands
    create   <table_root> [num_convs]   create + seed a transcripts table
    maintain <table_root>               full maintenance pass
    merge    <table_root>               impute-MERGE only
    compact  <table_root>               bin-packing compaction only
    rewrite-deletes <table_root>        fold the merge-on-read delete backlog
    delete   <table_root> <conv_id>     DELETE FROM ... WHERE conv_id = X
                                        (compliance purge of a conversation)
    compact-deletes <table_root>        MINOR delete compaction (metadata-cheap)
    add-column <table_root> <name> <type>  additive schema evolution
    add-constraint <table_root> <name> <sql_expr>  CHECK constraint
    drop-constraint <table_root> <name>
    cluster  <table_root> [zorder|hilbert]
    rollback <table_root> <snapshot_id> undo to an earlier retained snapshot
    branch   <table_root> <name>        cut an audit branch at current
    tag      <table_root> <name>        pin current snapshot against expiry
    publish  <table_root> <branch>      fast-forward main to a branch head
    drop-ref <table_root> <name>        delete a branch/tag ref
    expire   <table_root> [keep_last]   also expires dead checkpoint logs
    sweep    <table_root> [grace_seconds]
    index    <table_root> <out_dir>     materialize the offline candidate index
    stats    <table_root>               snapshot/file stats
"""

from __future__ import annotations

import json
import sys

from .format import Table
from .session import get_spark


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    cmd, root = argv[0], argv[1]
    spark = get_spark(app=f"engine-{cmd}")
    spark.sparkContext.setLogLevel("WARN")
    try:
        if cmd == "create":
            from .synth import generate_transcripts, inject_missing
            from .write import append
            n = int(argv[2]) if len(argv) > 2 else 1000
            df, _ = inject_missing(generate_transcripts(spark, num_convs=n))
            t = Table.create(root)
            append(t, df, num_files=max(16, n // 3000),
                   range_cols=["conv_id", "turn_idx"],
                   sort_cols=["conv_id", "turn_idx"])
            print(json.dumps({"created": root, "convs": n}))
        elif cmd == "maintain":
            from .maintain import run_maintenance
            print(json.dumps(run_maintenance(spark, Table(root))))
        elif cmd == "merge":
            from .merge import impute_merge
            snap = impute_merge(spark, Table(root))
            print(json.dumps({"snapshot": snap.snapshot_id}))
        elif cmd == "compact":
            from .maintain import compact
            snap = compact(spark, Table(root))
            print(json.dumps({"snapshot":
                              snap.snapshot_id if snap else None}))
        elif cmd == "rewrite-deletes":
            from .maintain import rewrite_deletes
            snap = rewrite_deletes(spark, Table(root))
            print(json.dumps({"snapshot":
                              snap.snapshot_id if snap else None}))
        elif cmd == "delete":
            from .merge import delete_where
            from .scan import Predicate
            snap = delete_where(spark, Table(root),
                                [Predicate("conv_id", "eq", argv[2])])
            print(json.dumps({
                "snapshot": snap.snapshot_id if snap else None,
                "deleted_rows": (snap.summary.get("deleted_rows", 0)
                                 if snap else 0)}))
        elif cmd == "compact-deletes":
            from .maintain import compact_deletes
            snap = compact_deletes(spark, Table(root))
            print(json.dumps({"snapshot":
                              snap.snapshot_id if snap else None}))
        elif cmd == "add-constraint":
            t = Table(root)
            t.add_constraint(argv[2], argv[3])
            print(json.dumps({"constraints": t.constraints()}))
        elif cmd == "drop-constraint":
            t = Table(root)
            t.drop_constraint(argv[2])
            print(json.dumps({"constraints": t.constraints()}))
        elif cmd == "add-column":
            t = Table(root)
            t.add_column(argv[2], argv[3])
            print(json.dumps({"added": argv[2], "type": argv[3],
                              "schema_adds": t.schema_adds()}))
        elif cmd == "cluster":
            from .maintain import cluster
            strategy = argv[2] if len(argv) > 2 else "zorder"
            snap = cluster(spark, Table(root), strategy)
            print(json.dumps({"snapshot": snap.snapshot_id}))
        elif cmd == "branch":
            Table(root).create_branch(argv[2])
            print(json.dumps({"branch": argv[2],
                              "refs": Table(root).refs()}))
        elif cmd == "tag":
            Table(root).create_tag(argv[2])
            print(json.dumps({"tag": argv[2], "refs": Table(root).refs()}))
        elif cmd == "publish":
            snap = Table(root).fast_forward(argv[2])
            print(json.dumps({"published": argv[2],
                              "snapshot": snap.snapshot_id}))
        elif cmd == "drop-ref":
            Table(root).drop_ref(argv[2])
            print(json.dumps({"dropped": argv[2]}))
        elif cmd == "rollback":
            snap = Table(root).rollback_to(int(argv[2]))
            print(json.dumps({"snapshot": snap.snapshot_id,
                              "rolled_back_to":
                              snap.summary.get("rolled_back_to")}))
        elif cmd == "expire":
            from .maintain import expire_checkpoints, expire_snapshots
            keep = int(argv[2]) if len(argv) > 2 else 2
            expired = expire_snapshots(Table(root), keep)
            ckpts = expire_checkpoints(Table(root))
            print(json.dumps({"expired": expired,
                              "expired_checkpoints": ckpts}))
        elif cmd == "sweep":
            from .maintain import sweep_orphans
            grace = float(argv[2]) if len(argv) > 2 else 3600.0
            print(json.dumps({"removed":
                              sweep_orphans(spark, Table(root), grace)}))
        elif cmd == "index":
            from .index import build_candidate_index
            from .scan import scan
            out = argv[2]
            build_candidate_index(scan(spark, Table(root))) \
                .write.mode("overwrite").parquet(out)
            print(json.dumps({"index": out}))
        elif cmd == "stats":
            from .scan import scan_stats
            t = Table(root)
            snap = t.current_snapshot()
            print(json.dumps({
                **scan_stats(t),
                "snapshot": snap.snapshot_id if snap else None,
                "snapshots": [s.snapshot_id for s in t.snapshots()],
            }))
        else:
            print(__doc__)
            return 2
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
