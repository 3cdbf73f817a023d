"""Snapshot-pinned scans with manifest-stats file pruning.

Reference analog: the hand-rolled min/max range filter that drops external
rows outside the query column's [min, max]
(``codes/estimation/row_acquisitor.py:705-712, 1097-1099``) and the domain
``isin`` filter (``row_acquisitor.py:721-723``).  Here both become *file-level*
pruning against the manifest's per-file min/max stats, executed on the driver
over O(files) metadata before Spark plans the scan — then repeated row-level by
Catalyst/Parquet for free (predicate pushdown into row-group stats).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .format import DataFile, Snapshot, Table


@dataclass(frozen=True)
class Predicate:
    """Minimal pruning predicate language: =, <, <=, >, >=, in, notnull.
    ``in`` values must be a SORTED list (bisect-based planning)."""
    column: str
    op: str          # 'eq' | 'lt' | 'le' | 'gt' | 'ge' | 'in' | 'notnull'
    value: Any = None

    def might_match(self, f: DataFile) -> bool:
        """Conservative: True unless the file's stats PROVE no row matches."""
        st = f.stats.get(self.column)
        if not st:
            return True
        mn, mx = st.get("min"), st.get("max")
        v = self.value
        if self.op == "notnull":
            nulls = st.get("null_count")
            return not (nulls is not None and nulls >= f.record_count)
        if mn is None or mx is None:
            return True
        try:
            if self.op == "eq":
                return mn <= v <= mx
            if self.op == "lt":
                return mn < v
            if self.op == "le":
                return mn <= v
            if self.op == "gt":
                return mx > v
            if self.op == "ge":
                return mx >= v
            if self.op == "in":
                # planning is O(files × log keys), not O(files × keys):
                # with a sorted key list, one bisect decides whether any key
                # falls inside this file's [min, max]
                import bisect
                try:
                    i = bisect.bisect_left(v, mn)
                    return i < len(v) and v[i] <= mx
                except TypeError:
                    return any(mn <= x <= mx for x in v)
        except TypeError:
            return True  # incomparable types (e.g. str bound vs ts) → keep
        return True


def prune_files(entries: list[DataFile],
                predicates: list[Predicate] | None) -> list[DataFile]:
    if not predicates:
        return entries
    return [f for f in entries
            if all(p.might_match(f) for p in predicates)]


def scan(spark: SparkSession, table: Table,
         snapshot_id: int | None = None,
         predicates: list[Predicate] | None = None,
         columns: list[str] | None = None) -> DataFrame:
    """Read a pinned snapshot. File list comes ONLY from the snapshot's
    manifests (never a live directory listing), so concurrent maintenance
    commits are invisible — snapshot isolation."""
    snap: Snapshot | None
    if snapshot_id is None:
        snap = table.current_snapshot()
    else:
        snap = table.snapshot(snapshot_id)
    entries = table.manifest_entries(snap)
    entries = prune_files(entries, predicates)
    if not entries:
        # empty relation with the right schema: read zero files is an error,
        # so read one file's schema then filter everything out is wasteful;
        # instead build an empty DF from the table schema via any parquet file
        all_entries = table.manifest_entries(snap)
        if not all_entries:
            raise ValueError("scan of empty table; append data first")
        import os
        df = spark.read.parquet(os.path.join(table.root, all_entries[0].path))
        df = df.limit(0)
    else:
        import os
        paths = [os.path.join(table.root, e.path) for e in entries]
        df = spark.read.parquet(*paths)
    if columns:
        df = df.select(*columns)
    return df


def incremental_scan(spark: SparkSession, table: Table,
                     from_snapshot_id: int,
                     to_snapshot_id: int | None = None) -> DataFrame:
    """Rows from data files ADDED strictly after ``from_snapshot_id`` up to
    ``to_snapshot_id`` (default: current) — Iceberg-style incremental append
    scan. For append snapshots this is exactly the new rows; for
    copy-on-write merge/compact/cluster snapshots it returns the rewritten
    files (a superset of the changed rows — compare against the old snapshot
    for exact row-level CDC)."""
    import os
    base = {e.path for e in
            table.manifest_entries(table.snapshot(from_snapshot_id))}
    target = (table.current_snapshot() if to_snapshot_id is None
              else table.snapshot(to_snapshot_id))
    new_paths = [os.path.join(table.root, e.path)
                 for e in table.manifest_entries(target)
                 if e.path not in base]
    if not new_paths:
        return scan(spark, table, snapshot_id=target.snapshot_id).limit(0)
    return spark.read.parquet(*new_paths)


def scan_stats(table: Table, snapshot_id: int | None = None) -> dict:
    """Planning metrics: files/rows/bytes in a snapshot (driver-side, O(files))."""
    snap = (table.current_snapshot() if snapshot_id is None
            else table.snapshot(snapshot_id))
    entries = table.manifest_entries(snap)
    return {
        "files": len(entries),
        "rows": sum(e.record_count for e in entries),
        "bytes": sum(e.file_size_bytes for e in entries),
    }
