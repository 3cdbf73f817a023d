"""Queryable metadata tables (Iceberg's ``table$files`` / ``$snapshots`` /
``$history`` / ``$refs`` analog): the table's own metadata exposed as
DataFrames, so operators answer "how many small files?", "what did the
last compaction remove?", "which snapshot does the prod tag pin?" with
plain Spark SQL instead of spelunking JSON.

The reference has no catalog at all (its lake is a bare CSV directory,
``cesid_datalake_imputation/readme.md:39-46``); these views are pure
beyond-reference lakehouse completeness.

Scale shape: ``files_df`` reads the snapshot's manifest JSONs WITH SPARK
(`spark.read.json` over the manifest list + one explode — the same
distributed pattern as the orphan sweep), so a 100 TB table's ~100k-entry
file listing never collects on the driver. The snapshot/history/ref views
are O(snapshot-log) metadata and build driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .format import Table


def files_df(spark: SparkSession, table: Table,
             snapshot_id: int | None = None) -> DataFrame:
    """One row per data/delete file in a snapshot: path, content,
    record_count, file_size_bytes, sequence_number, and the per-column
    min/max/null_count stats as a JSON string (schema-stable regardless of
    which columns carry stats)."""
    snap = (table.current_snapshot() if snapshot_id is None
            else table.snapshot(snapshot_id))
    if snap is None or not snap.manifests:
        raise ValueError("table has no snapshot; append data first")
    paths = [os.path.join(table.meta_dir, mf) for mf in snap.manifests]
    entries = (spark.read.option("multiLine", True).json(paths)
               .select(F.explode("entries").alias("e")))
    # DataFile.to_json omits default-valued fields ('content' for data
    # files, 'sequence_number' 0), so the inferred struct may lack them
    # entirely — substitute the defaults when absent
    present = set(entries.schema["e"].dataType.names)

    def opt(field: str) -> F.Column:
        return (F.col(f"e.{field}") if field in present
                else F.lit(None).cast("string"))
    return entries.select(
        F.col("e.path").alias("path"),
        F.coalesce(opt("content"), F.lit("data")).alias("content"),
        F.col("e.record_count").alias("record_count"),
        F.col("e.file_size_bytes").alias("file_size_bytes"),
        F.coalesce(opt("sequence_number").cast("long"), F.lit(0))
         .alias("sequence_number"),
        F.to_json(F.col("e.stats")).alias("stats_json"))


def snapshots_df(spark: SparkSession, table: Table) -> DataFrame:
    """One row per retained snapshot: id, parent, commit time, operation,
    and the commit summary counters."""
    rows = [(s.snapshot_id, s.parent_id, s.timestamp_ms, s.operation,
             int(s.summary.get("added_files", 0)),
             int(s.summary.get("removed_files", 0)),
             int(s.summary.get("added_rows", 0)),
             int(s.summary.get("added_bytes", 0)),
             s.summary.get("pass_id"))
            for s in table.snapshots()]
    return spark.createDataFrame(
        rows, "snapshot_id long, parent_id long, committed_at_ms long, "
              "operation string, added_files long, removed_files long, "
              "added_rows long, added_bytes long, pass_id string")


def history_df(spark: SparkSession, table: Table) -> DataFrame:
    """The main-branch lineage, latest first: which retained snapshots are
    ancestors of the CURRENT snapshot (``is_current_ancestor`` mirrors
    Iceberg's history table — a rollback leaves the abandoned lineage in
    the log with the flag false)."""
    snaps = {s.snapshot_id: s for s in table.snapshots()}
    cur = table.current_snapshot()
    ancestors: set[int] = set()
    node = cur.snapshot_id if cur else None
    while node is not None and node in snaps and node not in ancestors:
        ancestors.add(node)
        node = snaps[node].parent_id
    rows = [(s.timestamp_ms, s.snapshot_id, s.parent_id,
             s.snapshot_id in ancestors)
            for s in sorted(snaps.values(), key=lambda s: -s.snapshot_id)]
    return spark.createDataFrame(
        rows, "made_current_at_ms long, snapshot_id long, parent_id long, "
              "is_current_ancestor boolean")


def refs_df(spark: SparkSession, table: Table) -> DataFrame:
    """One row per named ref (branch/tag) plus the implicit main branch."""
    cur = table.current_snapshot()
    rows = [("main", "branch", cur.snapshot_id if cur else None)]
    rows += [(name, r["type"], r["snapshot_id"])
             for name, r in sorted(table.refs().items())]
    return spark.createDataFrame(
        rows, "name string, type string, snapshot_id long")


def register_metadata_views(spark: SparkSession, table: Table,
                            prefix: str = "tbl") -> None:
    """Register the four views as ``{prefix}_files`` / ``_snapshots`` /
    ``_history`` / ``_refs`` temp views for plain ``spark.sql`` use."""
    files_df(spark, table).createOrReplaceTempView(f"{prefix}_files")
    snapshots_df(spark, table).createOrReplaceTempView(f"{prefix}_snapshots")
    history_df(spark, table).createOrReplaceTempView(f"{prefix}_history")
    refs_df(spark, table).createOrReplaceTempView(f"{prefix}_refs")
