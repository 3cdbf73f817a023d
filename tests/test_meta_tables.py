"""Queryable metadata tables ($files/$snapshots/$history/$refs analog)."""

from pyspark.sql import functions as F

from engine.format import Table
from engine.merge import merge_into
from engine.meta_tables import (files_df, history_df, refs_df,
                                register_metadata_views, snapshots_df)
from engine.scan import scan, scan_stats
from engine.synth import generate_transcripts
from engine.write import append


def _setup(spark, root):
    df = generate_transcripts(spark, num_convs=30)
    t = Table.create(root)
    append(t, df, num_files=4, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    return t, df


def test_files_df_matches_manifest(spark, tmp_table_root):
    t, df = _setup(spark, tmp_table_root)
    src = (scan(spark, t).select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(3)
           .withColumn("upd_text", F.lit("e")))
    merge_into(spark, t, src, {"text": "upd_text"}, pass_id="mt-m",
               mode="mor")

    fdf = files_df(spark, t)
    got = {(r["path"], r["content"], r["record_count"],
            r["sequence_number"])
           for r in fdf.collect()}
    want = {(e.path, e.content, e.record_count, e.sequence_number)
            for e in t.manifest_entries(content="all")}
    assert got == want
    st = scan_stats(t)
    agg = fdf.filter("content = 'data'") \
             .agg(F.sum("record_count"), F.count("*")).first()
    assert (agg[0], agg[1]) == (st["rows"], st["files"])
    # stats ride along as JSON (usable for ad-hoc SQL over bounds)
    assert fdf.filter("stats_json like '%conv_id%'").count() == \
        fdf.count()


def test_snapshots_history_refs_views(spark, tmp_table_root):
    t, df = _setup(spark, tmp_table_root)
    s1 = t.current_snapshot().snapshot_id
    src = (scan(spark, t).select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(2)
           .withColumn("upd_text", F.lit("x")))
    merge_into(spark, t, src, {"text": "upd_text"}, pass_id="mt-2")
    s2 = t.current_snapshot().snapshot_id
    t.rollback_to(s1)
    t.create_tag("pin")
    t.create_branch("audit")

    sdf = snapshots_df(spark, t)
    assert sdf.count() == len(t.snapshots())
    assert sdf.filter(f"snapshot_id = {s2} and operation = 'merge'") \
              .first()["pass_id"] == "mt-2"

    hdf = history_df(spark, t)
    rows = {r["snapshot_id"]: r["is_current_ancestor"]
            for r in hdf.collect()}
    assert rows[s1] is True            # rollback target is an ancestor
    assert rows[s2] is False           # abandoned lineage flagged off
    assert rows[t.current_snapshot().snapshot_id] is True

    rdf = refs_df(spark, t)
    got = {(r["name"], r["type"], r["snapshot_id"]) for r in rdf.collect()}
    cur = t.current_snapshot().snapshot_id
    assert ("main", "branch", cur) in got
    assert ("pin", "tag", cur) in got
    assert ("audit", "branch", cur) in got

    register_metadata_views(spark, t, prefix="mt")
    n_small = spark.sql(
        "SELECT count(*) FROM mt_files WHERE file_size_bytes < 1048576 "
        "AND content = 'data'").first()[0]
    assert n_small == scan_stats(t)["files"]
    assert spark.sql("SELECT count(*) FROM mt_refs").first()[0] == 3
