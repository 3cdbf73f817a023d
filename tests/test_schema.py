"""Additive schema evolution (VERDICT r4 task #4): add_column is
metadata-only; old files are reconciled at scan (schema-merge read + typed
null fill, no stats → no pruning); MERGE and appends write the new column.
Reference anchor: ragged per-table headers tolerated by
``codes/classification/create_feats_labels.py:70-88``."""

import pytest
from pyspark.sql import functions as F

from engine.format import Table
from engine.merge import merge_into
from engine.scan import Predicate, scan
from engine.synth import generate_transcripts
from engine.write import append

from .conftest import sorted_rows


def _setup(spark, root, convs=40, files=4):
    df = generate_transcripts(spark, num_convs=convs)
    t = Table.create(root)
    append(t, df, num_files=files, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    return t, df


def test_add_column_is_metadata_only_and_scan_null_fills(spark,
                                                         tmp_table_root):
    t, df = _setup(spark, tmp_table_root)
    files_before = {e.path for e in t.manifest_entries(content="all")}
    sid_before = t.current_snapshot().snapshot_id

    t.add_column("quality", "double")

    # metadata-only: no data file touched, no snapshot committed
    assert {e.path for e in t.manifest_entries(content="all")} == files_before
    assert t.current_snapshot().snapshot_id == sid_before
    assert [a["name"] for a in t.schema_adds()] == ["quality"]

    out = scan(spark, t)
    assert "quality" in out.columns
    assert dict(out.dtypes)["quality"] == "double"
    assert out.filter("quality is not null").count() == 0
    assert out.count() == df.count()

    # duplicate and physically-existing names are rejected
    with pytest.raises(ValueError):
        t.add_column("quality", "string")
    with pytest.raises(ValueError):
        t.add_column("text", "string")


def test_merge_writes_added_column_old_and_new_unified(spark,
                                                       tmp_table_root):
    """append → add_column → MERGE writes the new column → scan shows old
    rows as nulls and merged rows valued, across both CoW and MoR."""
    t, df = _setup(spark, tmp_table_root)
    t.add_column("quality", "double")
    total = df.count()

    keys = (scan(spark, t).select("conv_id", "turn_idx")
            .orderBy("conv_id", "turn_idx").limit(5))
    src = keys.withColumn("upd_quality", F.lit(0.75))
    merge_into(spark, t, src, {"quality": "upd_quality"},
               pass_id="sq-mor", mode="mor")
    out = scan(spark, t)
    assert out.count() == total
    assert out.filter("quality = 0.75").count() == 5
    assert out.filter("quality is null").count() == total - 5

    # CoW over the mixed table (pre-add base files + post-add insert file)
    keys2 = (scan(spark, t).select("conv_id", "turn_idx")
             .orderBy(F.desc("conv_id"), F.desc("turn_idx")).limit(7))
    src2 = keys2.withColumn("upd_quality", F.lit(0.25))
    merge_into(spark, t, src2, {"quality": "upd_quality"},
               pass_id="sq-cow", mode="cow")
    out = scan(spark, t)
    assert out.count() == total
    assert out.filter("quality = 0.75").count() == 5
    assert out.filter("quality = 0.25").count() == 7


def test_compact_preserves_added_column_across_mixed_group(spark,
                                                           tmp_table_root):
    """A bin-pack group mixing pre-add and post-add files must keep the
    evolved column (schema-merging compaction read)."""
    from engine.maintain import compact

    t, df = _setup(spark, tmp_table_root, files=3)
    t.add_column("lang", "string")
    extra = (generate_transcripts(spark, num_convs=10)
             .withColumn("conv_id", F.concat(F.lit("zz-"), F.col("conv_id")))
             .withColumn("lang", F.lit("en")))
    append(t, extra, num_files=2)
    n_extra = extra.count()
    want = sorted_rows(scan(spark, t))

    snap = compact(spark, t, target_bytes=1 << 30, pass_id="sq-cp")
    assert snap is not None
    out = scan(spark, t)
    assert sorted_rows(out) == want
    assert out.filter("lang = 'en'").count() == n_extra
    assert out.filter("lang is null").count() == df.count()


def test_added_column_predicate_is_conservative_on_old_files(spark,
                                                             tmp_table_root):
    """Old files carry no stats for the added column → pruning keeps them
    (conservative), and a value predicate still evaluates row-level."""
    t, df = _setup(spark, tmp_table_root)
    t.add_column("quality", "double")
    src = (scan(spark, t).select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(3)
           .withColumn("upd_quality", F.lit(0.9)))
    merge_into(spark, t, src, {"quality": "upd_quality"},
               pass_id="sq-p", mode="mor")
    out = scan(spark, t, predicates=[Predicate("quality", "ge", 0.5)])
    assert out.filter("quality >= 0.5").count() == 3


def test_cdc_and_incremental_scan_after_evolution(spark, tmp_table_root):
    """changes_between across an add_column + MoR merge stays exact: both
    sides read through the reconciliation path, so the only diffs are the
    merged rows."""
    from engine.scan import changes_between, incremental_scan

    t, df = _setup(spark, tmp_table_root)
    s0 = t.current_snapshot().snapshot_id
    t.add_column("quality", "double")
    src = (scan(spark, t).select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(4)
           .withColumn("upd_quality", F.lit(1.0)))
    merge_into(spark, t, src, {"quality": "upd_quality"},
               pass_id="sq-cdc", mode="mor")
    ch = changes_between(spark, t, s0).collect()
    assert len(ch) == 4
    assert {r["_change"] for r in ch} == {"update"}
    assert all(r["quality"] == 1.0 for r in ch)
    inc = incremental_scan(spark, t, s0)
    assert "quality" in inc.columns
    assert inc.count() == 4


def test_add_column_rejects_statless_live_column_and_reserved(spark,
                                                              tmp_table_root):
    """ADVICE r5: a live physical column whose parquet footers carry no
    statistics (e.g. all-null) is invisible to the manifest-stats 'taken'
    check — add_column must still reject it (one representative footer
    read closes the gap). Engine-internal __-prefixed names are reserved."""
    import pytest
    from pyspark.sql import functions as F

    df = (generate_transcripts(spark, num_convs=5)
          .withColumn("ghost", F.lit(None).cast("string")))
    t = Table.create(tmp_table_root)
    append(t, df, num_files=1)
    # 'ghost' is all-null: parquet writes no min/max for it, so manifest
    # stats alone cannot see it — the footer check must
    assert "ghost" not in {k for e in t.manifest_entries()
                           for k in e.stats if "min" in e.stats[k]}
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("ghost", "double")
    with pytest.raises(ValueError, match="reserved"):
        t.add_column("__internal", "string")
