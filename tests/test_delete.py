"""Row-level DELETE (``delete_where``) — the compliance/contamination
purge a training-data lake runs. Three-tier plan: metadata-only whole-file
drops where stats prove every row matches, merge-on-read delete files for
sparse residue, copy-on-write rewrite for dense residue. Beyond-reference
capability (the reference's lake is an immutable CSV dump)."""

import pytest
from pyspark.sql import functions as F

from engine.format import Table
from engine.merge import delete_where, merge_into
from engine.scan import Predicate, changes_between, scan, scan_stats
from engine.synth import generate_transcripts
from engine.write import append

from .conftest import sorted_rows


def _setup(spark, root, convs=60, files=6):
    df = generate_transcripts(spark, num_convs=convs)
    t = Table.create(root)
    append(t, df, num_files=files, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    return t, df


def test_sparse_delete_goes_merge_on_read(spark, tmp_table_root):
    """A few dying rows spread across files: ONE equality-delete file, no
    data file touched, O(dying rows) bytes committed."""
    t, df = _setup(spark, tmp_table_root)
    total = df.count()
    files_before = {e.path for e in t.manifest_entries()}

    snap = delete_where(spark, t,
                        [Predicate("conv_id", "eq", "conv-00000003"),
                         Predicate("turn_idx", "le", 2)],
                        pass_id="d-mor", mode="mor")
    assert snap is not None and snap.operation == "delete"
    assert snap.summary.get("mor") is True
    n_dead = snap.summary["deleted_rows"]
    assert 0 < n_dead <= 3
    assert {e.path for e in t.manifest_entries()} == files_before
    assert scan_stats(t)["delete_files"] == 1
    out = scan(spark, t)
    assert out.count() == total - n_dead
    assert out.filter("conv_id = 'conv-00000003' and turn_idx <= 2") \
              .count() == 0
    # replay with the same pass_id no-ops
    again = delete_where(spark, t,
                         [Predicate("conv_id", "eq", "conv-00000003"),
                          Predicate("turn_idx", "le", 2)],
                         pass_id="d-mor", mode="mor")
    assert again.snapshot_id == t.current_snapshot().snapshot_id
    assert scan(spark, t).count() == total - n_dead


def test_dense_delete_goes_copy_on_write(spark, tmp_table_root):
    """A predicate matching a large fraction rewrites the affected files
    (survivor copy), commits no delete file."""
    t, df = _setup(spark, tmp_table_root)
    total = df.count()
    dying = df.filter("turn_idx >= 3").count()

    snap = delete_where(spark, t, [Predicate("turn_idx", "ge", 3)],
                        pass_id="d-cow")
    assert snap is not None and snap.summary.get("mor") is None
    assert snap.summary["deleted_rows"] == dying
    assert "delete_files" not in scan_stats(t)
    out = scan(spark, t)
    assert out.count() == total - dying
    assert out.filter("turn_idx >= 3").count() == 0


def test_whole_file_drop_is_metadata_only(spark, tmp_table_root):
    """Single-conversation files under conv_id = X: dropped from the
    manifest without writing anything (no added files, no delete file)."""
    df = generate_transcripts(spark, num_convs=20)
    t = Table.create(tmp_table_root)
    victim = df.filter("conv_id = 'conv-00000007'")
    rest = df.filter("conv_id != 'conv-00000007'")
    append(t, rest, num_files=2, range_cols=["conv_id", "turn_idx"])
    append(t, victim, num_files=1)
    n_victim, n_rest = victim.count(), rest.count()

    snap = delete_where(spark, t,
                        [Predicate("conv_id", "eq", "conv-00000007")],
                        pass_id="d-full")
    assert snap is not None
    assert snap.summary["added_files"] == 0       # nothing written
    assert snap.summary["removed_files"] == 1     # the victim file dropped
    assert snap.summary["deleted_rows"] == n_victim
    assert "delete_files" not in scan_stats(t)
    out = scan(spark, t)
    assert out.count() == n_rest
    assert out.filter("conv_id = 'conv-00000007'").count() == 0


def test_delete_no_match_is_noop(spark, tmp_table_root):
    t, df = _setup(spark, tmp_table_root)
    sid = t.current_snapshot().snapshot_id
    assert delete_where(spark, t,
                        [Predicate("conv_id", "eq", "conv-zz-nope")],
                        pass_id="d-none") is None
    assert t.current_snapshot().snapshot_id == sid
    with pytest.raises(ValueError):
        delete_where(spark, t, [])


def test_delete_composes_with_mor_merge_history(spark, tmp_table_root):
    """Edit a key via MoR merge, then delete its conversation: BOTH the
    old and the edited version die; the maintenance cadence then retires
    the whole backlog cleanly."""
    from engine.maintain import compact_deletes, rewrite_deletes

    t, df = _setup(spark, tmp_table_root)
    total = df.count()
    conv = "conv-00000005"
    n_conv = df.filter(F.col("conv_id") == conv).count()
    upd = (scan(spark, t).filter(F.col("conv_id") == conv)
           .select("conv_id", "turn_idx").orderBy("turn_idx").limit(2)
           .withColumn("upd_text", F.lit("edited")))
    merge_into(spark, t, upd, {"text": "upd_text"}, pass_id="d-edit",
               mode="mor")

    delete_where(spark, t, [Predicate("conv_id", "eq", conv)],
                 pass_id="d-conv", mode="mor")
    out = scan(spark, t)
    assert out.count() == total - n_conv
    assert out.filter(F.col("conv_id") == conv).count() == 0
    assert out.filter("text = 'edited'").count() == 0

    compact_deletes(spark, t, pass_id="d-fold")
    want = sorted_rows(scan(spark, t))
    rewrite_deletes(spark, t, pass_id="d-rwd")
    assert "delete_files" not in scan_stats(t)
    assert sorted_rows(scan(spark, t)) == want


def test_delete_surfaces_as_cdc_deletes(spark, tmp_table_root):
    """changes_between across a delete snapshot yields _change='delete'
    rows with null payload for exactly the dying keys."""
    t, df = _setup(spark, tmp_table_root)
    s0 = t.current_snapshot().snapshot_id
    snap = delete_where(spark, t,
                        [Predicate("conv_id", "eq", "conv-00000002"),
                         Predicate("turn_idx", "le", 1)],
                        pass_id="d-cdc", mode="mor")
    ch = changes_between(spark, t, s0, snap.snapshot_id).collect()
    assert len(ch) == snap.summary["deleted_rows"] > 0
    assert {r["_change"] for r in ch} == {"delete"}
    assert all(r["conv_id"] == "conv-00000002" and r["turn_idx"] <= 1
               for r in ch)
    assert all(r["text"] is None for r in ch)


def test_compact_folds_delete_where_backlog(spark, tmp_table_root):
    """Bin-pack compaction after a MoR delete applies the tombstones to
    the rewritten groups — the dying rows never resurrect."""
    from engine.maintain import compact

    t, df = _setup(spark, tmp_table_root, files=8)
    snap = delete_where(spark, t,
                        [Predicate("conv_id", "eq", "conv-00000001"),
                         Predicate("turn_idx", "le", 3)],
                        pass_id="d-cp", mode="mor")
    assert snap.summary.get("mor") is True
    want = sorted_rows(scan(spark, t))
    assert compact(spark, t, target_bytes=1 << 30, pass_id="d-cpc")
    assert sorted_rows(scan(spark, t)) == want
