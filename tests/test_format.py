"""Table format: snapshots, atomic commit, isolation, expiry."""

import pytest

from engine.format import Table
from engine.scan import scan, scan_stats
from engine.synth import generate_transcripts
from engine.write import append

from .conftest import sorted_rows


def _make(spark, root, convs=30, files=4):
    df = generate_transcripts(spark, num_convs=convs)
    t = Table.create(root)
    append(t, df, num_files=files, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    return t, df


def test_create_append_read(spark, tmp_table_root):
    t, df = _make(spark, tmp_table_root)
    out = scan(spark, t)
    assert sorted_rows(out) == sorted_rows(df)
    st = scan_stats(t)
    assert st["files"] == 4 and st["rows"] == df.count()


def test_append_creates_new_snapshot(spark, tmp_table_root):
    t, df = _make(spark, tmp_table_root)
    s1 = t.current_snapshot()
    extra = generate_transcripts(spark, num_convs=5).limit(10)
    append(t, extra, num_files=1)
    s2 = t.current_snapshot()
    assert s2.snapshot_id == s1.snapshot_id + 1
    assert s2.parent_id == s1.snapshot_id
    # old snapshot still resolves to the old file set (snapshot isolation)
    assert scan(spark, t, snapshot_id=s1.snapshot_id).count() == df.count()
    assert scan(spark, t).count() == df.count() + 10


def test_manifest_stats_present(spark, tmp_table_root):
    t, _ = _make(spark, tmp_table_root)
    for e in t.manifest_entries():
        assert e.record_count > 0 and e.file_size_bytes > 0
        assert "conv_id" in e.stats and "min" in e.stats["conv_id"]
        assert "turn_idx" in e.stats
        assert e.stats["conv_id"]["min"] <= e.stats["conv_id"]["max"]


def test_range_partitioned_files_have_tight_bounds(spark, tmp_table_root):
    """repartitionByRange must give near-disjoint conv_id ranges per file —
    this is what makes manifest pruning effective."""
    t, _ = _make(spark, tmp_table_root, convs=40, files=8)
    spans = sorted((e.stats["conv_id"]["min"], e.stats["conv_id"]["max"])
                   for e in t.manifest_entries())
    overlaps = sum(1 for (a, b) in zip(spans, spans[1:]) if b[0] < a[1])
    assert overlaps == 0


def test_expire_snapshots_keeps_current(spark, tmp_table_root):
    t, _ = _make(spark, tmp_table_root)
    for _ in range(3):
        append(t, generate_transcripts(spark, num_convs=2).limit(5),
               num_files=1)
    all_ids = [s.snapshot_id for s in t.snapshots()]
    expired = t.expire_snapshots(keep_last=2)
    kept = [s.snapshot_id for s in t.snapshots()]
    assert t.current_snapshot().snapshot_id in kept
    assert len(kept) == 2 and set(expired) == set(all_ids) - set(kept)
    with pytest.raises(KeyError):
        t.snapshot(expired[0])


def test_commit_is_atomic_via_version_hint(spark, tmp_table_root):
    t, _ = _make(spark, tmp_table_root)
    v = t.current_version()
    meta = t.load_metadata(v)
    assert meta["current_snapshot_id"] == t.current_snapshot().snapshot_id
    # older metadata versions remain readable (time travel on metadata)
    assert t.load_metadata(v - 1)["version"] == v - 1


def test_truncate_upper_carries_past_max_chars():
    from engine.format import _MAX_BOUND_LEN, _truncate_upper
    long_tail = "a" * (_MAX_BOUND_LEN - 1)
    # last char at U+10FFFF: carry into the previous char
    v = long_tail + chr(0x10FFFF) + "suffix"
    out = _truncate_upper(v)
    assert out == "a" * (_MAX_BOUND_LEN - 2) + "b"
    assert out > v[:len(out)] or v.startswith(out[:-1])
    # bumping U+D7FF must skip the surrogate block
    v2 = "a" * (_MAX_BOUND_LEN - 1) + chr(0xD7FF) + "x"
    out2 = _truncate_upper(v2)
    assert out2[-1] == chr(0xE000) and out2 > v2[:_MAX_BOUND_LEN]
    # every char maxed → no representable upper bound
    v3 = chr(0x10FFFF) * (_MAX_BOUND_LEN + 1)
    assert _truncate_upper(v3) is None


def test_metadata_planning_stays_fast_at_100k_files():
    """Driver-side planning must be O(files) with small constants: at 10^12
    turns the metadata tree is ~100k files per manifest group, and planning
    happens on every pass. Budget: well under a second each."""
    import time

    from engine.format import DataFile
    from engine.maintain import plan_compaction
    from engine.scan import Predicate, prune_files
    from engine.write import range_bounds_from_entries

    entries = [DataFile(f"data/f{i:07d}.parquet", 100, 4000 + (i % 7) * 100,
                        {"conv_id": {"min": f"c{i:07d}",
                                     "max": f"c{i:07d}z"}})
               for i in range(100_000)]
    t0 = time.perf_counter()
    groups = plan_compaction(entries, target_bytes=1 << 20)
    t_compact = time.perf_counter() - t0
    assert groups and t_compact < 1.5, t_compact

    preds = [Predicate("conv_id", "in",
                       sorted(f"c{i:07d}x" for i in range(0, 100_000, 97)))]
    t0 = time.perf_counter()
    kept = prune_files(entries, preds)
    t_prune = time.perf_counter() - t0
    # bisect planning: O(files × log keys); ~1/97 of files survive
    assert 0 < len(kept) < 3000 and t_prune < 1.5, (len(kept), t_prune)

    t0 = time.perf_counter()
    bounds = range_bounds_from_entries(entries, 800, "conv_id")
    t_bounds = time.perf_counter() - t0
    assert len(bounds) == 799 and t_bounds < 1.5, t_bounds


def test_rollback_to_restores_state_and_is_cdc_visible(spark,
                                                       tmp_table_root):
    """Snapshot rollback: a bad delete is undone by a metadata-only commit;
    the restored state is byte-identical, the rollback surfaces as ordinary
    CDC (the un-done changes reversed), and the bad snapshot's files become
    sweepable after expiry."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from engine.maintain import expire_snapshots, sweep_orphans
    from engine.merge import delete_where, merge_into
    from engine.scan import Predicate, changes_between, scan
    from engine.synth import generate_transcripts
    from engine.write import append

    df = generate_transcripts(spark, num_convs=30)
    t = Table.create(tmp_table_root)
    append(t, df, num_files=4, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    good = t.current_snapshot().snapshot_id
    want = sorted(map(tuple, scan(spark, t).collect()))

    # the "bad" operation: a CoW delete of a third of the table
    delete_where(spark, t, [Predicate("turn_idx", "ge", 5)],
                 pass_id="rb-bad")
    bad = t.current_snapshot().snapshot_id
    assert scan(spark, t).count() < len(want)

    snap = t.rollback_to(good)
    assert snap.operation == "rollback"
    assert snap.summary["rolled_back_to"] == good
    assert sorted(map(tuple, scan(spark, t).collect())) == want
    # CDC: good → rollback is a no-op; bad → rollback re-inserts the rows
    assert changes_between(spark, t, good, snap.snapshot_id).count() == 0
    ch = changes_between(spark, t, bad, snap.snapshot_id)
    assert {r["_change"] for r in ch.select("_change").distinct().collect()} \
        == {"insert"}
    # rollback to the current snapshot is a no-op; unknown id raises
    assert t.rollback_to(snap.snapshot_id).snapshot_id == snap.snapshot_id
    with pytest.raises(KeyError):
        t.rollback_to(9999)

    # the table keeps working: a merge after rollback lands normally
    src = (scan(spark, t).select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(2)
           .withColumn("upd_text", F.lit("post-rb")))
    merge_into(spark, t, src, {"text": "upd_text"}, pass_id="rb-m",
               mode="mor")
    assert scan(spark, t).filter("text = 'post-rb'").count() == 2

    # expire the bad lineage → its survivor-copy files become orphans
    expire_snapshots(t, keep_last=2)
    removed = sweep_orphans(spark, t, grace_seconds=0.0)
    live = {e.path for e in t.manifest_entries(content="all")}
    on_disk = {os.path.join("data", n) for n in os.listdir(t.data_dir)}
    assert on_disk == live
    assert removed  # the bad delete's staged survivors were collected
