"""Concurrent committers must compose, not lose each other's snapshots."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from engine.format import Table
from engine.scan import scan
from engine.synth import generate_transcripts
from engine.write import append


def test_concurrent_appends_all_land(spark, tmp_table_root):
    df = generate_transcripts(spark, num_convs=12)
    t = Table.create(tmp_table_root)
    slices = [df.filter(f"pmod(xxhash64(conv_id), 4) = {i}").cache()
              for i in range(4)]
    counts = [s.count() for s in slices]

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(lambda s: append(t, s, num_files=1), slices))

    out = scan(spark, t)
    assert out.count() == sum(counts)
    # every commit produced its own snapshot, linearized
    sids = [s.snapshot_id for s in t.snapshots()]
    assert sids == [1, 2, 3, 4]
    parents = [s.parent_id for s in t.snapshots()]
    assert parents == [None, 1, 2, 3]
    for s in slices:
        s.unpersist()


def test_stale_lock_is_broken(tmp_table_root):
    import os
    t = Table.create(tmp_table_root)
    lock = os.path.join(t.meta_dir, "commit.lock")
    with open(lock, "w") as f:
        f.write("99999")
    # backdate it beyond the stale window
    os.utime(lock, (1, 1))
    got = t._acquire_commit_lock(timeout_s=5.0, stale_s=60.0)
    assert os.path.exists(got)
    os.unlink(got)


def test_concurrent_append_vs_metadata_mutators(spark, tmp_table_root):
    """rewrite_manifests and expire_snapshots read-modify-write table
    metadata: without the commit lock, an append landing between their load
    and write would silently vanish from the snapshot log (and its files be
    swept as orphans). Hammer them concurrently and assert nothing is lost."""
    from engine.maintain import expire_snapshots, rewrite_manifests

    df = generate_transcripts(spark, num_convs=16)
    t = Table.create(tmp_table_root)
    append(t, df.filter("pmod(xxhash64(conv_id), 5) = 4").cache(),
           num_files=1)
    slices = [df.filter(f"pmod(xxhash64(conv_id), 5) = {i}").cache()
              for i in range(4)]
    total = sum(s.count() for s in slices) + scan(spark, t).count()

    def mutate(_):
        rewrite_manifests(t, entries_per_manifest=2)
        expire_snapshots(t, keep_last=3)

    with ThreadPoolExecutor(max_workers=8) as ex:
        futs = [ex.submit(append, t, s, num_files=1) for s in slices]
        futs += [ex.submit(mutate, i) for i in range(3)]
        for f in futs:
            f.result()

    out = scan(spark, t)
    assert out.count() == total
    import os
    for e in t.manifest_entries():
        assert os.path.exists(os.path.join(t.root, e.path))
    for s in slices:
        s.unpersist()


def test_merge_loses_race_to_compaction_cleanly(spark, tmp_table_root,
                                                monkeypatch):
    """A merge and a compaction racing over the SAME data files (VERDICT r3
    task #8): the compaction commits first (simulated deterministically by
    running it inside the merge's staging step, i.e. after the merge planned
    its inputs but before its commit); the merge must then detect that its
    input files were replaced and raise CommitConflictError WITHOUT
    committing — committing would resurrect the compacted-away files' rows
    through the merge's staged copies (duplicate rows on scan). The loser's
    staged files become sweepable orphans, and a re-planned merge against
    the fresh snapshot succeeds."""
    import pytest

    import engine.merge as merge_mod
    from engine.format import CommitConflictError
    from engine.maintain import compact, sweep_orphans
    from engine.merge import merge_into
    from engine.synth import generate_transcripts

    df = generate_transcripts(spark, num_convs=30)
    t = Table.create(tmp_table_root)
    append(t, df, num_files=6, range_cols=["conv_id", "turn_idx"])
    before = sorted([tuple(r) for r in scan(spark, t)
                     .orderBy("conv_id", "turn_idx").collect()])

    src = (scan(spark, t).select("conv_id", "turn_idx")
           .limit(50).withColumn("upd_role", F.lit("merged")))

    real_stage = merge_mod.stage_dataframe
    fired = []

    def stage_then_lose_race(table, sdf, *a, **kw):
        staged = real_stage(table, sdf, *a, **kw)
        if not fired:  # only hijack the merge's own staging call
            fired.append(True)
            # compaction wins the race while the merge is still staging
            compact(spark, t, target_bytes=1 << 30,
                    pass_id="race-compact")
        return staged

    monkeypatch.setattr(merge_mod, "stage_dataframe", stage_then_lose_race)
    with pytest.raises(CommitConflictError):
        merge_into(spark, t, src, {"role": "upd_role"},
                   pass_id="race-merge")
    monkeypatch.setattr(merge_mod, "stage_dataframe", real_stage)

    # the winner's state is intact: same rows, no duplicates, no 'merged'
    after = sorted([tuple(r) for r in scan(spark, t)
                    .orderBy("conv_id", "turn_idx").collect()])
    assert after == before
    assert scan(spark, t).filter("role = 'merged'").count() == 0

    # the loser's staged files are NOT protected (ckpt.abandon): a grace-0
    # sweep removes them; after expiring pre-race snapshots, only the
    # winner's manifest-referenced files remain on disk
    removed = sweep_orphans(spark, t, grace_seconds=0.0)
    assert removed, "abandoned merge staging should be sweepable"
    from engine.maintain import expire_snapshots
    expire_snapshots(t, keep_last=1)
    sweep_orphans(spark, t, grace_seconds=0.0)
    import os
    live = {e.path for e in t.manifest_entries()}
    on_disk = {os.path.join("data", n) for n in os.listdir(t.data_dir)}
    assert on_disk == live

    # a replayed merge with the SAME pass_id REPLANS after the abandon
    # (the __abort__ tombstone invalidates the dead attempt) and succeeds
    # against the fresh snapshot — a streaming batch that lost a race must
    # re-merge on restart, never silently no-op and drop its updates. The
    # source must be re-derived from the fresh snapshot (the old src frame
    # pins swept files: the stale-source hazard the conflict surfaces).
    src2 = (scan(spark, t).select("conv_id", "turn_idx")
            .limit(50).withColumn("upd_role", F.lit("merged")))
    snap = merge_into(spark, t, src2, {"role": "upd_role"},
                      pass_id="race-merge")
    assert snap.operation == "merge"
    assert scan(spark, t).filter("role = 'merged'").count() == 50


def test_compact_replans_after_losing_race(spark, tmp_table_root,
                                           monkeypatch):
    """The mirror race: a clustering rewrite commits while a compaction is
    staging. The compaction must abandon its stale plan and RETRY against
    the fresh snapshot (its plan is manifest-derived, so replanning is safe)
    — never resurrect replaced files."""
    import engine.maintain as maint_mod
    from engine.maintain import cluster, compact
    from engine.synth import generate_transcripts

    df = generate_transcripts(spark, num_convs=30)
    t = Table.create(tmp_table_root)
    append(t, df, num_files=8, range_cols=["conv_id", "turn_idx"])
    before = sorted([tuple(r) for r in scan(spark, t)
                     .orderBy("conv_id", "turn_idx").collect()])

    real_stage = maint_mod.stage_dataframe
    fired = []

    def stage_then_lose_race(table, sdf, *a, **kw):
        staged = real_stage(table, sdf, *a, **kw)
        if not fired:
            fired.append(True)
            monkeypatch.setattr(maint_mod, "stage_dataframe", real_stage)
            cluster(spark, t, "zorder", target_bytes=1 << 20,
                    pass_id="race-cluster")
        return staged

    monkeypatch.setattr(maint_mod, "stage_dataframe", stage_then_lose_race)
    snap = compact(spark, t, target_bytes=1 << 30, pass_id="race-compact")
    # the retry replanned over the clustered snapshot: either it compacted
    # the fresh files (snapshot) or found nothing to do (None) — both clean
    assert snap is None or snap.operation == "compact"

    after = sorted([tuple(r) for r in scan(spark, t)
                    .orderBy("conv_id", "turn_idx").collect()])
    assert after == before
