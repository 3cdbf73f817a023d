"""Concurrent committers must compose, not lose each other's snapshots."""

from concurrent.futures import ThreadPoolExecutor

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
