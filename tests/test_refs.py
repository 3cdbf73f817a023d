"""Branches, tags and the write-audit-publish workflow (beyond-reference
lakehouse completeness): ingest to an audit branch, quality-check it with
``scan(ref=...)``, publish with a metadata-only fast-forward. Tags pin a
reproducible input state (a training run's exact snapshot) against
expiry."""

import os

import pytest
from pyspark.sql import functions as F

from engine.format import CommitConflictError, Table
from engine.maintain import expire_snapshots, sweep_orphans
from engine.scan import scan
from engine.synth import generate_transcripts
from engine.write import append

from .conftest import sorted_rows


def _setup(spark, root, convs=30):
    df = generate_transcripts(spark, num_convs=convs)
    t = Table.create(root)
    append(t, df, num_files=3, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    return t, df


def test_write_audit_publish_roundtrip(spark, tmp_table_root):
    """The WAP happy path: branch commits are invisible on main until the
    audit passes and fast_forward publishes — then main is byte-identical
    to the audited state."""
    t, df = _setup(spark, tmp_table_root)
    main_before = sorted_rows(scan(spark, t))

    t.create_branch("audit")
    batch = (generate_transcripts(spark, num_convs=8)
             .withColumn("conv_id", F.concat(F.lit("b-"), F.col("conv_id"))))
    append(t, batch, num_files=1, branch="audit",
           summary={"wap_batch": 1})
    n_batch = batch.count()

    # main unchanged; the audit read sees the staged batch
    assert sorted_rows(scan(spark, t)) == main_before
    audited = scan(spark, t, ref="audit")
    assert audited.count() == len(main_before) + n_batch
    # the "audit": no nulls in the batch's required columns
    assert audited.filter("conv_id like 'b-%' and (role is null "
                          "or text is null)").count() == 0

    want = sorted_rows(audited)
    pub = t.fast_forward("audit")
    assert pub.snapshot_id == t.current_snapshot().snapshot_id
    assert sorted_rows(scan(spark, t)) == want
    t.drop_ref("audit")
    assert "audit" not in t.refs()


def test_fast_forward_rejects_diverged_main(spark, tmp_table_root):
    """Publishing is a TRUE fast-forward only: if main moved after the
    branch was cut, the publish conflicts instead of silently dropping
    main's commits."""
    t, df = _setup(spark, tmp_table_root)
    t.create_branch("audit")
    batch = (generate_transcripts(spark, num_convs=4)
             .withColumn("conv_id", F.concat(F.lit("b-"), F.col("conv_id"))))
    append(t, batch, num_files=1, branch="audit")
    # main moves independently
    other = (generate_transcripts(spark, num_convs=3)
             .withColumn("conv_id", F.concat(F.lit("m-"), F.col("conv_id"))))
    append(t, other, num_files=1)
    main_rows = sorted_rows(scan(spark, t))

    with pytest.raises(CommitConflictError):
        t.fast_forward("audit")
    assert sorted_rows(scan(spark, t)) == main_rows  # nothing moved


def test_branch_commit_requires_branch_ref(spark, tmp_table_root):
    t, df = _setup(spark, tmp_table_root)
    batch = generate_transcripts(spark, num_convs=2)
    with pytest.raises(KeyError):
        append(t, batch, num_files=1, branch="nope")
    t.create_tag("v1")
    with pytest.raises(KeyError):
        append(t, batch, num_files=1, branch="v1")  # tags are immutable
    with pytest.raises(ValueError):
        t.create_tag("v1")  # duplicate name


def test_tag_pins_snapshot_against_expiry(spark, tmp_table_root):
    """A tagged snapshot (and its files) survives keep_last=1 expiry +
    grace-0 sweep until the tag is dropped."""
    t, df = _setup(spark, tmp_table_root)
    tagged_sid = t.current_snapshot().snapshot_id
    t.create_tag("train-v1")
    tagged_rows = sorted_rows(scan(spark, t))

    # a full rewrite replaces every data file on main
    from engine.maintain import cluster
    cluster(spark, t, "zorder", target_bytes=1 << 30, pass_id="rf-cl")
    expire_snapshots(t, keep_last=1)
    sweep_orphans(spark, t, grace_seconds=0.0)

    # the tagged snapshot is still in the log and fully readable
    assert tagged_sid in {s.snapshot_id for s in t.snapshots()}
    assert sorted_rows(scan(spark, t, ref="train-v1")) == tagged_rows
    for e in t.manifest_entries(t.snapshot(tagged_sid)):
        assert os.path.exists(os.path.join(t.root, e.path))

    # dropping the tag releases it: expiry + sweep collect the old files
    t.drop_ref("train-v1")
    expire_snapshots(t, keep_last=1)
    sweep_orphans(spark, t, grace_seconds=0.0)
    assert tagged_sid not in {s.snapshot_id for s in t.snapshots()}
    live = {e.path for e in t.manifest_entries(content="all")}
    on_disk = {os.path.join("data", n) for n in os.listdir(t.data_dir)}
    assert on_disk == live


def test_branch_isolation_under_concurrent_main_maintenance(
        spark, tmp_table_root):
    """Maintenance on main (compaction) and a branch append interleave
    without clobbering each other: snapshot ids stay unique, both lineages
    stay readable, and the diverged branch simply cannot fast-forward."""
    from engine.maintain import compact

    t, df = _setup(spark, tmp_table_root)
    t.create_branch("audit")
    batch = (generate_transcripts(spark, num_convs=5)
             .withColumn("conv_id", F.concat(F.lit("b-"), F.col("conv_id"))))
    append(t, batch, num_files=2, branch="audit")
    compact(spark, t, target_bytes=1 << 30, pass_id="rf-cp")

    sids = [s.snapshot_id for s in t.snapshots()]
    assert len(sids) == len(set(sids))
    assert scan(spark, t, ref="audit").count() == df.count() + batch.count()
    assert scan(spark, t).count() == df.count()
    with pytest.raises(CommitConflictError):
        t.fast_forward("audit")


def test_streaming_wap_batches_compose_on_branch(spark, tmp_table_root):
    """Streaming write-audit-publish: micro-batches land on the audit
    branch and PLAN against the branch state — a batch editing keys that
    exist only on the branch must MERGE them there (branch-blind planning
    would misclassify them as inserts and duplicate the keys). Main stays
    frozen until fast_forward."""
    from engine.streaming import ingest_batch

    t, df = _setup(spark, tmp_table_root)
    main_rows = sorted_rows(scan(spark, t))
    t.create_branch("audit")

    b1 = (generate_transcripts(spark, num_convs=6)
          .withColumn("conv_id", F.concat(F.lit("s-"), F.col("conv_id"))))
    ingest_batch(spark, t, b1, batch_id=100, branch="audit")
    n_b1 = b1.count()

    # batch 2: edit two keys that exist ONLY on the branch + new convs
    edits = (b1.orderBy("conv_id", "turn_idx").limit(2)
             .withColumn("text", F.lit("branch-edit")))
    news = (generate_transcripts(spark, num_convs=3)
            .withColumn("conv_id", F.concat(F.lit("s2-"), F.col("conv_id"))))
    ingest_batch(spark, t, edits.unionByName(news), batch_id=101,
                 branch="audit")

    assert sorted_rows(scan(spark, t)) == main_rows  # main frozen
    audited = scan(spark, t, ref="audit")
    assert audited.count() == len(main_rows) + n_b1 + news.count()
    assert audited.filter("text = 'branch-edit'").count() == 2
    # no duplicated keys from branch-blind planning
    assert audited.groupBy("conv_id", "turn_idx").count() \
                  .filter("count > 1").count() == 0

    want = sorted_rows(audited)
    t.fast_forward("audit")
    assert sorted_rows(scan(spark, t)) == want


def test_delete_on_branch_audited_before_publish(spark, tmp_table_root):
    """WAP for a compliance purge: delete on the audit branch, verify the
    rows are gone there while main still serves them, then publish."""
    from engine.merge import delete_where
    from engine.scan import Predicate

    t, df = _setup(spark, tmp_table_root)
    total = df.count()
    conv = "conv-00000004"
    n_conv = df.filter(F.col("conv_id") == conv).count()
    t.create_branch("audit")

    snap = delete_where(spark, t, [Predicate("conv_id", "eq", conv)],
                        pass_id="rb-del", branch="audit")
    assert snap is not None and snap.summary["deleted_rows"] == n_conv
    assert scan(spark, t).count() == total                 # main serves all
    audited = scan(spark, t, ref="audit")
    assert audited.count() == total - n_conv
    assert audited.filter(F.col("conv_id") == conv).count() == 0

    t.fast_forward("audit")
    assert scan(spark, t).count() == total - n_conv


def test_fast_forward_survives_snapshot_expiry(spark, tmp_table_root):
    """Review fix (r5): expiry pins a branch's parent CHAIN down to main's
    lineage — routine expire_snapshots must not un-publish a clean branch
    by deleting its intermediate snapshots."""
    t, df = _setup(spark, tmp_table_root)
    t.create_branch("audit")
    for i in range(3):  # three branch commits → two intermediates
        b = (generate_transcripts(spark, num_convs=2)
             .withColumn("conv_id",
                         F.concat(F.lit(f"e{i}-"), F.col("conv_id"))))
        append(t, b, num_files=1, branch="audit")
    expire_snapshots(t, keep_last=1)
    want = sorted_rows(scan(spark, t, ref="audit"))
    pub = t.fast_forward("audit")  # must NOT conflict: main never moved
    assert pub.snapshot_id == t.current_snapshot().snapshot_id
    assert sorted_rows(scan(spark, t)) == want


def test_fast_forward_rejects_tag(spark, tmp_table_root):
    """Review fix (r5): tags are immutable pins, not publish sources."""
    t, df = _setup(spark, tmp_table_root)
    t.create_tag("pin")
    with pytest.raises(ValueError, match="not a branch"):
        t.fast_forward("pin")


def test_pin_walk_not_truncated_by_tag_on_intermediate(spark,
                                                       tmp_table_root):
    """Review fix (r5, round 2): a TAG pinned on an intermediate branch
    snapshot that iterates before the branch ref must not truncate the
    branch's pin walk — the rest of the chain stayed expirable and
    fast_forward broke forever."""
    t, df = _setup(spark, tmp_table_root)
    t.create_branch("audit")
    sids = []
    for i in range(3):
        b = (generate_transcripts(spark, num_convs=2)
             .withColumn("conv_id",
                         F.concat(F.lit(f"p{i}-"), F.col("conv_id"))))
        append(t, b, num_files=1, branch="audit")
        sids.append(t.refs()["audit"]["snapshot_id"])
    # tag the MIDDLE branch snapshot, then re-create the branch ref so the
    # tag iterates FIRST in refs order (dict preserves insertion order)
    head = sids[-1]
    t.create_tag("mid-pin", snapshot_id=sids[1])
    t.drop_ref("audit")
    t.create_branch("audit", from_snapshot_id=head)
    assert list(t.refs()) == ["mid-pin", "audit"]

    expire_snapshots(t, keep_last=1)
    want = sorted_rows(scan(spark, t, ref="audit"))
    pub = t.fast_forward("audit")  # must not conflict
    assert pub.snapshot_id == head
    assert sorted_rows(scan(spark, t)) == want


def test_time_travel_ignores_unpublished_branch_commits(spark,
                                                        tmp_table_root):
    """ADVICE r5 (high): ``scan(as_of_ms=now)`` on main must return main's
    current state even when a LATER unpublished branch commit exists in
    the snapshot log — time travel is restricted to the current snapshot's
    ancestor chain, so write-audit-publish isolation holds for as-of reads
    too. Branch state is readable only via explicit ref=/snapshot_id=."""
    import time as _time

    t, df = _setup(spark, tmp_table_root)
    main_rows = sorted_rows(scan(spark, t))
    t.create_branch("audit")
    b = (generate_transcripts(spark, num_convs=5)
         .withColumn("conv_id", F.concat(F.lit("b-"), F.col("conv_id"))))
    append(t, b, num_files=1, branch="audit")
    now_ms = int(_time.time() * 1000) + 1000
    assert sorted_rows(scan(spark, t, as_of_ms=now_ms)) == main_rows
    # the branch head stays reachable through its own addressing modes
    assert scan(spark, t, ref="audit").count() > len(main_rows)
    # after publish, the same as-of read sees the published state
    t.fast_forward("audit")
    assert len(sorted_rows(scan(spark, t, as_of_ms=int(
        _time.time() * 1000) + 1000))) > len(main_rows)


def test_expire_keep_last_counts_main_lineage(spark, tmp_table_root):
    """ADVICE r5: keep_last is a MAIN-LINEAGE window, not a raw log
    position window — a burst of branch commits must not expire main
    history (rollback targets) down to just the current snapshot."""
    t, df = _setup(spark, tmp_table_root)
    s1 = t.current_snapshot().snapshot_id
    append(t, generate_transcripts(spark, num_convs=3)
           .withColumn("conv_id", F.concat(F.lit("m2-"), F.col("conv_id"))),
           num_files=1)
    s2 = t.current_snapshot().snapshot_id
    t.create_branch("noise", from_snapshot_id=s2)
    for i in range(4):  # burst of branch commits interleaving the log
        append(t, generate_transcripts(spark, num_convs=2)
               .withColumn("conv_id",
                           F.concat(F.lit(f"n{i}-"), F.col("conv_id"))),
               num_files=1, branch="noise")
    # drop the ref: the burst's snapshots become unreachable garbage
    t.drop_ref("noise")
    expired = expire_snapshots(t, keep_last=2)
    kept = {s.snapshot_id for s in t.snapshots()}
    # both main-lineage snapshots survive the keep_last=2 window even
    # though 4 branch commits sit between them and the log tail ...
    assert {s1, s2} <= kept, (expired, kept)
    # ... and the unreachable branch snapshots are what actually expired
    assert len(expired) >= 3, expired
    # rollback to the older main snapshot still works
    t.rollback_to(s1)
    assert sorted_rows(scan(spark, t)) == sorted_rows(
        scan(spark, t, snapshot_id=s1))


def test_branch_rooted_at_null_snapshot(spark, tmp_table_root):
    """ADVICE r5: streaming WAP must be able to start on a FRESH table —
    a branch rooted at the null snapshot accepts commits (the first one
    creates the head) and publishes by fast-forward."""
    t = Table.create(tmp_table_root)
    t.create_branch("ingest")
    with pytest.raises(KeyError):
        t.ref_snapshot("ingest")      # no commits yet
    with pytest.raises(ValueError):
        t.fast_forward("ingest")      # nothing to publish yet
    df = generate_transcripts(spark, num_convs=10)
    append(t, df, num_files=2, branch="ingest")
    assert t.current_snapshot() is None      # main untouched
    want = sorted_rows(scan(spark, t, ref="ingest"))
    assert len(want) == df.count()
    pub = t.fast_forward("ingest")
    assert pub.snapshot_id == t.current_snapshot().snapshot_id
    assert sorted_rows(scan(spark, t)) == want


def test_branch_aware_maintenance_compacts_audit_branch(spark,
                                                        tmp_table_root):
    """Branch-aware maintenance (VERDICT r5 task #2): micro-batches onto a
    WAP audit branch fragment the branch into small files; compact(branch=)
    retires them ON THE BRANCH — branch scan byte-identical, main untouched
    — and fast_forward publishes the compacted layout, not the fragments."""
    from engine.maintain import compact, compact_deletes, rewrite_deletes
    from engine.merge import merge_into

    t, df = _setup(spark, tmp_table_root, convs=20)
    main_before = sorted_rows(scan(spark, t))
    main_snap = t.current_snapshot().snapshot_id
    t.create_branch("audit")
    for i in range(4):  # streaming micro-batches land as tiny files
        b = (generate_transcripts(spark, num_convs=3)
             .withColumn("conv_id",
                         F.concat(F.lit(f"mb{i}-"), F.col("conv_id"))))
        append(t, b, num_files=2, branch="audit")
    # a sparse MoR merge on the branch adds a delete-file backlog there
    src = (scan(spark, t, ref="audit").filter("conv_id like 'mb0-%'")
           .select("conv_id", "turn_idx").orderBy("conv_id", "turn_idx")
           .limit(3).withColumn("upd_text", F.lit("branch-edit")))
    merge_into(spark, t, src, {"text": "upd_text"}, pass_id="bmor",
               mode="mor", branch="audit")
    want = sorted_rows(scan(spark, t, ref="audit"),
                       cols=("conv_id", "turn_idx", "text"))
    files_before = len(t.manifest_entries(t.ref_snapshot("audit")))
    assert files_before >= 9

    # the branch cadence: fold deletes, retire the backlog, bin-pack
    compact_deletes(spark, t, pass_id="b-fold", branch="audit")
    rewrite_deletes(spark, t, target_bytes=1 << 30, pass_id="b-rwdel",
                    branch="audit")
    snap = compact(spark, t, target_bytes=1 << 30, pass_id="b-cmp",
                   branch="audit")
    assert snap is not None
    head = t.ref_snapshot("audit")
    assert len(t.manifest_entries(head)) < files_before
    assert not t.manifest_entries(head, content="deletes")
    # branch content is byte-identical through the maintenance
    assert sorted_rows(scan(spark, t, ref="audit"),
                       cols=("conv_id", "turn_idx", "text")) == want
    # main never moved and never saw the branch's files
    assert t.current_snapshot().snapshot_id == main_snap
    assert sorted_rows(scan(spark, t)) == main_before

    # publish: the compacted layout (not the fragments) reaches main
    pub = t.fast_forward("audit")
    assert pub.snapshot_id == head.snapshot_id
    assert sorted_rows(scan(spark, t),
                       cols=("conv_id", "turn_idx", "text")) == want


def test_null_rooted_branch_full_lifecycle(spark, tmp_table_root):
    """A branch rooted at the null snapshot (fresh-table streaming WAP)
    must work END-TO-END, not just for append: ingest_batch routes its
    first micro-batch to the append path, every maintenance pass and
    delete_where no-op instead of raising (and must NOT leak main's files
    onto the branch), and after commits land the branch behaves normally."""
    from engine.maintain import (cluster, compact, compact_deletes,
                                 rewrite_deletes)
    from engine.merge import delete_where
    from engine.scan import Predicate
    from engine.streaming import ingest_batch

    t = Table.create(tmp_table_root)
    # seed MAIN so a branch-head mixup would visibly leak main's files
    main_df = generate_transcripts(spark, num_convs=6)
    append(t, main_df, num_files=1)
    t.create_branch("ingest")  # rooted at the CURRENT snapshot
    t2 = Table.create(tmp_table_root + "-fresh")
    t2.create_branch("ingest")  # rooted at the NULL snapshot

    # maintenance + DML on the empty branch: no-ops, no KeyError, and
    # main untouched
    for fn in (lambda: compact(spark, t2, pass_id="nb-c", branch="ingest"),
               lambda: compact_deletes(spark, t2, pass_id="nb-cd",
                                       branch="ingest"),
               lambda: rewrite_deletes(spark, t2, pass_id="nb-rd",
                                       branch="ingest"),
               lambda: cluster(spark, t2, "zorder", pass_id="nb-cl",
                               branch="ingest"),
               lambda: delete_where(
                   spark, t2, [Predicate("conv_id", "eq", "x")],
                   pass_id="nb-dw", branch="ingest")):
        assert fn() is None
    assert t2.current_snapshot() is None

    # first streaming micro-batch onto the null-rooted branch: append path
    batch = generate_transcripts(spark, num_convs=3)
    ingest_batch(spark, t2, batch, batch_id=0, branch="ingest")
    assert t2.current_snapshot() is None  # main still empty (WAP)
    got = scan(spark, t2, ref="ingest")
    assert got.count() == batch.count()

    # second batch MERGEs/extends on the now-live branch head
    ingest_batch(spark, t2, batch, batch_id=1, branch="ingest")
    assert scan(spark, t2, ref="ingest").count() == batch.count()

    # publish: main gets exactly the branch content
    t2.fast_forward("ingest")
    assert sorted_rows(scan(spark, t2)) == sorted_rows(
        scan(spark, t2, ref="ingest"))
