"""CHECK constraints (Delta-style schema-level quality gates): every write
that stages a violating row raises ConstraintViolation and commits
nothing. Beyond-reference — the training-data lake's boundary enforcement
(role domains, text length caps, non-negative turn indexes)."""

import os

import pytest
from pyspark.sql import functions as F

from engine.format import ConstraintViolation, Table
from engine.merge import merge_into
from engine.scan import scan
from engine.synth import generate_transcripts
from engine.write import append, check_constraints

from .conftest import sorted_rows


def _setup(spark, root, convs=30):
    df = generate_transcripts(spark, num_convs=convs)
    t = Table.create(root)
    append(t, df, num_files=3, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    return t, df


def test_append_rejects_violating_batch_atomically(spark, tmp_table_root):
    t, df = _setup(spark, tmp_table_root)
    t.add_constraint("turn_nonneg", "turn_idx >= 0")
    t.add_constraint("text_cap", "length(text) < 100000")
    sid = t.current_snapshot().snapshot_id
    want = sorted_rows(scan(spark, t))

    bad = (generate_transcripts(spark, num_convs=3)
           .withColumn("conv_id", F.concat(F.lit("x-"), F.col("conv_id")))
           .withColumn("turn_idx",
                       F.when(F.col("turn_idx") == 2, F.lit(-5))
                        .otherwise(F.col("turn_idx"))))
    with pytest.raises(ConstraintViolation, match="turn_nonneg"):
        append(t, bad, num_files=1)
    # nothing committed, no staged litter
    assert t.current_snapshot().snapshot_id == sid
    assert sorted_rows(scan(spark, t)) == want
    live = {e.path for e in t.manifest_entries(content="all")}
    on_disk = {os.path.join("data", n) for n in os.listdir(t.data_dir)}
    assert on_disk == live

    # a clean batch still lands
    good = (generate_transcripts(spark, num_convs=2)
            .withColumn("conv_id", F.concat(F.lit("g-"), F.col("conv_id"))))
    append(t, good, num_files=1)
    assert scan(spark, t).count() == df.count() + good.count()


def test_merge_rejects_violating_update(spark, tmp_table_root):
    """A MoR merge whose update writes an out-of-domain role is rejected;
    the checkpoint is abandoned so the staged files sweep and a replay
    replans instead of no-opping."""
    from engine.maintain import sweep_orphans

    t, df = _setup(spark, tmp_table_root)
    t.add_constraint("role_domain",
                     "role in ('user','assistant','system','tool')")
    want = sorted_rows(scan(spark, t))
    src = (scan(spark, t).select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(2)
           .withColumn("upd_role", F.lit("invalid-role")))
    with pytest.raises(ConstraintViolation, match="role_domain"):
        merge_into(spark, t, src, {"role": "upd_role"}, pass_id="c-m",
                   mode="mor")
    assert sorted_rows(scan(spark, t)) == want
    sweep_orphans(spark, t, grace_seconds=0.0)
    # a corrected replay with the SAME pass_id succeeds (abandon tombstone)
    src2 = (scan(spark, t).select("conv_id", "turn_idx")
            .orderBy("conv_id", "turn_idx").limit(2)
            .withColumn("upd_role", F.lit("system")))
    merge_into(spark, t, src2, {"role": "upd_role"}, pass_id="c-m",
               mode="mor")
    assert scan(spark, t).filter("role = 'system'").count() >= 2


def test_streaming_and_branch_writes_enforce(spark, tmp_table_root):
    """Constraints gate streaming batches and audit-branch writes too —
    bad data cannot even reach the unpublished branch."""
    from engine.streaming import ingest_batch

    t, df = _setup(spark, tmp_table_root)
    t.add_constraint("turn_nonneg", "turn_idx >= 0")
    t.create_branch("audit")
    bad = (generate_transcripts(spark, num_convs=2)
           .withColumn("conv_id", F.concat(F.lit("b-"), F.col("conv_id")))
           .withColumn("turn_idx", F.col("turn_idx") - 100))
    with pytest.raises(ConstraintViolation):
        ingest_batch(spark, t, bad, batch_id=9, branch="audit")
    assert scan(spark, t, ref="audit").count() == df.count()

    # drop the constraint → the same batch lands
    t.drop_constraint("turn_nonneg")
    ingest_batch(spark, t, bad, batch_id=10, branch="audit")
    assert scan(spark, t, ref="audit").count() == df.count() + bad.count()


def test_check_constraints_audits_existing_data(spark, tmp_table_root):
    t, df = _setup(spark, tmp_table_root)
    # register AFTER the data exists; the audit reports what's in place
    t.add_constraint("role_domain",
                     "role in ('user','assistant','system','tool')")
    t.add_constraint("never_true", "turn_idx < 0")
    counts = check_constraints(spark, t)
    assert counts["role_domain"] == 0
    assert counts["never_true"] == df.count()
    with pytest.raises(ValueError):
        t.add_constraint("role_domain", "true")  # duplicate
    with pytest.raises(KeyError):
        t.drop_constraint("nope")


def test_cow_merge_does_not_retrovalidate_carried_rows(spark,
                                                       tmp_table_root):
    """Review fix (r5): a CoW rewrite carries unchanged legacy rows —
    a constraint added AFTER a violating row landed must not brick every
    merge touching its file (add_constraint documents no retro-
    validation). Only the rows the merge CHANGES are gated."""
    df = generate_transcripts(spark, num_convs=20)
    t = Table.create(tmp_table_root)
    legacy_bad = df.limit(1).withColumn("role", F.lit("weird-legacy"))
    rest = df.join(legacy_bad.select("conv_id", "turn_idx"),
                   ["conv_id", "turn_idx"], "left_anti")
    append(t, rest.unionByName(legacy_bad), num_files=2,
           range_cols=["conv_id", "turn_idx"])
    t.add_constraint("role_ok",
                     "role in ('user','assistant','system','tool')")
    assert check_constraints(spark, t)["role_ok"] == 1  # the audit sees it

    # a CoW merge updating OTHER rows succeeds despite the carried violator
    src = (scan(spark, t).filter("role != 'weird-legacy'")
           .select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(3)
           .withColumn("upd_text", F.lit("ok-edit")))
    merge_into(spark, t, src, {"text": "upd_text"}, pass_id="cr-ok",
               mode="cow")
    out = scan(spark, t)
    assert out.filter("text = 'ok-edit'").count() == 3
    assert out.filter("role = 'weird-legacy'").count() == 1  # untouched

    # but a merge that WRITES a violating value still trips
    bad = (scan(spark, t).select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(1)
           .withColumn("upd_role", F.lit("still-bad")))
    with pytest.raises(ConstraintViolation):
        merge_into(spark, t, bad, {"role": "upd_role"}, pass_id="cr-bad",
                   mode="cow")
