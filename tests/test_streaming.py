"""Structured Streaming ingest → snapshot commits (engine.streaming)."""

import os

from engine.format import Table
from engine.scan import scan
from engine.streaming import start_ingest
from engine.synth import generate_transcripts

from .conftest import sorted_rows


def test_stream_ingest_files_to_table(spark, tmp_path):
    df = generate_transcripts(spark, num_convs=20)
    src = str(tmp_path / "drops")
    # two file drops, including an overlapping re-delivery of conv 0-9
    df.filter("conv_id < 'conv-00000010'").write.parquet(src + "/d1")
    df.filter("conv_id >= 'conv-00000010'").write.parquet(src + "/d2")
    # stream source reads a flat dir: move part files up
    import glob
    import shutil
    os.makedirs(src + "/all", exist_ok=True)
    for i, p in enumerate(glob.glob(src + "/d*/part-*.parquet")):
        shutil.copy(p, f"{src}/all/f{i:03d}.parquet")

    t = Table.create(str(tmp_path / "tbl"))
    q = start_ingest(spark, t, src + "/all", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = scan(spark, t)
    assert sorted_rows(out) == sorted_rows(df)


def test_stream_ingest_idempotent_redelivery(spark, tmp_path):
    df = generate_transcripts(spark, num_convs=8)
    src = str(tmp_path / "drops")
    os.makedirs(src, exist_ok=True)
    df.coalesce(1).write.parquet(src + "/w1")
    import glob
    import shutil
    os.makedirs(src + "/all", exist_ok=True)
    shutil.copy(glob.glob(src + "/w1/part-*.parquet")[0],
                src + "/all/f0.parquet")
    t = Table.create(str(tmp_path / "tbl"))
    q = start_ingest(spark, t, src + "/all", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    n1 = scan(spark, t).count()
    # re-deliver the same rows as a new file: keys exist → MERGE, no dupes
    shutil.copy(glob.glob(src + "/w1/part-*.parquet")[0],
                src + "/all/f1.parquet")
    q = start_ingest(spark, t, src + "/all", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = scan(spark, t)
    assert out.count() == n1
    assert sorted_rows(out) == sorted_rows(df)


def test_turn_rate_stream_watermarked_windows(spark, tmp_path):
    """Watermarked windowed aggregation over a real micro-batch stream:
    (a) streaming totals equal the exact batch answer for on-time data,
    (b) a row arriving later than the watermark past max(ts) is DROPPED
    from the streaming aggregate (state already reclaimed) while batch
    semantics would still count it."""
    from pyspark.sql import functions as F

    from engine.streaming import turn_rate_stream

    df = generate_transcripts(spark, num_convs=12)
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    df.coalesce(1).write.parquet(src + "/w1")
    import glob
    import shutil
    os.makedirs(src + "/all", exist_ok=True)
    shutil.copy(glob.glob(src + "/w1/part-*.parquet")[0],
                src + "/all/f0.parquet")

    from engine.streaming import TRANSCRIPT_DDL
    stream = (spark.readStream.schema(TRANSCRIPT_DDL)
              .option("maxFilesPerTrigger", "1").parquet(src + "/all"))
    agg = turn_rate_stream(stream, window_duration="1 hour",
                           watermark="1 hour")
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("turn_rate")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # late-data scenario with DETERMINISTIC batch separation: a checkpointed
    # query processes the on-time file, terminates (watermark persisted),
    # then resumes after a VERY late file lands — the restored watermark
    # must drop it from the aggregate
    src2 = str(tmp_path / "stream_src2")
    os.makedirs(src2 + "/all", exist_ok=True)
    shutil.copy(glob.glob(src + "/w1/part-*.parquet")[0],
                src2 + "/all/f0.parquet")
    stream2 = (spark.readStream.schema(TRANSCRIPT_DDL)
               .option("maxFilesPerTrigger", "1").parquet(src2 + "/all"))
    agg2 = turn_rate_stream(stream2, window_duration="1 hour",
                            watermark="1 hour")
    ckpt2 = str(tmp_path / "ckpt2")
    out2 = str(tmp_path / "rate2_out")
    q = (agg2.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt2)
         .format("parquet").option("path", out2)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    late = df.limit(5).withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 600 DAYS"))
    late.coalesce(1).write.parquet(src + "/w2")
    shutil.copy(glob.glob(src + "/w2/part-*.parquet")[0],
                src2 + "/all/f1.parquet")
    q = (agg2.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt2)
         .format("parquet").option("path", out2)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["window_start"], r["role"]): r["turns"]
           for r in spark.sql("select * from turn_rate").collect()}
    exact = {(r["window_start"], r["role"]): r["turns"]
             for r in turn_rate_stream(df, window_duration="1 hour",
                                       watermark="1 hour").collect()}
    # every emitted window matches the exact batch answer bit-for-bit
    assert got and all(exact[k] == v for k, v in got.items())
    # append mode withholds only the trailing watermark horizon: every
    # window that closed ≥ watermark before max(ts) must have been emitted
    import datetime
    max_ts = df.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(hours=2)  # window + watermark
    must_emit = {k for k in exact if k[0] < horizon}
    assert must_emit <= set(got)
    # the very-late file was DROPPED by the watermark: its ancient windows
    # never appear, even though batch semantics would count them
    got2 = spark.read.parquet(out2).collect()
    assert got2, "second stream emitted nothing"
    cutoff = max_ts - datetime.timedelta(days=365)
    assert all(r["window_start"] > cutoff for r in got2)


def test_ingest_large_conv_domain_never_collects_keys(spark, tmp_path,
                                                      monkeypatch):
    """A backlog-replay batch whose conversation domain exceeds the IN-set
    cap must route through range predicates (min/max agg) instead of
    materializing the key list on the driver — and still ingest correctly."""
    import engine.merge as m
    import engine.streaming as st
    from engine.streaming import ingest_batch

    seen: list = []
    real = m._source_predicates

    def spy(source, byte_cols=None):
        out = real(source, byte_cols)
        seen.append(out[0])
        return out

    monkeypatch.setattr(m, "_MAX_IN_SET", 5)
    monkeypatch.setattr(st, "_source_predicates", spy)

    df = generate_transcripts(spark, num_convs=20)  # 20 convs > cap of 5
    t = Table.create(str(tmp_path / "tbl"))
    half = df.filter("turn_idx % 2 = 0")
    ingest_batch(spark, t, half, batch_id=0)          # bootstrap append
    ingest_batch(spark, t, df, batch_id=1)            # update + insert split
    assert seen, "ingest did not derive predicates via _source_predicates"
    for preds in seen:
        assert all(p.op in ("ge", "le") for p in preds), \
            "expected range predicates above the IN-set cap"
    assert sorted_rows(scan(spark, t)) == sorted_rows(df)


def test_stream_sparse_late_edit_goes_merge_on_read(spark, tmp_path):
    """A streamed micro-batch of late EDITS to a few existing conversations
    (the 100 TB steady-state shape) must take the merge-on-read path: the
    MERGE commits insert+delete files, removes no data file, and an exact
    batch replay (same batch_id, e.g. a foreachBatch restart) is a no-op —
    idempotency survives the MoR strategy."""
    from pyspark.sql import functions as F

    from engine.scan import scan_stats
    from engine.streaming import ingest_batch
    from engine.write import append

    df = generate_transcripts(spark, num_convs=600)
    t = Table.create(str(tmp_path / "tbl"))
    append(t, df, num_files=2, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])

    edits = (generate_transcripts(spark, num_convs=2)
             .filter("conv_id <> 'conv-00000000'")  # skip the hot conv
             .withColumn("text", F.concat(F.lit("edited: "), F.col("text"))))
    n_edits = edits.count()
    ingest_batch(spark, t, edits, batch_id=77)
    snap = t.current_snapshot()
    assert snap.summary.get("mor") is True, snap.summary
    assert snap.summary["removed_files"] == 0
    assert scan_stats(t)["delete_rows"] == n_edits
    out = scan(spark, t)
    assert out.filter("text like 'edited: %'").count() == n_edits
    before = sorted_rows(out)

    # replay: merge_into's checkpoint makes the same pass_id a no-op and
    # the insert half re-splits to zero new keys
    ingest_batch(spark, t, edits, batch_id=77)
    assert sorted_rows(scan(spark, t)) == before


def test_cdc_tail_replays_into_follower_table(spark, tmp_path):
    """End-to-end CDC consumption (VERDICT r4 task #7, the Delta-CDF
    pattern a downstream training-data consumer runs): tail a source table
    across a mixed op sequence — append → MoR merge → compact — via
    ``changes_between`` per snapshot pair, replay each changeset into a
    FOLLOWER table (inserts → ingest, updates → MERGE), and assert the
    follower converges to the source scan after every step. The pure
    layout change (compact) must replay as an EMPTY changeset."""
    from pyspark.sql import functions as F

    from engine.format import Table
    from engine.maintain import compact
    from engine.merge import merge_into
    from engine.scan import changes_between, scan
    from engine.streaming import ingest_batch
    from engine.synth import generate_transcripts
    from engine.write import append

    src_t = Table.create(str(tmp_path / "cdc_src"))
    dst_t = Table.create(str(tmp_path / "cdc_dst"))

    def replay(frm, to):
        ch = changes_between(spark, src_t, frm, to).persist()
        n_del = ch.filter("_change = 'delete'").count()
        assert n_del == 0  # no op in this sequence removes rows
        ins = ch.filter("_change = 'insert'").drop("_change")
        upd = ch.filter("_change = 'update'").drop("_change")
        n_ins, n_upd = ins.count(), upd.count()
        if n_ins:
            append(dst_t, ins, num_files=1,
                   range_cols=["conv_id", "turn_idx"],
                   sort_cols=["conv_id", "turn_idx"])
        if n_upd:
            cols = [c for c in upd.columns
                    if c not in ("conv_id", "turn_idx")]
            usrc = upd.select("conv_id", "turn_idx",
                              *[F.col(c).alias(f"upd_{c}") for c in cols])
            merge_into(spark, dst_t, usrc,
                       {c: f"upd_{c}" for c in cols},
                       pass_id=f"replay-{frm}-{to}")
        ch.unpersist()
        return n_ins, n_upd

    def assert_converged():
        s = sorted(map(tuple, scan(spark, src_t).collect()))
        d = sorted(map(tuple, scan(spark, dst_t).collect()))
        assert s == d

    # 1. initial append (batch 0) + a follow-up insert batch
    b0 = generate_transcripts(spark, num_convs=25)
    ingest_batch(spark, src_t, b0, batch_id=0)
    s1 = src_t.current_snapshot().snapshot_id
    b1 = (generate_transcripts(spark, num_convs=6)
          .withColumn("conv_id", F.concat(F.lit("n-"), F.col("conv_id"))))
    ingest_batch(spark, src_t, b1, batch_id=1)
    s2 = src_t.current_snapshot().snapshot_id

    # bootstrap follower with the first snapshot, then tail s1→s2
    append(dst_t, scan(spark, src_t, snapshot_id=s1), num_files=2,
           range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    n_ins, _ = replay(s1, s2)
    assert n_ins == b1.count()
    assert_converged()

    # 2. sparse late edit → MoR merge snapshot
    upd = (scan(spark, src_t).select("conv_id", "turn_idx")
           .orderBy("conv_id", "turn_idx").limit(4)
           .withColumn("upd_text", F.lit("cdc-edit")))
    merge_into(spark, src_t, upd, {"text": "upd_text"},
               pass_id="cdc-mor", mode="mor")
    s3 = src_t.current_snapshot().snapshot_id
    n_ins, n_upd = replay(s2, s3)
    assert (n_ins, n_upd) == (0, 4)
    assert_converged()
    assert scan(spark, dst_t).filter("text = 'cdc-edit'").count() == 4

    # 3. compaction: a pure layout change tails as zero rows
    snap = compact(spark, src_t, target_bytes=1 << 30, pass_id="cdc-cp")
    assert snap is not None
    s4 = src_t.current_snapshot().snapshot_id
    n_ins, n_upd = replay(s3, s4)
    assert (n_ins, n_upd) == (0, 0)
    assert_converged()
