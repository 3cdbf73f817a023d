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
