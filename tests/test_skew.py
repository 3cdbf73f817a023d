"""Skew handling: hot-key detection, salted aggregation correctness."""

from pyspark.sql import functions as F

from engine.skew import hot_keys, salted_collect, salted_count
from engine.synth import generate_transcripts


def test_hot_keys_finds_hot_conversations(spark):
    df = generate_transcripts(spark, num_convs=150)  # convs 0 and 97 are hot
    hot = {r["conv_id"] for r in hot_keys(df).collect()}
    assert "conv-00000000" in hot and "conv-00000097" in hot
    assert len(hot) <= 4


def test_salted_count_matches_plain_count(spark):
    df = generate_transcripts(spark, num_convs=120)
    plain = {r["conv_id"]: r["cnt"] for r in
             df.groupBy("conv_id").agg(F.count("*").alias("cnt")).collect()}
    salted = {r["conv_id"]: r["turns"] for r in
              salted_count(df, buckets=8).collect()}
    assert salted == plain


def test_salted_collect_matches_plain_collect(spark):
    df = generate_transcripts(spark, num_convs=40)
    got = {r["conv_id"]: sorted(r["items"]) for r in
           salted_collect(df, "conv_id", F.col("turn_idx"),
                          buckets=4).collect()}
    want = {r["conv_id"]: sorted(r["items"]) for r in
            df.groupBy("conv_id")
            .agg(F.collect_list("turn_idx").alias("items")).collect()}
    assert got == want
