"""Sampling-free range layout: murmur3 parity, bucket routing, bounds."""

from pyspark.sql import functions as F

from engine.format import DataFile, Table
from engine.scan import scan
from engine.synth import conv_bounds, generate_transcripts
from engine.write import (_murmur3_32, append, bucket_expr, partition_reps,
                          range_bounds_from_entries, stage_dataframe)

from .conftest import sorted_rows


def test_murmur3_matches_spark_hash(spark):
    """The driver-side Murmur3 must equal F.hash on longs — partition
    representatives are solved against it."""
    vals = [0, 1, 7, 42, -1, -(2 ** 40), 123456789, 2 ** 62 + 3]
    rows = (spark.createDataFrame([(v,) for v in vals], "v long")
            .select("v", F.hash("v").alias("h")).collect())
    for r in rows:
        assert r["h"] == _murmur3_32(r["v"] & 0xFFFFFFFFFFFFFFFF), r


def test_partition_reps_cover_every_bucket(spark):
    for n in (1, 3, 16, 97):
        reps = partition_reps(n)
        got = (spark.createDataFrame([(r,) for r in reps], "r long")
               .select(F.pmod(F.hash("r"), F.lit(n)).alias("b")).collect())
        assert sorted(x["b"] for x in got) == list(range(n))


def test_bucket_expr_is_binary_search_count(spark):
    bounds = ["b", "d", "f"]
    rows = (spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",), ("f",), ("z",)], "k string")
        .select("k", bucket_expr(F.col("k"), bounds).alias("pid")).collect())
    got = {r["k"]: r["pid"] for r in rows}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 2, "f": 3, "z": 3}


def test_bounds_write_gives_disjoint_ranges_and_same_rows(spark, tmp_path):
    """The bounds path must produce the same table content as the sampling
    path, one file per bucket, with non-overlapping conv_id ranges."""
    df = generate_transcripts(spark, num_convs=60)
    t1 = Table.create(str(tmp_path / "sampled"))
    append(t1, df, num_files=6, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])
    t2 = Table.create(str(tmp_path / "bounded"))
    append(t2, df, num_files=6, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"], bounds=conv_bounds(60, 6))
    assert sorted_rows(scan(spark, t2)) == sorted_rows(scan(spark, t1))
    ents = t2.manifest_entries()
    assert len(ents) == 6
    rngs = sorted((e.stats["conv_id"]["min"], e.stats["conv_id"]["max"])
                  for e in ents)
    for i in range(len(rngs) - 1):
        assert rngs[i][1] <= rngs[i + 1][0]


def test_range_bounds_from_entries_balances_rows():
    ents = [DataFile(f"data/f{i}.parquet", record_count=100,
                     file_size_bytes=1000,
                     stats={"conv_id": {"min": f"c{i:03d}",
                                        "max": f"c{i:03d}z"}})
            for i in range(10)]
    bounds = range_bounds_from_entries(ents, 5, "conv_id")
    assert bounds == ["c002", "c004", "c006", "c008"]
    # missing stats → None (caller falls back to sampling)
    ents[3].stats = {}
    assert range_bounds_from_entries(ents, 5, "conv_id") is None


def test_bounds_layout_deterministic_across_parallelism(spark, tmp_path):
    """Byte-level file determinism: same bounds → same per-file row sets at
    different shuffle parallelism (repartitionByRange's sampler cannot
    guarantee this)."""
    df = generate_transcripts(spark, num_convs=40)
    bounds = conv_bounds(40, 4)

    def stats_of(root, parts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            t = Table.create(root)
            ents = stage_dataframe(t, df, num_files=4,
                                   range_cols=["conv_id", "turn_idx"],
                                   sort_cols=["conv_id", "turn_idx"],
                                   bounds=bounds)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        return sorted((e.record_count, e.stats["conv_id"]["min"],
                       e.stats["conv_id"]["max"]) for e in ents)

    a = stats_of(str(tmp_path / "a"), "3")
    b = stats_of(str(tmp_path / "b"), "13")
    assert a == b


def test_range_bounds_composite_splits_hot_conversation():
    """VERDICT r4 task #3 (unit): a single conversation bigger than the
    per-file row target gets COMPOSITE (conv, turn) boundaries interpolated
    from manifest turn stats; distinct-conv distributions still get the
    byte-identical conv-only boundaries."""
    # oversized single-conv file between two normal ones
    ents = [
        DataFile("data/a.parquet", 100, 1000,
                 {"conv_id": {"min": "c000", "max": "c000"},
                  "turn_idx": {"min": 0, "max": 99}}),
        DataFile("data/hot.parquet", 800, 8000,
                 {"conv_id": {"min": "c500", "max": "c500"},
                  "turn_idx": {"min": 0, "max": 799}}),
        DataFile("data/z.parquet", 100, 1000,
                 {"conv_id": {"min": "c900", "max": "c900"},
                  "turn_idx": {"min": 0, "max": 99}}),
    ]
    b = range_bounds_from_entries(ents, 5, "conv_id", turn_col="turn_idx")
    assert b == [("c500", 100), ("c500", 300), ("c500", 500), ("c500", 700)]
    # a run of same-conv files: cut at each file's turn start (no empty
    # leading partition, no conv-only boundary inside the run)
    run = [DataFile(f"data/h{i}.parquet", 300, 3000,
                    {"conv_id": {"min": "c500", "max": "c500"},
                     "turn_idx": {"min": i * 300, "max": i * 300 + 299}})
           for i in range(4)]
    assert range_bounds_from_entries(run, 4, "conv_id",
                                     turn_col="turn_idx") == \
        [("c500", 300), ("c500", 600), ("c500", 900)]
    # distinct convs: identical to the turn-free form
    ents2 = [DataFile(f"data/f{i}.parquet", record_count=100,
                      file_size_bytes=1000,
                      stats={"conv_id": {"min": f"c{i:03d}",
                                         "max": f"c{i:03d}z"},
                             "turn_idx": {"min": 0, "max": 99}})
             for i in range(10)]
    assert range_bounds_from_entries(ents2, 5, "conv_id",
                                     turn_col="turn_idx") == \
        range_bounds_from_entries(ents2, 5, "conv_id")


def test_bucket_expr_composite_routes_lexicographically(spark):
    """(conv, turn) boundaries partition rows exactly like a lexicographic
    binary search — row < (bc, bt) iff conv < bc or (conv == bc and
    turn < bt)."""
    bounds = [("c1", 50), ("c1", 100), ("c2", 0)]
    rows = [("c0", 999), ("c1", 0), ("c1", 49), ("c1", 50), ("c1", 99),
            ("c1", 100), ("c1", 500), ("c2", 0), ("c3", 1)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    got = {(r["conv_id"], r["turn_idx"]): r["pid"] for r in df.select(
        "conv_id", "turn_idx",
        bucket_expr([F.col("conv_id"), F.col("turn_idx")],
                    bounds).alias("pid")).collect()}
    import bisect
    for (c, t), pid in got.items():
        assert pid == bisect.bisect_right(bounds, (c, t)), ((c, t), pid)
