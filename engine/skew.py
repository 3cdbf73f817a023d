"""Explicit skew handling: hot-key detection + salted two-phase aggregation.

The reference's only skew mitigations are row caps (pre-filter >10k-row tables,
``codes/search/retrieve_relevant_values.py:197-198``; cap 50 candidate tables,
``codes/estimation/row_acquisitor.py:882-886``). Those change results. Ours
don't: hot ``conv_id``s (a ~1% tail with 40-100× the median turn count in real
transcript lakes — FIXTURES.md §1) are salted so one conversation's turns fan
out over S reducers, then a cheap second phase merges the S partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str = "conv_id",
             threshold_factor: float = 8.0) -> DataFrame:
    """Keys whose row count exceeds ``threshold_factor`` × the mean.

    Driver cost is O(distinct hot keys) — tiny — and the frame is meant to be
    broadcast. (Computing the mean first is one extra narrow agg.)"""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("__cnt"))
    mean_cnt = counts.agg(F.avg("__cnt").alias("m"))
    return (counts.crossJoin(F.broadcast(mean_cnt))
            .filter(F.col("__cnt") > F.col("m") * threshold_factor)
            .select(key, F.col("__cnt").alias("hot_count")))


def salt_column(df: DataFrame, key: str = "conv_id", buckets: int = 16,
                salt_col: str = "__salt",
                hot: DataFrame | None = None) -> DataFrame:
    """Add a salt in [0, buckets) for hot keys, 0 for the rest.

    Salt is a deterministic function of (conv_id, turn_idx) — NOT rand() —
    so reruns and different parallelism levels produce identical partials
    (the N-vs-4N byte-equality invariant)."""
    salt = F.pmod(F.xxhash64(F.col(key), F.col("turn_idx")), F.lit(buckets))
    if hot is not None:
        flag = F.col("hot_count").isNotNull()
        df = df.join(F.broadcast(hot), on=key, how="left")
        df = df.withColumn(salt_col,
                           F.when(flag, salt).otherwise(F.lit(0)).cast("int"))
        return df.drop("hot_count")
    return df.withColumn(salt_col, salt.cast("int"))


def salted_count(df: DataFrame, key: str = "conv_id",
                 buckets: int = 16) -> DataFrame:
    """groupBy(key).count() with a salted partial phase.

    Phase 1 shuffles on (key, salt) — a hot conversation's rows land on up to
    ``buckets`` reducers; phase 2 shuffles only one row per (key, salt).
    (For algebraic aggregates Spark's partial hash-agg already does map-side
    combine; salting matters when the per-key state is large — collect_list,
    applyInPandas groups — or when AQE is off.)"""
    salted = salt_column(df, key, buckets)
    partial = (salted.groupBy(key, "__salt")
               .agg(F.count(F.lit(1)).alias("__c")))
    return partial.groupBy(key).agg(F.sum("__c").alias("turns"))


def salted_collect(df: DataFrame, key: str, payload: Column,
                   buckets: int = 16) -> DataFrame:
    """collect_list(payload) per key with salted partials then flatten —
    the pattern used when a per-conversation group must be materialized for
    ``applyInPandas`` without one straggler task holding a 40× group."""
    salted = salt_column(df, key, buckets)
    partial = (salted.withColumn("__p", payload)
               .groupBy(key, "__salt")
               .agg(F.collect_list("__p").alias("__part")))
    return (partial.groupBy(key)
            .agg(F.flatten(F.collect_list("__part")).alias("items")))
