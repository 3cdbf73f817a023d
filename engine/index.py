"""Candidate-index builder — CESID's offline index, recast relationally.

Reference: per-column MinHash-LSH-Ensemble + HNSW profile index built by
forked processes over CSV chunks and pickled
(``codes/search/construct_index.py:87-125, 386-416, 445-492``), keyed
``"{tab} || {col} || {col_id}"``. Online, a missing cell's context is probed
against it and candidate values are scored and summed
(``codes/search/retrieve_relevant_values.py:88-102, 104-231``).

Here the index is a plain DataFrame/Parquet table

    (column_name, key, candidate, score, rank)

built in ONE Spark job (the bash fan-out/merge choreography is just a shuffle)
and consumed as a broadcast lookup join. Keys are deterministic context
signatures (the analog of CESID's tuple-similarity search: a value is
recoverable because *related conversations share content*, like related tables
in the reference's lake):

- role: (turn_idx mod 12, prev_role, next_role)   — role cycles are periodic
- tool: md5(text)                                  — same turn in a related
  conversation has the same text and the same tool
- text: (turn_idx, md5(prev_text), md5(next_text)) — neighbors pin the slot

Scoring = support count summed per (key, candidate) (reference A1,
``retrieve_relevant_values.py:88-102``), then per-key top-k by
``row_number`` with a deterministic tiebreak (reference W1 heap,
``codes/utils/match_row.py:83-126`` — bound-pruning dropped: vectorized
scoring beats branchy pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPK = 3  # reference keeps top-3 similar tuples (retrieve_relevant_values.py:202)


def _with_context(df: DataFrame) -> DataFrame:
    """lag/lead context per conversation under stable (conv_id, turn_idx)
    ordering. Window partitions are bounded by conversation length (≤ ~1e5
    turns even for hot conversations), so no salting is needed here; the
    shuffle key is conv_id and AQE splits oversized partitions."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (df
            .withColumn("prev_role", F.lag("role").over(w))
            .withColumn("next_role", F.lead("role").over(w))
            .withColumn("prev_text_sig", F.md5(F.lag("text").over(w)))
            .withColumn("next_text_sig", F.md5(F.lead("text").over(w))))


def role_key_col():
    return F.concat_ws("§",
                       F.pmod(F.col("turn_idx"), F.lit(12)),
                       F.coalesce(F.col("prev_role"), F.lit("^")),
                       F.coalesce(F.col("next_role"), F.lit("$")))


def tool_key_col():
    return F.md5(F.col("text"))


def text_key_col():
    return F.concat_ws("§",
                       F.pmod(F.col("turn_idx"), F.lit(12)),
                       F.coalesce(F.col("prev_text_sig"), F.lit("^")),
                       F.coalesce(F.col("next_text_sig"), F.lit("$")))


def text_prev_key_col():
    """Single-neighbor fallback key: robust when the other neighbor's text
    was itself injected (the reference's fuzzy column mapping plays the same
    degrade-gracefully role, retrieve_relevant_tables.py:489-516)."""
    return F.concat_ws("§", F.lit("p"),
                       F.pmod(F.col("turn_idx"), F.lit(12)),
                       F.coalesce(F.col("prev_text_sig"), F.lit("^")))


def text_next_key_col():
    return F.concat_ws("§", F.lit("n"),
                       F.pmod(F.col("turn_idx"), F.lit(12)),
                       F.coalesce(F.col("next_text_sig"), F.lit("$")))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = (Window.partitionBy("column_name", "key")
         .orderBy(F.desc("score"), F.asc("candidate")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def build_candidate_index(df: DataFrame, k: int = TOPK) -> DataFrame:
    """One job: context windows → per-column (key, candidate) support counts →
    per-key top-k. Output is small relative to the data (distinct contexts),
    written once and broadcast at merge time — if it ever outgrows the
    broadcast threshold the merge join degrades gracefully to a shuffled hash
    join on ``key`` (AQE decides)."""
    ctx = _with_context(df)

    def pairs_of(name: str, key_col, value: str,
                 extra_filter=None):
        p = ctx.filter(F.col(value).isNotNull())
        if extra_filter is not None:
            p = p.filter(extra_filter)
        return p.select(F.lit(name).alias("column_name"),
                        key_col.alias("key"),
                        F.col(value).alias("candidate"))

    pairs = (
        pairs_of("role", role_key_col(), "role")
        # role is also pinned by the row's own text (tuple similarity on a
        # second mapped column, like the reference probing every related
        # column — retrieve_relevant_tables.py:430-474)
        .unionByName(pairs_of("role_text", tool_key_col(), "role",
                              F.col("text").isNotNull()))
        .unionByName(pairs_of("tool", tool_key_col(), "tool",
                              F.col("text").isNotNull()))
        .unionByName(pairs_of("text", text_key_col(), "text"))
        .unionByName(pairs_of("text_prev", text_prev_key_col(), "text"))
        .unionByName(pairs_of("text_next", text_next_key_col(), "text"))
    )
    scored = (pairs.groupBy("column_name", "key", "candidate")
              .agg(F.count(F.lit(1)).cast("double").alias("score")))
    return _topk(scored, k)


def fallback_stats(df: DataFrame) -> DataFrame:
    """Estimation fallback lookup (recast of the imputer zoo,
    ``codes/estimation/fill_missing_values.py:48-259``, reduced to the one
    method that matters for categorical transcript columns: per-slot mode —
    the reference's own mean/mode initial guess,
    ``codes/estimation/row_acquisitor.py:545-548``).

    Output: (turn_mod, role_mode, tool_mode) — 12 rows, always broadcast."""
    base = df.withColumn("turn_mod", F.pmod(F.col("turn_idx"), F.lit(12)))
    role_mode = (base.filter(F.col("role").isNotNull())
                 .groupBy("turn_mod", "role").count()
                 .withColumn("rn", F.row_number().over(
                     Window.partitionBy("turn_mod")
                     .orderBy(F.desc("count"), F.asc("role"))))
                 .filter("rn = 1").select("turn_mod",
                                          F.col("role").alias("role_mode")))
    tool_mode = (base.filter(F.col("tool").isNotNull())
                 .groupBy("turn_mod", "tool").count()
                 .withColumn("rn", F.row_number().over(
                     Window.partitionBy("turn_mod")
                     .orderBy(F.desc("count"), F.asc("tool"))))
                 .filter("rn = 1").select("turn_mod",
                                          F.col("tool").alias("tool_mode")))
    return role_mode.join(tool_mode, "turn_mod", "full_outer")
