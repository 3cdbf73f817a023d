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
    ordering — ONE window sort produces every context column (all functions
    share the frame, so Catalyst evaluates them in a single Window exec).
    Window partitions are bounded by conversation length (≤ ~1e5 turns even
    for hot conversations), so no salting is needed here; the shuffle key is
    conv_id and AQE splits oversized partitions.

    Callers that consume the context more than once (index build + update
    plan) should persist the result: Catalyst does NOT share a common
    subtree across union/join branches, and this pipeline is the single
    widest shuffle of the merge pass."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # only 32-byte digests of neighbor texts are kept: carrying the raw
    # neighbor texts would triple the text bytes through this (widest)
    # shuffle and the ctx cache — the nearest-turn fallback text is fetched
    # later by a tiny keyed join against worklist neighbors instead
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


def key_families():
    """The six (family, key, candidate-with-guard) triples. The 'role_text'
    family pins role by the row's own text — tuple similarity on a second
    mapped column, like the reference probing every related column
    (retrieve_relevant_tables.py:430-474)."""
    text_ok = F.col("text").isNotNull()
    turn_mod = F.pmod(F.col("turn_idx"), F.lit(12)).cast("string")
    return {
        "role": (role_key_col(), F.col("role")),
        "role_text": (tool_key_col(), F.when(text_ok, F.col("role"))),
        "tool": (tool_key_col(), F.when(text_ok, F.col("tool"))),
        "text": (text_key_col(), F.col("text")),
        "text_prev": (text_prev_key_col(), F.col("text")),
        "text_next": (text_next_key_col(), F.col("text")),
        # estimation fallbacks as two more families (global per-slot mode —
        # the reference's mean/mode initial guess, row_acquisitor.py:545-548)
        # so they ride the SAME explode/agg/top-k instead of dedicated
        # pipelines + broadcasts
        "role_fb": (turn_mod, F.col("role")),
        "tool_fb": (turn_mod, F.col("tool")),
    }


def build_candidate_index(df: DataFrame, k: int = TOPK,
                          ctx: DataFrame | None = None,
                          probe_keys: DataFrame | None = None) -> DataFrame:
    """One job: context windows → per-column (key, candidate) support counts →
    per-key top-k. All key families are emitted by a SINGLE explode over one
    context pass (a per-family union would re-run the window pipeline per
    branch — Catalyst has no cross-branch subtree reuse).

    ``probe_keys`` (columns: column_name, key) prunes the build to keys that
    will actually be looked up: the explode still scans every donor row, but
    the shuffle/aggregate behind it shrinks from O(rows × families) to
    O(matching pairs) — at a 1% missing-cell rate that is ~99% less shuffle.
    This is the merge-pass mode (CESID's *online* search probes only the
    missing cells' contexts, retrieve_relevant_values.py:133-231); omit it to
    materialize the full offline index table."""
    if ctx is None:
        ctx = _with_context(df)
    fams = F.array(*[
        F.struct(F.lit(name).alias("column_name"),
                 key.alias("key"), cand.alias("candidate"))
        for name, (key, cand) in key_families().items()])
    pairs = (ctx.select(F.explode(fams).alias("f"))
             .select("f.column_name", "f.key", "f.candidate")
             .filter(F.col("candidate").isNotNull()
                     & F.col("key").isNotNull()))
    if probe_keys is not None:
        pairs = pairs.join(F.broadcast(probe_keys), ["column_name", "key"],
                           "left_semi")
    scored = (pairs.groupBy("column_name", "key", "candidate")
              .agg(F.count(F.lit(1)).cast("double").alias("score")))
    return _topk(scored, k)
