"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Every column is a pure Spark-SQL expression of ``(conv index, turn_idx)`` —
no Python RNG, no partition-order dependence — so the generated table is
byte-identical at local[8] and local[32] (the N-vs-4N invariant) and across
reruns. Mirrors the reference's benchmark corpora of many small related tables
(``cesid_datalake_imputation/readme.md:39-46``) collapsed into one governed
table: conversations in the same *content group* share turn texts, which is
what makes CESID-style retrieval (find the missing value in a *related* table,
``codes/search/retrieve_relevant_values.py:104-231``) recoverable here.

Skew: every 97th conversation is "hot" with ~40× the median turn count,
exercising the salted-aggregation path (engine.skew) and AQE skew joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLE_PATTERNS = [
    ["user", "assistant"],
    ["user", "assistant", "tool"],
    ["system", "user", "assistant"],
    ["user", "assistant", "tool", "assistant"],
]
TOOLS = ["search", "code", "browser", "sql"]
# finite phrase pool → cross-conversation duplicate text (retrieval corpus)
_PHRASES = [
    "let me check the data for that request",
    "running the query now and collecting results",
    "the aggregation shows a clear seasonal trend",
    "i will open the file and inspect the schema",
    "tool call returned two hundred rows of output",
    "that matches the expected totals from yesterday",
    "please summarize the findings in a short table",
    "the join keys line up after normalization",
    "retrying with a broader filter on the dates",
    "confirmed: the anomaly is isolated to one region",
    "scanning the manifest for files in that range",
    "the compaction pass reduced file count sharply",
    "estimates converge after the third iteration",
    "handing off to the planner with updated stats",
    "the snapshot diff shows only metadata changes",
    "wrapping up: all checks green on the sample",
]
BASE_EPOCH = 1735689600  # 2025-01-01T00:00:00Z


def generate_transcripts(spark: SparkSession, num_convs: int = 200,
                         groups: int | None = None,
                         hot_every: int = 97,
                         hot_factor: int = 40) -> DataFrame:
    """Schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string,
     tool string nullable, ts timestamp)."""
    groups = groups or max(1, num_convs // 10)
    conv = (
        spark.range(num_convs).withColumnRenamed("id", "i")
        .withColumn("conv_id", F.format_string("conv-%08d", F.col("i")))
        .withColumn("pattern", (F.col("i") % len(ROLE_PATTERNS)).cast("int"))
        .withColumn("grp", (F.col("i") % groups).cast("int"))
        .withColumn(
            "n_turns",
            F.when(F.col("i") % hot_every == 0,
                   (8 + F.pmod(F.col("i") * 2654435761, F.lit(25))) * hot_factor)
             .otherwise(8 + F.pmod(F.col("i") * 2654435761, F.lit(25)))
             .cast("int"))
    )
    # one row per turn: explode a sequence — deterministic, no RNG
    t = conv.select(
        "conv_id", "pattern", "grp", "i",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    pattern_arr = F.array(*[
        F.array(*[F.lit(r) for r in pat]) for pat in ROLE_PATTERNS
    ])
    t = t.withColumn(
        "role",
        F.element_at(F.element_at(pattern_arr, F.col("pattern") + 1),
                     (F.pmod(F.col("turn_idx"),
                             F.size(F.element_at(pattern_arr,
                                                 F.col("pattern") + 1)))
                      + 1).cast("int")))
    # tool: only tool-turns carry one; value is a function of (grp, turn_idx)
    # so it is recoverable from context (text determines grp+turn, see below)
    tool_arr = F.array(*[F.lit(x) for x in TOOLS])
    t = t.withColumn(
        "tool",
        F.when(F.col("role") == "tool",
               F.element_at(tool_arr,
                            (F.pmod(F.col("grp") + F.col("turn_idx"), 4) + 1
                             ).cast("int"))))
    # text: determined by (grp, turn_idx mod 12) → duplicated across the ~10
    # conversations of a group AND across every 12th turn, so each cell's
    # ground truth exists elsewhere in the lake (like the reference's
    # benchmarks, where injected cells are recoverable from related tables —
    # codes/utils/inject_missing_values.py samples from *observed* values).
    # 12 = lcm(role-cycle lengths 2,3,4), so turn%12 also pins the role.
    # Variable length (repeat 1..8×) exercises byte-based bin-packing.
    tmod = F.pmod(F.col("turn_idx"), F.lit(12))
    phrase_arr = F.array(*[F.lit(p) for p in _PHRASES])
    body = F.element_at(
        phrase_arr,
        (F.pmod(F.col("grp") * 31 + tmod * 7, len(_PHRASES)) + 1
         ).cast("int"))
    reps = (F.pmod(F.col("grp") * 13 + tmod * 5, 8) + 1).cast("int")
    t = t.withColumn(
        "text",
        F.concat(F.format_string("msg g%04d/t%04d %s: ",
                                 F.col("grp"), tmod, F.col("role")),
                 F.repeat(F.concat(body, F.lit(" ")), reps)))
    # ts: conversations interleaved in time; monotone within a conversation
    t = t.withColumn(
        "ts",
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("i") * 7919
                            + F.col("turn_idx") * 13))
    return t.select("conv_id", F.col("turn_idx").cast("int").alias("turn_idx"),
                    "role", "text", "tool", "ts")


def conv_bounds(num_convs: int, num_files: int) -> list[str]:
    """Analytic range-partition boundaries for the synthetic conv_id space —
    lets the initial append use the sampling-free bounds path of
    ``engine.write.stage_dataframe`` with a layout that is byte-identical at
    every parallelism level (repartitionByRange's sampler sees different
    parent partitionings at different core counts)."""
    out = []
    for i in range(1, num_files):
        b = f"conv-{int(i * num_convs / num_files):08d}"
        if not out or b > out[-1]:
            out.append(b)
    return out


def inject_missing(df: DataFrame, frac: float = 0.01,
                   seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Null out ~``frac`` of role/tool/text cells; return (injected, worklist).

    Recast of the reference's inject-then-recover protocol
    (``codes/utils/inject_missing_values.py:57-77``): the worklist is the
    analog of ``missing_tab_row_col.csv`` with ground truth ``gt_val``.
    The mask is a pure function of (conv_id, turn_idx, column, seed) via
    xxhash64 — deterministic and partition-independent (the reference's
    ``random.sample`` is not; determinism is required for the N-vs-4N
    equality invariant).
    """
    out = df
    worklists = []
    bucket = int(1.0 / frac)
    for colname, col_type in [("role", "cate"), ("tool", "cate"),
                              ("text", "text")]:
        hit = (F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx"),
                                 F.lit(colname), F.lit(seed)),
                      F.lit(bucket)) == 0) & F.col(colname).isNotNull()
        worklists.append(
            df.filter(hit).select(
                "conv_id", "turn_idx",
                F.lit(colname).alias("column_name"),
                F.lit(col_type).alias("column_type"),
                F.col(colname).cast("string").alias("gt_val")))
        out = out.withColumn(colname,
                             F.when(hit, F.lit(None)).otherwise(F.col(colname)))
    wl = worklists[0].unionByName(worklists[1]).unionByName(worklists[2])
    return out, wl
