"""Copy-on-write MERGE INTO + the impute stage (CESID online pipeline, recast).

Reference online pipeline per missing cell: index probe → candidate tables →
top-k similar tuples → score aggregation → best value
(``codes/search/retrieve_relevant_tables.py:267-527``,
``codes/search/retrieve_relevant_values.py:104-231``,
``codes/utils/match_row.py:98-126``), then the estimation fallback
(``codes/estimation/estimator.py:139-240``). The per-cell Python loop becomes
ONE dataflow: worklist ⟕ broadcast(candidate index) → deterministic top-1 →
coalesce(index value, estimation value) — the "search vs estimate" classifier
(``codes/classification/classifier.py:63-105``) collapses into that coalesce,
exactly the higher-confidence-source rule it learns (technique_report Table 8).

The MERGE itself is copy-on-write under snapshot isolation: only data files
whose stats intersect the source's key domain are rewritten; everything else
is carried over by manifest reference. Resumable via checkpoint manifests.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import CheckpointLog, TaskRecord
from .format import DataFile, Snapshot, Table, collect_parquet_stats
from .index import _with_context, build_candidate_index, key_families
from .scan import Predicate, prune_files, scan
from .write import stage_dataframe

MERGE_KEYS = ("conv_id", "turn_idx")
_MAX_IN_SET = 100_000  # above this, fall back to min/max range pruning


# --------------------------------------------------------------------- impute
def worklist(ctx: DataFrame) -> DataFrame:
    """Rows with a missing role/tool/text cell — the analog of the
    reference's ``missing_tab_row_col.csv`` worklist."""
    w = ctx.filter(F.col("role").isNull() | F.col("text").isNull()
                   | (F.col("tool").isNull() & (F.col("role") == "tool")))
    return w.withColumn("turn_mod", F.pmod(F.col("turn_idx"), F.lit(12)))


def melt_cells(work: DataFrame) -> DataFrame:
    """Worklist at cell grain: (conv_id, turn_idx, column_name, key) — one
    row per (missing cell, key family) probe."""
    keyed = {name: key for name, (key, _) in key_families().items()}
    melt = F.explode(F.map_from_arrays(
        F.array(*[F.lit(k) for k in keyed]),
        F.array(*keyed.values())))
    return work.select("conv_id", "turn_idx", melt.alias("column_name", "key"))


def plan_impute_updates(df: DataFrame, cand_idx: DataFrame,
                        fallbacks: DataFrame | None = None,
                        ctx: DataFrame | None = None,
                        work: DataFrame | None = None) -> DataFrame:
    """Worklist = rows with a missing role/tool/text cell (the analog of
    ``missing_tab_row_col.csv``); output = updates keyed (conv_id, turn_idx)
    with ``upd_*`` values and ``src_*`` provenance tags
    ('index' | 'estimate' — the scenario buckets of
    ``codes/evaluate/total_evaluate.py:159-174``).

    All joins broadcast the small side; the only wide shuffle is the context
    window over conv_id, shared (via the persisted ``ctx``) with the index
    build."""
    if ctx is None:
        ctx = _with_context(df)

    _ = fallbacks  # retained for API compat; fallbacks are index families now
    if work is None:
        # the worklist (~1% of rows) feeds two join branches below (melted
        # cells and the wide row) — persist it so the conv-window pipeline
        # over the full table runs ONCE, not once per branch
        work = worklist(ctx).persist()

    # ONE broadcast join for all key families: the worklist at cell grain
    # (column_name, key) joins the index once and pivots back. Per-family
    # broadcast joins would schedule one build-side job each — pure serial
    # stage latency at any scale (the reference pays the same shape of cost
    # probing its per-dtype indexes one by one, construct_index.py:284-313).
    keyed = list(key_families())
    cells = melt_cells(work)
    # broadcast measured faster than a shuffle-hash hint here (the persisted
    # index serializes once); at 100 TB the index is GBs — drop the explicit
    # broadcast there and let AQE pick the join side
    hits = (cells.join(F.broadcast(
                cand_idx.filter(F.col("rank") == 1)
                .select("column_name", "key", "candidate")),
            ["column_name", "key"], "inner")
            .groupBy("conv_id", "turn_idx")
            .pivot("column_name", keyed)
            .agg(F.first("candidate")))
    for k in keyed:
        hits = hits.withColumnRenamed(k, f"cand_{k}")
    work = work.join(hits, ["conv_id", "turn_idx"], "left")
    # candidate preference: the tool→role functional dependency (a non-null
    # tool cell implies role='tool' — the static FD the reference would mine
    # with Metanome, codes/fd_tools/generate_fds.py:62-72) beats the own-text
    # key (exact tuple match), which beats the two-neighbor context key,
    # which beats single-neighbor keys
    work = (work
            .withColumn("cand_role",
                        F.coalesce(F.when(F.col("tool").isNotNull(),
                                          F.lit("tool")),
                                   F.col("cand_role_text"),
                                   F.col("cand_role")))
            .withColumn("cand_text",
                        F.coalesce(F.col("cand_text"),
                                   F.col("cand_text_prev"),
                                   F.col("cand_text_next"))))

    # nearest-turn copy is the text estimation fallback (FIXTURES.md §6):
    # fetched with a keyed join of the worklist's ±1 neighbors against the
    # table — O(worklist) rows, instead of carrying every row's raw neighbor
    # texts through the context window (3× the text bytes of the table)
    nbr_keys = (work.filter(F.col("text").isNull())
                .select("conv_id", F.col("turn_idx").alias("orig_turn"))
                .withColumn("turn_idx",
                            F.explode(F.array(F.col("orig_turn") - 1,
                                              F.col("orig_turn") + 1))))
    nbr_text = (F.broadcast(nbr_keys)
                .join(ctx.select("conv_id", "turn_idx", "text"),
                      ["conv_id", "turn_idx"], "inner")
                .filter(F.col("text").isNotNull())
                .groupBy("conv_id", F.col("orig_turn").alias("turn_idx"))
                .agg(F.max(F.when(F.col("turn_idx") < F.col("orig_turn"),
                                  F.col("text"))).alias("prev_text"),
                     F.max(F.when(F.col("turn_idx") > F.col("orig_turn"),
                                  F.col("text"))).alias("next_text")))
    work = work.join(nbr_text, ["conv_id", "turn_idx"], "left")

    est_role = F.coalesce(F.col("cand_role_fb"), F.lit("assistant"))
    # a turn needs a tool value only if its (possibly imputed) role is 'tool'
    eff_role = F.coalesce(F.col("role"), F.col("cand_role"), est_role)
    est_tool = F.coalesce(F.col("cand_tool_fb"), F.lit("search"))
    est_text = F.coalesce(F.col("prev_text"), F.col("next_text"),
                          F.lit("[unrecoverable]"))

    upd = work.select(
        "conv_id", "turn_idx",
        F.when(F.col("role").isNull(),
               F.coalesce(F.col("cand_role"), est_role)).alias("upd_role"),
        F.when(F.col("role").isNull(),
               F.when(F.col("cand_role").isNotNull(), F.lit("index"))
               .otherwise(F.lit("estimate"))).alias("src_role"),
        F.when(F.col("tool").isNull() & (eff_role == "tool"),
               F.coalesce(F.col("cand_tool"), est_tool)).alias("upd_tool"),
        F.when(F.col("tool").isNull() & (eff_role == "tool"),
               F.when(F.col("cand_tool").isNotNull(), F.lit("index"))
               .otherwise(F.lit("estimate"))).alias("src_tool"),
        F.when(F.col("text").isNull(),
               F.coalesce(F.col("cand_text"), est_text)).alias("upd_text"),
        F.when(F.col("text").isNull(),
               F.when(F.col("cand_text").isNotNull(), F.lit("index"))
               .otherwise(F.lit("estimate"))).alias("src_text"),
    )
    return upd


# ---------------------------------------------------------------- merge into
def _source_predicates(source: DataFrame) -> list[Predicate]:
    """File-pruning predicates from the source's conv_id domain: an IN-set
    when the domain is small (collected on the driver, O(distinct keys)),
    else a min/max range. At 10^12 turns the IN-set path still holds for
    targeted merges (one batch of late conversations), and the range path
    bounds the worst case."""
    keys = [r[0] for r in
            source.select("conv_id").distinct().limit(_MAX_IN_SET + 1)
            .collect()]
    if len(keys) <= _MAX_IN_SET:
        return [Predicate("conv_id", "in", sorted(keys))]
    agg = source.agg(F.min("conv_id"), F.max("conv_id")).collect()[0]
    return [Predicate("conv_id", "ge", agg[0]),
            Predicate("conv_id", "le", agg[1])]


def merge_into(spark: SparkSession, table: Table, source: DataFrame,
               update_map: dict[str, str],
               pass_id: str | None = None,
               broadcast_source: bool = True,
               num_files: int | None = None,
               target_bytes: int = 128 * 1024 * 1024) -> Snapshot:
    """MERGE INTO table USING source ON (conv_id, turn_idx)
    WHEN MATCHED THEN UPDATE SET col = coalesce(source.upd_col, col).

    ``update_map`` maps target column → source column (null source cell means
    "leave unchanged", giving cell-grain updates like the reference's
    ground-truth lookup join, ``codes/estimation/row_acquisitor.py:1087-1089``).

    Copy-on-write: prune target files by source key domain, rewrite only
    those, carry the rest. Checkpointed: if the process dies after staging
    but before the snapshot swap, a rerun with the same ``pass_id`` reuses the
    staged files and just commits (byte-identical table state).
    """
    pass_id = pass_id or uuid.uuid4().hex[:12]
    ckpt = CheckpointLog(table.root, pass_id, "merge")
    if ckpt.pass_committed():
        return table.current_snapshot()

    # the source pipeline (index build → keyed joins → updates) is consumed
    # up to 4× below (predicate collect, broadcast, range sampling, write);
    # without persisting it every consumer re-runs the whole DAG — the
    # single biggest serial cost in the maintenance pass
    source = source.persist()

    snap = table.current_snapshot()
    entries = table.manifest_entries(snap)
    affected = prune_files(entries, _source_predicates(source))
    affected_paths = [e.path for e in affected]

    rec = ckpt.get("rewrite")
    if rec is not None:
        staged = []
        for p in rec["output_files"]:
            rows, size, stats = collect_parquet_stats(
                os.path.join(table.root, p))
            staged.append(DataFile(p, rows, size, stats))
        affected_paths = rec["input_files"]
    elif not affected:
        staged = []
    else:
        tgt = spark.read.parquet(
            *[os.path.join(table.root, p) for p in affected_paths])
        src = F.broadcast(source) if broadcast_source else source
        joined = tgt.join(src.withColumn("__matched", F.lit(True)),
                          on=list(MERGE_KEYS), how="left")
        out_cols = []
        for c in tgt.columns:
            if c in update_map:
                u = F.col(update_map[c])
                out_cols.append(
                    F.when(F.col("__matched").isNotNull() & u.isNotNull(), u)
                    .otherwise(F.col(c)).alias(c))
            else:
                out_cols.append(F.col(c))
        out = joined.select(*out_cols)
        # Output file count derives from DATA SIZE (not core count, not scan
        # partitioning — both vary with parallelism and would make the
        # rewrite non-deterministic across cluster sizes). The explicit
        # range exchange costs one sampling pass but keeps every output
        # file's (conv_id, turn_idx) span tight for manifest pruning.
        if num_files is None:
            in_bytes = sum(e.file_size_bytes for e in affected)
            num_files = max(1, round(in_bytes / target_bytes))
            if in_bytes > (1 << 20):
                num_files = max(num_files, 16)
        staged = stage_dataframe(table, out, num_files=num_files,
                                 range_cols=list(MERGE_KEYS),
                                 sort_cols=list(MERGE_KEYS))
        rows = sum(e.record_count for e in staged)
        mean_rows = rows / max(1, len(staged))
        skew = (max((e.record_count for e in staged), default=0)
                / max(1.0, mean_rows))
        ckpt.record(TaskRecord(
            pass_id, "merge", "rewrite",
            input_files=affected_paths,
            output_files=[e.path for e in staged],
            rows=rows, bytes=sum(e.file_size_bytes for e in staged),
            skew_factor=round(skew, 3), committed=False))

    new_snap = table.commit("merge", added=staged,
                            removed_paths=set(affected_paths),
                            summary={"pass_id": pass_id})
    ckpt.finalize({"snapshot_id": new_snap.snapshot_id})
    source.unpersist()
    return new_snap


def impute_merge(spark: SparkSession, table: Table,
                 pass_id: str | None = None,
                 cand_idx: DataFrame | None = None,
                 target_bytes: int = 128 * 1024 * 1024) -> Snapshot:
    """The flagship maintenance stage: scan → candidate index → planned
    updates → copy-on-write MERGE. One wide shuffle (conv windows), one
    broadcast join per imputed column, one CoW rewrite."""
    df = scan(spark, table)
    # ONE materialization of the wide conv-window pipeline, shared by the
    # index build and the update plan (Catalyst has no cross-branch subtree
    # reuse; without this the windows run 2-6×). MEMORY_AND_DISK: at real
    # scale the context spills instead of recomputing — both are fine, the
    # knob exists for the cluster profile.
    from pyspark import StorageLevel
    _ = StorageLevel  # ctx caching toggle below
    import os as _os
    if _os.environ.get("ENGINE_CTX_CACHE", "1") == "1":
        ctx = _with_context(df).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        ctx = _with_context(df)
    work = worklist(ctx).persist()
    if cand_idx is None:
        # full index build: map-side partial aggregation already collapses
        # the exploded pairs before the shuffle, so the probe_keys pruning
        # mode (see build_candidate_index) measured SLOWER here — it adds a
        # worklist materialization barrier for shuffle the combiner had
        # already eliminated. Revisit only if key cardinality ever rivals
        # row count.
        cand_idx = build_candidate_index(df, ctx=ctx)
    # the broadcast build side materializes as a separate job — persist so
    # the index pipeline runs once, not once per consumer
    cand_idx = cand_idx.persist()
    updates = plan_impute_updates(df, cand_idx, ctx=ctx, work=work)
    update_map = {"role": "upd_role", "tool": "upd_tool", "text": "upd_text"}
    src = updates.select("conv_id", "turn_idx",
                         "upd_role", "upd_tool", "upd_text")
    snap = merge_into(spark, table, src, update_map, pass_id=pass_id,
                      target_bytes=target_bytes)
    for frame in (cand_idx, work, ctx):
        frame.unpersist()
    return snap


def evaluate_impute(imputed: DataFrame, worklist: DataFrame,
                    updates: DataFrame | None = None) -> dict:
    """Exact-match accuracy per column (reference protocol:
    ``codes/evaluate/total_evaluate.py:94`` categorical exact match), plus
    scenario buckets when ``updates`` (with src_* provenance) is given —
    the s1/s2/s3 search-covered / estimation / neither buckets of
    ``total_evaluate.py:159-174``."""
    melted = imputed.select(
        "conv_id", "turn_idx",
        F.explode(F.map_from_arrays(
            F.array(F.lit("role"), F.lit("tool"), F.lit("text")),
            F.array(F.col("role"), F.col("tool"), F.col("text")),
        )).alias("column_name", "val"))
    j = worklist.join(melted, ["conv_id", "turn_idx", "column_name"], "left")
    if updates is not None:
        src = updates.select(
            "conv_id", "turn_idx",
            F.explode(F.map_from_arrays(
                F.array(F.lit("role"), F.lit("tool"), F.lit("text")),
                F.array(F.col("src_role"), F.col("src_tool"),
                        F.col("src_text")),
            )).alias("column_name", "src"))
        j = j.join(src, ["conv_id", "turn_idx", "column_name"], "left")
        j = j.withColumn("src", F.coalesce(F.col("src"), F.lit("none")))
    else:
        j = j.withColumn("src", F.lit("all"))
    agg = (j.groupBy("column_name", "src")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("val") == F.col("gt_val"), 1)
                      .otherwise(0)).alias("hits")))
    out: dict = {}
    for r in agg.collect():
        col = out.setdefault(r["column_name"], {"n": 0, "hits": 0,
                                                "buckets": {}})
        col["n"] += r["n"]
        col["hits"] += r["hits"]
        col["buckets"][r["src"]] = {"n": r["n"],
                                    "acc": r["hits"] / r["n"]}
    for col in out.values():
        col["acc"] = col.pop("hits") / col["n"]
    return out
