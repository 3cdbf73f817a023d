"""Grouped per-conversation estimation fallback — the one ``applyInPandas``
operator SURVEY §2.8 commits to (U3).

Reference: the MissForest iterative imputation loop
(``codes/estimation/row_acquisitor.py:282-405``) fits a model per column and
predicts missing cells from the others. For ordered transcript/event groups
the dominant signal is intra-group adjacency, so the recast is a grouped-map
forward/backward fill: order within the group, carry the last observed value
forward, back-fill leading gaps (the reference's per-dtype method dispatch,
``codes/estimation/estimator.py:146-151``, collapses to this one method for
ordered categorical/text columns; numeric group-mean lives in the relational
path, ``engine.queries.impute_mean_merge``).

The PRIMARY impute path stays relational (broadcast/shuffle joins against
the candidate index — zero Python, ``engine.merge``); this grouped UDF is
the fallback shape for logic that genuinely needs imperative per-group code.

Skew: a grouped map materializes one group per task. Transcript groups are
bounded (hot conversations ≲ 1e5 turns ≈ MBs), so no salting here;
``engine.skew.salted_collect`` covers order-INdependent collects — an
order-DEPENDENT fill under salting would need a two-phase boundary stitch,
which costs more than it saves at these group sizes. Evidence:
``tests/test_skew.py::test_group_ffill_hot_conversation_task_share_is_bounded``
shows a 100×-hot conversation bounds the straggler task at (one group +
hash-collision share), independent of table size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_null_profile(df: DataFrame) -> DataFrame:
    """Per-column non-null ratio in ONE aggregation pass, melted to
    (column_name, non_null_ratio) rows — the stats input to sparse-column
    pruning (reference P6: drop columns with <20% non-null in the train
    slice, ``codes/estimation/row_acquisitor.py:739-743``,
    ``codes/estimation/fill_missing_values.py:89-100``)."""
    total = F.count(F.lit(1))
    agg = df.agg(total.alias("__n"),
                 *[F.count(c).alias(f"__c_{c}") for c in df.columns])
    # 0-row frame → 0/0: emit null (ANSI mode raises on the bare division)
    pairs = F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.when(F.col("__n") > 0,
                        F.round(F.col(f"__c_{c}") / F.col("__n"), 6))
                 .alias("non_null_ratio"))
        for c in df.columns])
    return (agg.select(F.explode(pairs).alias("p"))
            .select("p.column_name", "p.non_null_ratio"))


def sparse_prune(df: DataFrame, min_non_null: float = 0.2) -> DataFrame:
    """Stats-driven column pruning: drop columns whose non-null ratio falls
    below ``min_non_null``. The ratio scan is O(1) output (an aggregate
    collected on the driver — a planning decision, like Catalyst's own
    stats-based pruning); the returned frame selects survivors only, so
    every downstream scan reads fewer parquet columns."""
    ratios = {r["column_name"]: r["non_null_ratio"]
              for r in column_null_profile(df).collect()}
    # a 0-row frame yields null ratios (0/0): no evidence to prune on —
    # keep every column instead of raising on the None comparison
    keep = [c for c in df.columns
            if ratios.get(c) is None or ratios[c] >= min_non_null]
    return df.select(*keep)


def group_ffill(df: DataFrame,
                group_cols: Iterable[str] = ("conv_id",),
                order_cols: Iterable[str] = ("turn_idx",),
                fill_cols: Iterable[str] = ("role", "tool", "text")
                ) -> DataFrame:
    """Per-group ffill-then-bfill over ``fill_cols`` under a stable
    ``order_cols`` sort. Arrow-batched grouped map: one pandas frame per
    group, vectorized fill, schema preserved."""
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    fill_cols = list(fill_cols)

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        pdf[fill_cols] = pdf[fill_cols].ffill().bfill()
        return pdf

    return df.groupBy(*group_cols).applyInPandas(fill, schema=df.schema)
