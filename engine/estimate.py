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
which costs more than it saves at these group sizes.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame


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
