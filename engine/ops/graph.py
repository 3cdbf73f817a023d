"""Connected components over near-duplicate PAIR lists → dedup clusters.

The dedup operators (``engine.ops.dedup``) emit candidate/verified PAIRS
(id_a, id_b); production dedup needs the transitive closure — one canonical
document per connected component — before dropping duplicates. This is also
the distributed analog of the reference's semantic-graph community selection
(BFS over FD∪KB edges, ``codes/search/retrieve_relevant_tables.py:69-133``),
recast from a driver-side graph walk to iterative hash-min label propagation.

Algorithm: hash-min propagation + pointer jumping. Each round does
(1) ``label(v) ← min(label(v), min over neighbors)`` — one join + one
min-aggregate — and (2) path halving ``label(v) ← label(label(v))`` — one
self-join on the label table — so convergence takes O(log diameter) rounds
(the same doubling trick as large-star/small-star, Kiveris et al.,
"Connected Components in MapReduce and Beyond"). Every round is pure
shuffle-on-key work; the driver holds CONTROL only (a one-row changed-count
per round — the iterate-until-fixed-point shape Catalyst cannot express
declaratively). Labels are fixed-width ids, so shuffles never carry
payloads.

Iteration hygiene: each round's label table is ``localCheckpoint``-ed —
WITHOUT lineage truncation the logical plan doubles per round and the
driver OOMs analyzing it long before the data is large (observed on a
40-edge chain). On a multi-executor cluster this becomes
``checkpoint()`` into the durable store (localCheckpoint dies with an
executor; fine in local mode, where executors == the driver process).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame,
                         src_col: str = "id_a",
                         dst_col: str = "id_b",
                         max_rounds: int = 50) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    the minimum node id reachable through the pair graph (deterministic
    canonical representative, matching the reference's min-id community
    root and the dedup convention "keep the lowest doc_id").

    Raises RuntimeError if ``max_rounds`` passes without convergence (a
    diameter that large means the input is not a near-dup pair list)."""
    edges = (pairs.select(F.col(src_col).alias("a"),
                          F.col(dst_col).alias("b"))
             .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
             .distinct())
    # undirected: propagate labels both ways each round
    sym = edges.unionByName(edges.select(F.col("b").alias("a"),
                                         F.col("a").alias("b"))).persist()
    labels = (sym.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint(eager=True))

    for _ in range(max_rounds):
        # (1) hash-min: candidate label = min over neighbors' labels
        cand = (sym.join(labels, sym.a == labels.node)
                .select(F.col("b").alias("node"),
                        F.col("comp").alias("nbr_comp"))
                .groupBy("node")
                .agg(F.min("nbr_comp").alias("nbr_comp")))
        stepped = (labels.join(cand, "node", "left")
                   .select("node",
                           F.least("comp", "nbr_comp").alias("comp")))
        # (2) path halving: comp ← comp's own label (every comp value IS a
        # node id, so the lookup always resolves) — doubles the propagation
        # distance per round
        lut = stepped.select(F.col("node").alias("c_node"),
                             F.col("comp").alias("c_comp"))
        jumped = (stepped.join(lut, stepped.comp == lut.c_node, "left")
                  .select("node",
                          F.coalesce("c_comp", "comp").alias("comp")))
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (new_labels.join(labels.withColumnRenamed("comp", "old"),
                                   "node")
                   .filter(F.col("comp") != F.col("old"))
                   .limit(1).count())
        # free the PREVIOUS round's checkpoint blocks — without this a
        # high-diameter input holds O(rounds) copies of the label table in
        # block-manager storage for the life of the session
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        sym.unpersist()
        raise RuntimeError(f"connected_components: no fixed point after "
                           f"{max_rounds} rounds")
    sym.unpersist()
    return labels.select("node", "comp")


def dedup_clusters(pairs: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id",
                   src_col: str = "id_a",
                   dst_col: str = "id_b") -> DataFrame:
    """Every document's dedup cluster: singletons keep their own id, paired
    documents share their component's min id. ``keep`` marks the canonical
    representative per cluster (the one surviving deduplication)."""
    comp = connected_components(pairs, src_col, dst_col)
    return (docs.select(F.col(id_col).alias("node"))
            .join(comp, "node", "left")
            .select(F.col("node").alias(id_col),
                    F.coalesce("comp", "node").alias("cluster_id"))
            .withColumn("keep", F.col(id_col) == F.col("cluster_id")))
