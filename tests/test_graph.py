"""Connected components / dedup clusters (engine.ops.graph).

No driver-registry slot (the driver caps at 50 correctness entries), so the
oracle-grade check lives here: DuckDB replays the transitive closure with a
recursive CTE and must agree exactly.
"""

import duckdb
import pytest

from engine.ops.graph import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r["node"]: r["comp"]
            for r in connected_components(df).collect()}


def test_cc_chain_cycle_and_islands(spark):
    # chain 1-2-3-4, cycle 10-11-12-10, pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_long_chain_needs_propagation_rounds(spark):
    n = 40  # diameter >> 1: exercises the iterate-until-fixed-point loop
    edges = [(i, i + 1) for i in range(n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_cc_matches_duckdb_recursive_closure(spark):
    """Exact agreement with a DuckDB recursive-CTE transitive closure on a
    seeded random pair graph — the same oracle discipline as the registry,
    minus the registry slot."""
    import random
    rng = random.Random(7)
    edges = sorted({(rng.randrange(200), rng.randrange(200))
                    for _ in range(150) if True})
    edges = [(a, b) for a, b in edges if a != b]
    got = _cc(spark, edges)

    con = duckdb.connect()
    con.execute("CREATE TABLE e(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)",
                    edges + [(b, a) for a, b in edges])
    want = dict(con.execute("""
        WITH RECURSIVE reach(src, dst) AS (
          SELECT DISTINCT a, a FROM e
          UNION
          SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a)
        SELECT src, min(dst) FROM reach GROUP BY src
    """).fetchall())
    assert got == want


def test_dedup_clusters_singletons_and_keep_flag(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in dedup_clusters(pairs, docs).collect()}
    assert rows == {0: (0, True), 3: (0, False), 5: (0, False),
                    1: (1, True), 2: (2, True), 4: (4, True)}


def test_cc_raises_without_convergence(spark):
    # path halving doubles reach per round: a 300-chain needs ~8 rounds
    edges = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=2)
