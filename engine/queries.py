"""Driver-contract query registry: one entry per implemented SURVEY.md §2
operator, each as (Spark callable, equivalent DuckDB oracle SQL).

Conventions that make the driver's order-insensitive value-hash comparison
deterministic across engines:
- every aggregate/computed column is aliased identically on both sides
- doubles are rounded (2-6 dp) BEFORE any ranking that depends on them
- ties in any top-k / rank are broken by a unique key
- Spark ``size``/``*_rank`` (int) are cast to bigint to match DuckDB
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn
    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(c):
    """Order-independent double sum: exact DECIMAL(38,12) accumulation cast
    back to double. A bare double sum depends on partition/summation order,
    so the value-hash oracle flakes whenever a rounded digit sits near a
    boundary (observed at sf0.001: 60.6462 vs 60.6463); the decimal sum is
    bit-identical between Spark and DuckDB (verified on lineitem), at the
    semantic cost of quantizing each addend to 1e-12. The SQL twin is
    CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast("decimal(38,12)")).cast("double")


def _dmean(c):
    """Order-independent mean: _dsum / non-null count (avg's null rule)."""
    col = F.col(c) if isinstance(c, str) else c
    return _dsum(col) / F.count(col)


def _r(col, scale: int):
    """Engine-neutral half-up rounding: floor(x·10^s + 0.5)/10^s. Spark's
    round() rounds the double's SHORTEST DECIMAL STRING half-up while DuckDB
    rounds the binary value — they disagree exactly on decimal midpoints
    (mean of 2-dp values over 16 rows = 35.06625: Spark → .0663, DuckDB →
    .0662). The floor form is the same double arithmetic on both engines.
    SQL twin: floor(x * 10000 + 0.5) / 10000 (for scale 4)."""
    f = 10 ** scale
    return F.floor(col * f + F.lit(0.5)) / f


# ════════════════════════════════════════════════════════════ scans/filters
# P1/P2 — projection + predicate (reference: df.iloc[:, cols] / dropna,
# codes/utils/match_row.py:28, construct_index.py:166)
@register("p1_projection_filter", """
SELECT l_orderkey, l_partkey, l_quantity
FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'N'
""")
def p1(spark, sf):
    return (_t(spark, sf, "lineitem")
            .filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "N"))
            .select("l_orderkey", "l_partkey", "l_quantity"))


# P3 — null-string normalization (generalFunctions.py:59-64)
@register("p3_null_normalize", """
SELECT coalesce(src, '<null>') AS src, count(*) AS cnt FROM (
  SELECT CASE WHEN lower(trim(source)) IN
    ('nan','-','unknown','other (unknown)','null','na','',' ')
    THEN NULL ELSE source END AS src FROM documents)
GROUP BY 1
""")
def p3(spark, sf):
    nulls = ["nan", "-", "unknown", "other (unknown)", "null", "na", "", " "]
    src = F.when(F.lower(F.trim(F.col("source"))).isin(nulls),
                 F.lit(None)).otherwise(F.col("source"))
    return (_t(spark, sf, "documents").select(src.alias("src"))
            .select(F.coalesce("src", F.lit("<null>")).alias("src"))
            .groupBy("src").agg(F.count(F.lit(1)).alias("cnt")))


# P4 — numeric range predicate = the min/max pruning analog
# (row_acquisitor.py:705-712)
@register("p4_range_filter", """
SELECT l_returnflag, count(*) AS cnt,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE), 2) AS total
FROM lineitem WHERE l_extendedprice BETWEEN 1000 AND 2000
GROUP BY l_returnflag
""")
def p4(spark, sf):
    return (_t(spark, sf, "lineitem")
            .filter(F.col("l_extendedprice").between(1000, 2000))
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(_dsum("l_extendedprice"), 2).alias("total")))


# P5 — domain/isin predicate (row_acquisitor.py:721-723)
@register("p5_domain_filter", """
SELECT o_orderstatus, count(*) AS cnt FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY o_orderstatus
""")
def p5(spark, sf):
    return (_t(spark, sf, "orders")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt")))


# P8 — string canonicalization (generalFunctions.py:44-56)
@register("p8_string_canon", """
SELECT trim(regexp_replace(regexp_replace(lower(p_type), '[^a-z0-9 ]', ' ', 'g'),
            ' +', ' ', 'g')) AS canon, count(*) AS cnt
FROM part GROUP BY 1
""")
def p8(spark, sf):
    canon = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("p_type")), "[^a-z0-9 ]", " "),
        " +", " "))
    return (_t(spark, sf, "part").select(canon.alias("canon"))
            .groupBy("canon").agg(F.count(F.lit(1)).alias("cnt")))


# P9 — numeric string cleaning + cast (construct_index.py:220-229)
@register("p9_numeric_clean", """
SELECT CAST(regexp_replace(s_name, '[^0-9]', '', 'g') AS BIGINT) AS snum,
       round(s_acctbal, 2) AS bal
FROM supplier
""")
def p9(spark, sf):
    return (_t(spark, sf, "supplier")
            .select(F.regexp_replace("s_name", "[^0-9]", "")
                    .cast("bigint").alias("snum"),
                    F.round("s_acctbal", 2).alias("bal")))


# P10/W3 — deterministic cap via TakeOrderedAndProject
# (retrieve_relevant_values.py:22-33 nlargest)
@register("p10_topn_cap", """
SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""")
def p10(spark, sf):
    return (_t(spark, sf, "orders")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
            .limit(100))


# ═══════════════════════════════════════════════════════════════════ joins
# J1 — broadcast lookup join (the engine's core access path,
# construct_index.py:128-140 recast)
@register("j1_broadcast_lookup", """
SELECT p.p_brand AS brand,
       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,12))) AS DOUBLE), 2)
         AS revenue,
       count(*) AS cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def j1(spark, sf):
    li, p = _t(spark, sf, "lineitem"), _t(spark, sf, "part")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy(F.col("p_brand").alias("brand"))
            .agg(F.round(_dsum(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("cnt")))


# J5 + W3 — multi-join + top-k (classifier.py:27,46 feature joins, scaled up)
@register("j5_multijoin_topk", """
SELECT o.o_orderkey, c.c_mktsegment AS segment,
       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,12))) AS DOUBLE), 2)
         AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, c.c_mktsegment
ORDER BY revenue DESC, o_orderkey LIMIT 10
""")
def j5(spark, sf):
    c = _t(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'")
    o, li = _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    # join order + explicit broadcast (guide §3.1): customer⨝orders
    # projected to (o_orderkey, c_mktsegment) is the SMALL side (~1/5 of
    # orders after the segment filter, 2 columns); the planner's estimates
    # instead broadcast the much larger lineitem. Early projection keeps
    # the broadcast tiny; the big side is never shuffled. Same inner-join
    # rows, same aggregate — result unchanged.
    co = (c.select("c_custkey", "c_mktsegment")
          .join(o.select("o_custkey", "o_orderkey"),
                c.c_custkey == o.o_custkey)
          .select("o_orderkey", "c_mktsegment"))
    return (li.select("l_orderkey", "l_extendedprice", "l_discount")
            .join(F.broadcast(co), li.l_orderkey == co.o_orderkey)
            .groupBy("o_orderkey", F.col("c_mktsegment").alias("segment"))
            .agg(F.round(_dsum(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10))


# J6 — snowflake hash joins (retrieve_relevant_tables.py:138-232 KB probes)
@register("j6_snowflake_join", """
SELECT r.r_name AS region, count(*) AS orders_cnt,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,12))) AS DOUBLE), 2) AS total
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""")
def j6(spark, sf):
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region"))
            .agg(F.count(F.lit(1)).alias("orders_cnt"),
                 F.round(_dsum("o_totalprice"), 2).alias("total")))


# J7 — semi join (create_feats_labels.py:70-88 exact-schema match)
@register("j7_semi_join", """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
""")
def j7(spark, sf):
    s, li = _t(spark, sf, "supplier"), _t(spark, sf, "lineitem")
    return (s.join(li.filter("l_quantity > 49"),
                   s.s_suppkey == li.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name"))


# J8 — left join preserving unmatched (row_acquisitor.py:1087-1089)
@register("j8_left_join", """
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""")
def j8(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders")))


# T6 — anti join (the orphan-sweep primitive; total_evaluate.py:164 inverse)
@register("anti_join_orphans", """
SELECT p_partkey, p_brand FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
""")
def anti(spark, sf):
    p, li = _t(spark, sf, "part"), _t(spark, sf, "lineitem")
    return (p.join(li, p.p_partkey == li.l_partkey, "left_anti")
            .select("p_partkey", "p_brand"))


# J4/T5 — schema-aligned union merge (row_acquisitor.py:936-960)
@register("j4_union_merge", """
SELECT status, count(*) AS cnt,
       round(CAST(sum(CAST(price AS DECIMAL(38,12))) AS DOUBLE), 2) AS total FROM (
  SELECT o_orderstatus AS status, o_totalprice AS price FROM orders
  WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_orderstatus AS status, o_totalprice AS price FROM orders
  WHERE o_orderpriority = '5-LOW'
) GROUP BY status
""")
def j4(spark, sf):
    o = _t(spark, sf, "orders")
    a = (o.filter("o_orderpriority = '1-URGENT'")
         .select(F.col("o_orderstatus").alias("status"),
                 F.col("o_totalprice").alias("price")))
    b = (o.filter("o_orderpriority = '5-LOW'")
         .select(F.col("o_orderstatus").alias("status"),
                 F.col("o_totalprice").alias("price")))
    return (a.unionByName(b).groupBy("status")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(_dsum("price"), 2).alias("total")))


# J2/W1 — per-key top-k (match_row.py:83-126 heap → window row_number)
@register("j2_topk_per_key", """
SELECT l_orderkey, l_linenumber, price, rk FROM (
  SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price,
         CAST(row_number() OVER (PARTITION BY l_orderkey
              ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT) AS rk
  FROM lineitem) WHERE rk <= 2 AND l_orderkey <= 1000
""")
def j2(spark, sf):
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber"))
    return (li.withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter((F.col("rk") <= 2) & (F.col("l_orderkey") <= 1000))
            .select("l_orderkey", "l_linenumber",
                    F.round("l_extendedprice", 2).alias("price"), "rk"))


# ════════════════════════════════════════════════════════════ aggregations
# A1 — score-sum aggregation = TPC-H Q1 shape
# (retrieve_relevant_values.py:88-102)
@register("a1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE), 2) AS sum_base,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,12))) AS DOUBLE), 2)
         AS sum_disc,
       floor(CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) / count(l_quantity)
             * 10000 + 0.5) / 10000 AS avg_qty,
       count(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def a1(spark, sf):
    return (_t(spark, sf, "lineitem")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(_dsum("l_quantity"), 2).alias("sum_qty"),
                 F.round(_dsum("l_extendedprice"), 2).alias("sum_base"),
                 F.round(_dsum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc"),
                 _r(_dmean("l_quantity"), 4).alias("avg_qty"),
                 F.count(F.lit(1)).alias("cnt")))


# A3 — column statistics profile (construct_index.py:142-197); skew/kurt
# via explicit moments so both engines share the formula
@register("a3_stats_profile", """
WITH mu AS (SELECT l_returnflag AS flag,
            CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) / count(l_quantity) AS m
            FROM lineitem GROUP BY 1)
SELECT flag, mn, mx,
       floor(mean * 10000 + 0.5) / 10000 AS mean,
       floor(m2 * 1000 + 0.5) / 1000 AS variance,
       floor(m3 / pow(m2, 1.5) * 1000 + 0.5) / 1000 AS skew,
       n_distinct
FROM (
  SELECT l.l_returnflag AS flag,
         round(min(l.l_quantity), 2) AS mn,
         round(max(l.l_quantity), 2) AS mx,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(38,12))) AS DOUBLE) / count(l.l_quantity) AS mean,
         CAST(sum(CAST(pow(l.l_quantity - mu.m, 2) AS DECIMAL(38,12))) AS DOUBLE)
           / count(l.l_quantity) AS m2,
         CAST(sum(CAST(pow(l.l_quantity - mu.m, 3) AS DECIMAL(38,12))) AS DOUBLE)
           / count(l.l_quantity) AS m3,
         count(DISTINCT l.l_quantity) AS n_distinct
  FROM lineitem l JOIN mu ON l.l_returnflag = mu.flag
  GROUP BY l.l_returnflag)
""")
def a3(spark, sf):
    li = _t(spark, sf, "lineitem")
    # Two-level aggregation (guide §2.3 "aggregate before you shuffle"):
    # l_quantity has ~50 distinct values per flag, so ONE partial-agg pass
    # to (flag, quantity, n) replaces both full-table passes (the μ scan
    # AND the moments scan with its countDistinct Expand). Exactness: the
    # oracle sums CAST(v AS DECIMAL(38,12)) per ROW; a group contributes
    # n·CAST(v) instead, computed as decimal(25,12)×decimal(12,0) —
    # precision 38, no Spark precision-loss rescale — which is exactly the
    # n-fold decimal sum. pow(q-m, k) is evaluated on the same (q, m)
    # doubles as before, so every group value matches the per-row value,
    # and decimal sums are order-independent. n_distinct = the group count
    # (countDistinct's Expand gone). Oracle hash-verified.
    gq = (li.filter(F.col("l_quantity").isNotNull())
          .groupBy(F.col("l_returnflag").alias("flag"),
                   F.col("l_quantity").alias("q"))
          .agg(F.count(F.lit(1)).alias("nq")))

    def dsum_n(col):
        return F.sum(col.cast("decimal(25,12)")
                     * F.col("nq").cast("decimal(12,0)")).cast("double")

    # μ per flag via a window over the ~150-row grouped frame: a
    # groupBy+self-join would recompute the (unshared) gq subtree twice
    wflag = Window.partitionBy("flag")
    m = (F.sum(F.col("q").cast("decimal(25,12)")
               * F.col("nq").cast("decimal(12,0)")).over(wflag)
         .cast("double") / F.sum("nq").over(wflag))
    j = gq.withColumn("m", m)
    n = F.sum("nq")
    m2 = dsum_n(F.pow(F.col("q") - F.col("m"), 2)) / n
    m3 = dsum_n(F.pow(F.col("q") - F.col("m"), 3)) / n
    return (j.groupBy("flag")
            .agg(F.round(F.min("q"), 2).alias("mn"),
                 F.round(F.max("q"), 2).alias("mx"),
                 _r(dsum_n(F.col("q")) / n, 4).alias("mean"),
                 _r(m2, 3).alias("variance"),
                 _r(m3 / F.pow(m2, 1.5), 3).alias("skew"),
                 F.count(F.lit(1)).alias("n_distinct")))


# A4 — distinct count / unique ratio (retrieve_relevant_tables.py:43-58)
@register("a4_distinct_ratio", """
SELECT n.n_name AS nation, count(DISTINCT c.c_custkey) AS n_cust,
       round(count(DISTINCT c.c_mktsegment) * 1.0 / count(*), 6) AS seg_ratio
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def a4(spark, sf):
    c, n = _t(spark, sf, "customer"), _t(spark, sf, "nation")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.countDistinct("c_custkey").alias("n_cust"),
                 F.round(F.countDistinct("c_mktsegment")
                         / F.count(F.lit(1)), 6).alias("seg_ratio")))


# A5/A6 — mode per group with deterministic tiebreak
# (row_acquisitor.py:545-548, :795)
@register("a5_group_mode", """
SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
  SELECT o_orderstatus, o_orderpriority,
         row_number() OVER (PARTITION BY o_orderstatus
             ORDER BY count(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority) WHERE rn = 1
""")
def a5(spark, sf):
    o = _t(spark, sf, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("c"), F.asc("o_orderpriority"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("mode_priority")))


# A8 — set-overlap ratio (create_feats_labels.py:50-68)
@register("a8_set_overlap", """
WITH seg AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer),
all_seg AS (SELECT count(DISTINCT c_mktsegment) AS total FROM customer)
SELECT s.c_nationkey AS nationkey,
       round(count(*) * 1.0 / max(a.total), 6) AS overlap_ratio
FROM seg s CROSS JOIN all_seg a GROUP BY s.c_nationkey
""")
def a8(spark, sf):
    c = _t(spark, sf, "customer")
    seg = c.select("c_nationkey", "c_mktsegment").distinct()
    total = c.agg(F.countDistinct("c_mktsegment").alias("total"))
    return (seg.crossJoin(F.broadcast(total))
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.round(F.count(F.lit(1)) / F.max("total"), 6)
                 .alias("overlap_ratio")))


# A9 — MinHash signatures, md5-based (construct_index.py:96-100 recast;
# md5 instead of datasketch so DuckDB can verify bit-for-bit)
@register("a9_minhash_signature", """
SELECT doc_id,
       min(md5('p0:' || tok)) AS mh0, min(md5('p1:' || tok)) AS mh1,
       min(md5('p2:' || tok)) AS mh2, min(md5('p3:' || tok)) AS mh3
FROM (SELECT doc_id, unnest(list_distinct(string_split(
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             '\\s+', ' ', 'g')), ' '))) AS tok
      FROM documents)
GROUP BY doc_id
""")
def a9(spark, sf):
    from .ops.dedup import tokens
    d = _t(spark, sf, "documents")
    toks = d.select("doc_id",
                    F.explode(F.array_distinct(tokens("text"))).alias("tok"))
    return toks.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"p{i}:"), F.col("tok"))))
          .alias(f"mh{i}") for i in range(4)])


# ═══════════════════════════════════════════════════ windows / sort / rank
# W2 — rank by aggregated score (retrieve_relevant_values.py:36-48)
@register("w2_rank_topk", """
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price, rk FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(rank() OVER (PARTITION BY o_orderpriority
              ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS BIGINT) AS rk
  FROM orders) WHERE rk <= 3
""")
def w2(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc(F.round("o_totalprice", 2)), F.asc("o_orderkey"))
    return (o.withColumn("rk", F.rank().over(w).cast("bigint"))
            .filter("rk <= 3")
            .select("o_orderpriority", "o_orderkey",
                    F.round("o_totalprice", 2).alias("price"), "rk"))


# W7 — label encoding via dense_rank (row_acquisitor.py:689-701)
@register("w7_label_encode", """
SELECT c_mktsegment,
       CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) AS label
FROM (SELECT DISTINCT c_mktsegment FROM customer)
""")
def w7(spark, sf):
    c = _t(spark, sf, "customer").select("c_mktsegment").distinct()
    w = Window.orderBy("c_mktsegment")
    return c.withColumn("label", F.dense_rank().over(w).cast("bigint"))


# W6-analog — lag/lead adjacency (our engine's turn-context windows)
@register("w6_lag_delta", """
SELECT event_type,
       floor(CAST(sum(CAST(delta AS DECIMAL(38,12))) AS DOUBLE) / count(delta)
             * 10000 + 0.5) / 10000 AS avg_delta,
       count(*) AS cnt FROM (
  SELECT event_type,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS delta
  FROM events) WHERE delta IS NOT NULL
GROUP BY event_type
""")
def w6(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.withColumn("delta", F.col("value") - F.lag("value").over(w))
            .filter("delta is not null")
            .groupBy("event_type")
            .agg(_r(_dmean("delta"), 4).alias("avg_delta"),
                 F.count(F.lit(1)).alias("cnt")))


# ══════════════════════════════════════════════════════════════════ set ops
# T4 — dedup (match_row.py:28)
@register("t4_dedup", """
SELECT l_returnflag, count(*) AS uniq_orders FROM (
  SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem)
GROUP BY l_returnflag
""")
def t4(spark, sf):
    return (_t(spark, sf, "lineitem")
            .select("l_returnflag", "l_orderkey").distinct()
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("uniq_orders")))


# T6 — except (total_evaluate.py:164)
@register("t6_except", """
SELECT n_nationkey FROM nation
WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
  AND n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
""")
def t6(spark, sf):
    n = _t(spark, sf, "nation").select("n_nationkey")
    c = _t(spark, sf, "customer").select(
        F.col("c_nationkey").alias("n_nationkey"))
    s = _t(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey"))
    return (n.join(c, "n_nationkey", "left_semi")
            .join(s, "n_nationkey", "left_anti"))


# A2 — hit-count aggregation (retrieve_relevant_tables.py:451-474)
@register("a2_hit_count", """
SELECT n_name AS nation, count(*) AS hits FROM (
  SELECT DISTINCT o.o_orderkey, n.n_name
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_totalprice > 100000)
GROUP BY n_name
""")
def a2(spark, sf):
    o = _t(spark, sf, "orders").filter("o_totalprice > 100000")
    c, n = _t(spark, sf, "customer"), _t(spark, sf, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select("o_orderkey", "n_name").distinct()
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).alias("hits")))


# A7 — missing-count/ratio stats (create_feats_labels.py:218-219)
@register("a7_missing_ratio", """
SELECT event_type,
       count(*) AS n,
       count(value) AS n_value,
       round(1.0 - count(value) * 1.0 / count(*), 6) AS missing_ratio
FROM events GROUP BY event_type
""")
def a7(spark, sf):
    return (_t(spark, sf, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("value").alias("n_value"),
                 F.round(1.0 - F.count("value") / F.count(F.lit(1)), 6)
                 .alias("missing_ratio")))


# J3 — fuzzy name matching via edit distance
# (retrieve_relevant_tables.py:24-36 fuzzywuzzy ≥80 → levenshtein rank-1)
@register("j3_fuzzy_match", """
SELECT r_name, n_name, dist FROM (
  SELECT r.r_name, n.n_name,
         CAST(levenshtein(lower(r.r_name), lower(n.n_name)) AS BIGINT)
           AS dist,
         row_number() OVER (PARTITION BY r.r_name
             ORDER BY levenshtein(lower(r.r_name), lower(n.n_name)),
                      n.n_name) AS rn
  FROM region r CROSS JOIN nation n) WHERE rn = 1
""")
def j3(spark, sf):
    r, n = _t(spark, sf, "region"), _t(spark, sf, "nation")
    from pyspark.sql import Window as W
    pairs = (r.crossJoin(F.broadcast(n))
             .withColumn("dist",
                         F.levenshtein(F.lower("r_name"), F.lower("n_name"))
                         .cast("bigint")))
    w = W.partitionBy("r_name").orderBy("dist", "n_name")
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").select("r_name", "n_name", "dist"))


# W5 — order columns by missing count (row_acquisitor.py:330-335); here:
# event types ordered by missing-value count
@register("w5_order_by_missing", """
SELECT event_type, n_missing,
       CAST(row_number() OVER (ORDER BY n_missing, event_type) AS BIGINT)
         AS impute_order
FROM (SELECT event_type, count(*) - count(value) AS n_missing
      FROM events GROUP BY event_type)
""")
def w5(spark, sf):
    from pyspark.sql import Window as W
    stats = (_t(spark, sf, "events").groupBy("event_type")
             .agg((F.count(F.lit(1)) - F.count("value"))
                  .alias("n_missing")))
    w = W.orderBy("n_missing", "event_type")
    return stats.withColumn("impute_order",
                            F.row_number().over(w).cast("bigint"))


# T3 — row-set flatten + overlap (create_feats_labels.py:54-68): distinct
# value overlap between two tables' key columns
@register("t3_value_overlap", """
SELECT count(*) AS n_common FROM (
  SELECT DISTINCT l_partkey FROM lineitem
  INTERSECT
  SELECT DISTINCT p_partkey FROM part)
""")
def t3(spark, sf):
    a = _t(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("k")).distinct()
    b = _t(spark, sf, "part").select(
        F.col("p_partkey").alias("k")).distinct()
    return a.intersect(b).agg(F.count(F.lit(1)).alias("n_common"))


# S3 — JSON field extraction (generalFunctions.py:146-155 readJson)
@register("s3_json_extract", """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS cnt
FROM events GROUP BY 1
""")
def s3(spark, sf):
    return (_t(spark, sf, "events")
            .select(F.get_json_object("props", "$.k").cast("bigint")
                    .alias("k"))
            .groupBy("k").agg(F.count(F.lit(1)).alias("cnt")))


# ═══════════════════════════════ flagship: impute-MERGE recast over events
# The MERGE-impute semantics expressed relationally (so DuckDB can verify):
# cells masked by a deterministic md5 rule are recovered from the
# per-(user, event_type) mean of surviving cells — the reference's
# mean-imputation baseline (fill_missing_values.py:48-60) at SQL grain.
@register("impute_mean_merge", """
WITH masked AS (
  SELECT event_id, user_id, event_type, value,
         substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0' AS is_masked
  FROM events),
stats AS (
  SELECT user_id, event_type,
         CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / count(value) AS mean_val
  FROM masked WHERE NOT is_masked GROUP BY user_id, event_type)
SELECT m.event_id,
       floor(CASE WHEN m.is_masked THEN coalesce(s.mean_val, 0.0)
                  ELSE m.value END * 10000 + 0.5) / 10000 AS final_value,
       m.is_masked
FROM masked m LEFT JOIN stats s
  ON m.user_id = s.user_id AND m.event_type = s.event_type
""")
def impute_mean(spark, sf):
    e = _t(spark, sf, "events")
    masked = e.select(
        "event_id", "user_id", "event_type", "value",
        (F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) == "0")
        .alias("is_masked"))
    stats = (masked.filter(~F.col("is_masked"))
             .groupBy("user_id", "event_type")
             .agg(_dmean("value").alias("mean_val")))
    return (masked.join(stats, ["user_id", "event_type"], "left")
            .select("event_id",
                    _r(F.when(F.col("is_masked"),
                              F.coalesce(F.col("mean_val"), F.lit(0.0)))
                       .otherwise(F.col("value")), 4)
                    .alias("final_value"),
                    "is_masked"))


# U6 — imputation method variety (fill_missing_values.py:48-259 dispatches 9
# methods by dtype; estimator.py:146-151 is the dtype→method contract).
# Median is the robust-numeric family: same MERGE shape as impute_mean_merge,
# per-(user, event_type) exact interpolated median of surviving cells.
@register("impute_median_merge", """
WITH masked AS (
  SELECT event_id, user_id, event_type, value,
         substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0' AS is_masked
  FROM events),
stats AS (
  SELECT user_id, event_type, median(value) AS med_val
  FROM masked WHERE NOT is_masked GROUP BY user_id, event_type)
SELECT m.event_id,
       floor(CASE WHEN m.is_masked THEN coalesce(s.med_val, 0.0)
                  ELSE m.value END * 10000 + 0.5) / 10000 AS final_value,
       m.is_masked
FROM masked m LEFT JOIN stats s
  ON m.user_id = s.user_id AND m.event_type = s.event_type
""")
def impute_median(spark, sf):
    e = _t(spark, sf, "events")
    masked = e.select(
        "event_id", "user_id", "event_type", "value",
        (F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) == "0")
        .alias("is_masked"))
    stats = (masked.filter(~F.col("is_masked"))
             .groupBy("user_id", "event_type")
             .agg(F.percentile("value", F.lit(0.5)).alias("med_val")))
    return (masked.join(stats, ["user_id", "event_type"], "left")
            .select("event_id",
                    _r(F.when(F.col("is_masked"),
                              F.coalesce(F.col("med_val"), F.lit(0.0)))
                       .otherwise(F.col("value")), 4)
                    .alias("final_value"),
                    "is_masked"))


# U3 — grouped applyInPandas estimation fallback (engine.estimate): per-user
# ffill→bfill of masked values under stable (ts, event_id) ordering. The
# oracle expresses the same semantics with IGNORE NULLS window frames.
# Reference: the per-table imputation loop, row_acquisitor.py:282-405.
@register("u3_group_ffill", """
WITH masked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
              THEN NULL ELSE value END AS vm
  FROM events)
SELECT event_id,
       round(coalesce(vm,
             last_value(vm IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             first_value(vm IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
             4) AS filled
FROM masked
""")
def u3_ffill(spark, sf):
    from .estimate import group_ffill
    e = _t(spark, sf, "events")
    masked = e.select(
        "event_id", "user_id", "ts",
        F.when(F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
               == "0", F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("vm"))
    filled = group_ffill(masked, group_cols=("user_id",),
                         order_cols=("ts", "event_id"), fill_cols=("vm",))
    return filled.select("event_id", F.round("vm", 4).alias("filled"))


# P6 — stats-driven sparse-column prune (row_acquisitor.py:739-743,
# fill_missing_values.py:89-100): per-column non-null ratios decide survival.
# A deterministic md5 mask makes `value` 93.75% null, so it must be dropped.
@register("p6_sparse_prune", """
WITH masked AS (
  SELECT event_id, user_id,
         CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) != 'f'
              THEN NULL ELSE value END AS value
  FROM events)
SELECT 'event_id' AS column_name,
       round(count(event_id) * 1.0 / count(*), 6) AS non_null_ratio,
       CAST(count(event_id) * 1.0 / count(*) >= 0.2 AS INT) AS kept
FROM masked
UNION ALL SELECT 'user_id', round(count(user_id) * 1.0 / count(*), 6),
       CAST(count(user_id) * 1.0 / count(*) >= 0.2 AS INT) FROM masked
UNION ALL SELECT 'value', round(count(value) * 1.0 / count(*), 6),
       CAST(count(value) * 1.0 / count(*) >= 0.2 AS INT) FROM masked
""")
def p6_sparse(spark, sf):
    from .estimate import column_null_profile
    e = _t(spark, sf, "events")
    masked = e.select(
        "event_id", "user_id",
        F.when(F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
               != "f", F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("value"))
    prof = column_null_profile(masked)
    return prof.select("column_name", "non_null_ratio",
                       (F.col("non_null_ratio") >= 0.2).cast("int")
                       .alias("kept"))


# W4 — top-k tables by hit count (retrieve_relevant_tables.py:477):
# rank candidate "tables" (brands) by how many probes (lineitems) hit them.
@register("w4_topk_by_hits", """
SELECT p.p_brand AS brand, count(*) AS hits FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY hits DESC, brand LIMIT 10
""")
def w4_topk(spark, sf):
    li, p = _t(spark, sf, "lineitem"), _t(spark, sf, "part")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy(F.col("p_brand").alias("brand"))
            .agg(F.count(F.lit(1)).alias("hits"))
            .orderBy(F.desc("hits"), F.asc("brand")).limit(10))


# U9 — generalized FD check: det → dep holds iff
# countDistinct(det) == countDistinct(det, dep) (the reference mines these
# with a Metanome subprocess, codes/fd_tools/generate_fds.py:62-72; here it
# is one aggregation pass — pure SQL, no JVM sidecar).
@register("u9_fd_check", """
WITH m AS (SELECT
    count(DISTINCT o_orderkey) AS d1,
    (SELECT count(*) FROM (SELECT DISTINCT o_orderkey, o_custkey
                           FROM orders)) AS p1,
    count(DISTINCT o_custkey) AS d2,
    (SELECT count(*) FROM (SELECT DISTINCT o_custkey, o_orderpriority
                           FROM orders)) AS p2,
    (SELECT count(*) FROM (SELECT DISTINCT o_orderkey, o_totalprice
                           FROM orders)) AS p3
  FROM orders)
SELECT 'o_orderkey' AS det, 'o_custkey' AS dep, d1 AS n_det, p1 AS n_pair,
       CAST(d1 = p1 AS INT) AS holds FROM m
UNION ALL SELECT 'o_custkey', 'o_orderpriority', d2, p2,
       CAST(d2 = p2 AS INT) FROM m
UNION ALL SELECT 'o_orderkey', 'o_totalprice', d1, p3,
       CAST(d1 = p3 AS INT) FROM m
""")
def u9_fd(spark, sf):
    o = _t(spark, sf, "orders")
    m = o.agg(
        F.countDistinct("o_orderkey").alias("d1"),
        F.countDistinct("o_orderkey", "o_custkey").alias("p1"),
        F.countDistinct("o_custkey").alias("d2"),
        F.countDistinct("o_custkey", "o_orderpriority").alias("p2"),
        F.countDistinct("o_orderkey", "o_totalprice").alias("p3"))
    fds = F.array(
        F.struct(F.lit("o_orderkey").alias("det"),
                 F.lit("o_custkey").alias("dep"),
                 F.col("d1").alias("n_det"), F.col("p1").alias("n_pair")),
        F.struct(F.lit("o_custkey").alias("det"),
                 F.lit("o_orderpriority").alias("dep"),
                 F.col("d2").alias("n_det"), F.col("p2").alias("n_pair")),
        F.struct(F.lit("o_orderkey").alias("det"),
                 F.lit("o_totalprice").alias("dep"),
                 F.col("d1").alias("n_det"), F.col("p3").alias("n_pair")))
    return (m.select(F.explode(fds).alias("f"))
            .select("f.det", "f.dep", "f.n_det", "f.n_pair",
                    (F.col("f.n_det") == F.col("f.n_pair")).cast("int")
                    .alias("holds")))
