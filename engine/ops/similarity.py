"""Similarity search over an embedding column (``array<float>``).

Reference analog: the HNSW kNN probe over column-profile vectors
(``codes/search/construct_index.py:386-414`` — L2, M=16, ef=200) intersected
with LSH results (``construct_index.py:284-313``). Recast: brute-force cosine
top-k is the exact baseline (pure Spark SQL — zip_with dot products inside
codegen, window top-k); random-hyperplane LSH bucketing is the scale path
(candidates only from matching buckets, multi-probe across all tables of
hyperplanes).

Scale: brute force is O(|Q|·|C|) — fine for |Q| small (reference probes one
column at a time); the LSH path makes |C| per-bucket. Hyperplanes are
deterministic md5-derived doubles (``lsh_plane_matrix``), so results are
identical across parallelism levels AND replayable by the DuckDB oracle
(the plane components embed in SQL as exact literals).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .dedup import _cosine


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query. queries is the small side (broadcast);
    scoring is zip_with/aggregate — wholestage-codegen'd, no Python.

    Per-side norms are computed ONCE per vector before the pair join (r7):
    cosine = dot/(‖q‖·‖c‖) re-derived ‖q‖ and ‖c‖ per PAIR, tripling the
    arithmetic; hoisting them is the same float64 sqrt(Σx²) value, so every
    cosine is bit-identical. The corpus side is also spread across the
    session's cores first — a single-file corpus scans as ONE task (an
    unsplittable input, guide §2.5), serializing every dot product."""
    par = queries.sparkSession.sparkContext.defaultParallelism
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv")) \
        .withColumn("qn", _norm(F.col("qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    try:
        nparts = corpus.rdd.getNumPartitions()
    except Exception:
        nparts = par
    if nparts < par:
        # only when under-partitioned: a well-partitioned corpus at scale
        # must not pay a full vector shuffle for nothing
        c = c.repartition(par, "neighbor_id")
    c = c.withColumn("cn", _norm(F.col("cv")))
    dot = F.aggregate(F.zip_with(F.col("qv"), F.col("cv"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          F.round(dot / (F.col("qn") * F.col("cn")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rk"))


def lsh_plane_matrix(num_planes: int, seed: int, table: int,
                     dim: int) -> np.ndarray:
    """Deterministic hyperplanes with an SQL twin: component (p, d) is an
    md5-derived uniform in [-1, 1) — u64 = LE(first 8 md5 bytes of
    'lshplane:{seed}:{table}:{p}:{d}'), v = u64/2^63 - 1 — the same
    byte-hash identity (DuckDB ``md5_number_upper``) the simhash/winnow
    oracles replay. The doubles round-trip exactly through ``repr``, so the
    DuckDB oracle embeds them as literals and reproduces every bucket bit
    (uniform-cube directions instead of gaussian: recall is pytest-asserted
    unchanged)."""
    import hashlib
    vals = np.empty((num_planes, dim))
    for p in range(num_planes):
        for d in range(dim):
            key = f"lshplane:{seed}:{table}:{p}:{d}".encode()
            u = int.from_bytes(hashlib.md5(key).digest()[:8], "little")
            vals[p, d] = u / 2.0 ** 63 - 1.0
    return vals


def _make_bucket_udf(num_planes: int, seed: int, table: int,
                     dim: int | None = None):
    planes_box: dict = {}
    if dim is not None:
        planes_box[dim] = lsh_plane_matrix(num_planes, seed, table, dim)

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())              # (rows, dim)
        d = m.shape[1]
        if d not in planes_box:
            # planes derived lazily from the batch's width: deterministic
            # (hash-keyed), identical on every executor/batch — no plumbing
            planes_box[d] = lsh_plane_matrix(num_planes, seed, table, d)
        # float64 throughout: the SQL oracle computes the same dot in double
        bits = (m.astype(np.float64) @ planes_box[d].T) > 0  # (rows, planes)
        weights = (1 << np.arange(num_planes)).astype(np.int64)
        return pd.Series(bits.astype(np.int64) @ weights)

    return bucket


def lsh_bucket(emb: DataFrame, num_planes: int = 8, dim: int | None = None,
               seed: int = 42, tables: int = 2,
               vec_col: str = "embedding") -> DataFrame:
    """Attach ``tables`` random-hyperplane bucket ids; near vectors collide in
    at least one table with high probability. One vectorized matrix multiply
    per Arrow batch; ``dim`` is optional (inferred per batch)."""
    out = emb
    for t in range(tables):
        out = out.withColumn(f"bucket_{t}",
                             _make_bucket_udf(num_planes, seed, t, dim)(
                                 F.col(vec_col)))
    return out


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             num_planes: int = 8, dim: int = 16, seed: int = 42,
             tables: int = 2, multiprobe: bool = True,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: candidates = union over hash tables of same-bucket corpus
    vectors (equi-join per table — never a cross join), then exact cosine +
    window top-k over candidates only.

    ``multiprobe`` additionally probes every Hamming-1 neighbor bucket of the
    query's bucket (flip one hyperplane sign) — ×(num_planes+1) probes on the
    tiny query side buys most of the recall an extra hash table would,
    without re-hashing the corpus (the big side is untouched)."""
    qb = lsh_bucket(queries, num_planes, dim, seed, tables, vec_col) \
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                *[F.col(f"bucket_{t}") for t in range(tables)])
    cb = lsh_bucket(corpus, num_planes, dim, seed, tables, vec_col) \
        .select(F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
                *[F.col(f"bucket_{t}") for t in range(tables)])
    cands = None
    for t in range(tables):
        q_t = qb.select("query_id", "qv", f"bucket_{t}")
        if multiprobe:
            probes = F.array(F.col(f"bucket_{t}"),
                             *[F.col(f"bucket_{t}").bitwiseXOR(1 << b)
                               for b in range(num_planes)])
            q_t = (q_t.select("query_id", "qv",
                              F.explode(probes).alias(f"bucket_{t}")))
        c = (F.broadcast(q_t)
             .join(cb.select("neighbor_id", "cv", f"bucket_{t}"),
                   f"bucket_{t}")
             .select("query_id", "qv", "neighbor_id", "cv"))
        cands = c if cands is None else cands.unionByName(c)
    cands = (cands.dropDuplicates(["query_id", "neighbor_id"])
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("cosine",
                         F.round(_cosine(F.col("qv"), F.col("cv")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (cands.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rk"))
