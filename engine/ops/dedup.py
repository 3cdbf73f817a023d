"""Deduplication operators for a training-data lake.

Reference analogs: value-set Jaccard via MinHash-LSH
(``codes/search/construct_index.py:87-140``), q-gram Jaccard string similarity
(``codes/utils/match_row.py:45-51``), dedup-before-expensive-op
(``match_row.py:28``). Promoted here from per-column index probes to
document-grain dedup over the whole corpus, expressed so Catalyst keeps every
stage a hash shuffle or broadcast join — no per-row Python anywhere; the only
UDF (SimHash) is Arrow-vectorized numpy.

Scale notes (100 TB): the shingle explode is the big intermediate — it is
immediately re-aggregated (map-side partial min for MinHash), so the shuffle
carries only |docs| × num_perm rows. Candidate pairs come from band-bucket
equi-joins (never a cross join); exact Jaccard verification touches only
candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

NORMALIZE = r"[^a-z0-9 ]"


def normalized_text(col: str = "text"):
    """Reference string canonicalization (generalFunctions.py:44-56):
    lower → strip non-alnum → collapse whitespace → trim."""
    c = F.lower(F.col(col))
    c = F.regexp_replace(c, NORMALIZE, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(col: str = "text"):
    return F.split(normalized_text(col), " ")


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition an UNDER-partitioned frame across the session's
    cores (guide §2.5: a single-file corpus is an unsplittable input whose
    scan — and everything pipelined into it, e.g. the 16-permutation
    MinHash md5s — runs as ONE task). Keyed repartition, so no
    sort-before-repartition pass and deterministic placement; a
    well-partitioned corpus at scale is left alone."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        n = par
    return df.repartition(par, key) if n < par else df


# ------------------------------------------------------------------ exact
def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the lowest id per identical normalized text. Hash-groupBy: one
    shuffle on a fixed-width digest rather than the full text bytes."""
    return (docs
            .withColumn("text_hash", F.md5(normalized_text(text_col)))
            .groupBy("text_hash")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("dup_count")))


# ------------------------------------------------------------- ngram jaccard
def char_qgrams(col, q: int = 2):
    """Character q-grams of the normalized string — the reference's literal
    T1 similarity unit (``codes/utils/match_row.py:45-51`` uses character
    2-grams via nltk.ngrams). Guarded for strings shorter than q (Spark's
    sequence(1,0) would count DOWN)."""
    norm = normalized_text(col) if isinstance(col, str) else col
    return F.when(
        F.length(norm) >= q,
        F.transform(F.sequence(F.lit(1), F.length(norm) - (q - 1)),
                    lambda i: F.substring(norm, i, q))
    ).otherwise(F.array().cast("array<string>"))


def token_jaccard_pairs(docs: DataFrame, threshold: float = 0.6,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        n: int = 1,
                        stop_df_ratio: float = 0.01,
                        stop_df_min: int = 64,
                        unit: str = "token") -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via an inverted-index join
    (explode → self-equi-join on gram → count ∩ → |A∪B| from per-doc sizes).
    Never materializes the doc×doc cross product; the join key is the gram,
    so common-gram skew is bounded by dropping ultra-frequent grams
    (document frequency > max(stop_df_ratio × corpus, stop_df_min)) BEFORE
    the self-join — standard stop-gram pruning: one hot token ("the") would
    otherwise make the gram join quadratic in matching docs (the reference's
    >10k-row pre-filter plays the same role,
    ``codes/search/retrieve_relevant_values.py:197-198``). Jaccard is then
    computed over the pruned gram universe on BOTH sides of the ratio, so
    results stay internally consistent (and oracle-mirrorable); set
    ``stop_df_ratio=1.0`` with a huge ``stop_df_min`` for exact semantics on
    small corpora.

    ``unit="char"`` switches to character q-grams of length ``n`` (the
    reference's T1 unit, match_row.py:45-51) — meant for SHORT strings (cell
    values, titles): with a ~1.3k-gram alphabet at q=2 every gram is hot, so
    stop-gram pruning should be disabled there and the input pre-deduped
    (the reference compares cell values, not whole documents)."""
    if unit == "char":
        base = docs.select(F.col(id_col).alias("id"),
                           char_qgrams(text_col, q=max(2, n)).alias("toks"))
    else:
        base = docs.select(F.col(id_col).alias("id"),
                           tokens(text_col).alias("toks"))
        if n > 1:
            base = base.withColumn(
                "toks",
                F.expr(f"transform(sequence(1, greatest(size(toks) - {n - 1},"
                       f" 0)), i -> array_join(slice(toks, i, {n}), ' '))"))
    # the exploded gram set feeds FOUR consumers below (hot-gram counts,
    # per-doc sizes, and both sides of the inverted-index self-join);
    # Catalyst has no cross-branch subtree reuse, so without a persist the
    # tokenize+explode pipeline re-scans the corpus once per consumer —
    # 4 full text passes collapsed to 1 (guide §2.4: remove repeated work
    # feeding one dataflow). MEMORY_AND_DISK: at corpus scale the gram set
    # spills rather than re-tokenizing.
    from pyspark import StorageLevel
    grams = _spread(base, "id") \
        .select("id", F.explode(F.array_distinct("toks")).alias("g")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    # stop-gram pruning: hot grams are FEW by construction (high-df), so the
    # anti-join side broadcasts; the corpus count rides a broadcast too,
    # keeping the whole plan one lazy dataflow
    ndocs = docs.select(F.count(F.lit(1)).alias("__nd"))
    hot = (grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
           .crossJoin(F.broadcast(ndocs))
           .filter(F.col("__df") > F.greatest(
               F.col("__nd") * F.lit(stop_df_ratio),
               F.lit(float(stop_df_min))))
           .select("g"))
    grams = grams.join(F.broadcast(hot), "g", "left_anti")
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (a.join(b, (F.col("a.g") == F.col("b.g"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("common")))
    out = (inter
           .join(sizes.withColumnRenamed("id", "id_a")
                 .withColumnRenamed("sz", "sz_a"), "id_a")
           .join(sizes.withColumnRenamed("id", "id_b")
                 .withColumnRenamed("sz", "sz_b"), "id_b")
           .withColumn("jaccard",
                       F.col("common")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))
    return out


# ------------------------------------------------------------------ minhash
def minhash_signatures(docs: DataFrame, num_perm: int = 16,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """MinHash over the token set: sig_i = min(md5(i || token)).

    md5-as-permutation matches the reference's datasketch MinHash update
    (``construct_index.py:96-100``) in spirit and — unlike xxhash64 — has an
    exact DuckDB equivalent, so the driver oracle can verify it.

    Shape (r7): ``array_min(transform(toks, t -> md5(...)))`` per PERMUTATION
    on the one-row-per-doc token array — a pure narrow projection. The
    explode → ``groupBy(id).agg(min(...))`` form it replaces planned as a
    SortAggregate (min over var-length strings has no mutable HashAggregate
    buffer) with a |doc×token|-row exchange; the array form computes the
    same mins with NO shuffle and no sort. A null token array (null text)
    is filtered out, matching explode's drop of null/empty arrays."""
    base = docs.select(F.col(id_col).alias("id"),
                       F.array_distinct(tokens(text_col)).alias("toks")) \
        .filter(F.col("toks").isNotNull())
    return base.select("id", *_sig_cols(num_perm))


def _sig_cols(num_perm: int):
    """MinHash signature columns over a distinct-token array column ``toks``:
    sig_i = min over tokens of md5('p<i>:' || token), as array_min of a
    transform — narrow, shuffle-free, byte-identical to the exploded
    min-aggregate (md5 is never null; array_min and min() both skip nulls).

    The per-permutation hasher MUST be a one-parameter lambda: pyspark's
    ``transform`` treats a two-parameter callable as (element, index), so a
    ``lambda t, i=i`` default-arg closure silently receives the array-index
    Column as ``i`` and hashes a stringified Column into the prefix."""
    def perm_hash(i: int):
        return lambda t: F.md5(F.concat(F.lit(f"p{i}:"), t))
    return [F.array_min(F.transform("toks", perm_hash(i))).alias(f"mh{i}")
            for i in range(num_perm)]


def minhash_lsh_pairs(docs: DataFrame, num_perm: int = 16, bands: int = 4,
                      threshold: float = 0.5,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      max_bucket: int | None = 64) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band bucket become candidate
    pairs; candidates are verified with exact token Jaccard. This is the
    reference's LSH-Ensemble probe (``construct_index.py:128-140``) recast as
    two equi-joins — index build and query collapse into one self-join.

    ``max_bucket`` drops degenerate buckets (> that many members): a bucket
    of b docs yields b² candidate pairs, so one hot bucket of boilerplate
    dwarfs everything else — the classic LSH skew. True near-dups inside a
    dropped bucket are still found through their other (more selective)
    bands. Set None to disable (exact candidate recall).

    Plan shape (r7): ONE linear dataflow — scan → tokenize → per-row
    signature map (``array_min(transform(...))``, no explode, no
    SortAggregate — see ``minhash_signatures``) → band explode → one
    (band, bucket) exchange → window count drops degenerate buckets
    (bounded memory: a hot bucket spills in the window sort instead of
    materializing in an agg buffer) → ``collect_list`` of the ≤max_bucket
    (id, toks) members per surviving bucket → i<j pairs AND their exact
    token-Jaccard verification generated inline with array transforms
    (``array_intersect`` is the same |A∩B| integer the old
    candidate ⨝ grams(a) ⨝ grams(b) → count shape produced) → threshold
    filter → distinct. This replaces the previous bucket self-join + two
    verification joins against a persisted token frame: the corpus was
    tokenized once per plan branch (the sig aggregation ran on BOTH
    self-join sides) and the persist raced its own materialization across
    AQE's concurrent stages. Carrying ``toks`` through the single
    exchange ships each token array ``bands`` times — the same bytes the
    two verification joins shuffled, now with no second full pass, no
    cache, and ~3 fewer exchanges. A pair sharing several buckets is
    verified once per shared bucket (duplicate rows collapsed by the
    final distinct) — bounded by ``bands``, the trade for dropping the
    candidate-distinct exchange before verification. With
    ``max_bucket=None`` (exact recall, opt-in) the per-bucket collect is
    unbounded — the documented trade for that mode."""
    rows = num_perm // bands
    base = _spread(docs.select(F.col(id_col).alias("id"),
                               F.array_distinct(tokens(text_col))
                               .alias("toks")), "id") \
        .filter(F.col("toks").isNotNull())
    # one nested-transform expression instead of num_perm named columns
    # (plan/codegen size: 16 array_min subtrees collapse to one);
    # md5('p' || i || ':' || t) is byte-identical to the f"p{i}:" prefix,
    # verified cell-exact against _sig_cols
    sigs = base.select("id", "toks", F.expr(
        f"transform(sequence(0, {num_perm - 1}), i -> "
        "array_min(transform(toks, t -> "
        "md5(concat('p', cast(i as string), ':', t)))))").alias("sigarr"))
    buckets = (sigs
               .select("id", "toks",
                       F.explode(F.expr(
                           f"transform(sequence(0, {bands - 1}), b -> "
                           f"named_struct('band', b, 'bucket', "
                           f"md5(array_join(slice(sigarr, b * {rows} + 1, "
                           f"{rows}), '|'))))")).alias("bb"))
               .select("id", "toks", "bb.band", "bb.bucket"))
    if max_bucket is not None:
        w = Window.partitionBy("band", "bucket")
        buckets = (buckets
                   .withColumn("__n", F.count(F.lit(1)).over(w))
                   .filter(F.col("__n") <= max_bucket)
                   .drop("__n"))
    grouped = (buckets.groupBy("band", "bucket")
               .agg(F.sort_array(F.collect_list(F.struct("id", "toks")))
                    .alias("members")))
    # members is sorted by id (unique within a bucket), so i<j gives
    # id_a < id_b; each pair is verified in place over its own arrays
    pair_expr = F.expr(
        "flatten(transform(members, (a, i) -> "
        "transform(slice(members, i + 2, size(members)), b -> "
        "named_struct('id_a', a.id, 'id_b', b.id, "
        "'common', size(array_intersect(a.toks, b.toks)), "
        "'sz_a', size(a.toks), 'sz_b', size(b.toks)))))")
    pairs = (grouped.select(F.explode(pair_expr).alias("p"))
             .select("p.id_a", "p.id_b", "p.common", "p.sz_a", "p.sz_b"))
    return (pairs
            .withColumn("jaccard",
                        F.col("common")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
            .distinct())


# ------------------------------------------------------------------ simhash
# token → md5-hash memo, shared across Arrow batches within a Python worker:
# Zipf corpora re-see the same tokens constantly, and the per-token md5 call
# (not the bit math) is the per-byte cost. Bounded to keep workers lean.
_SIMHASH_MEMO: dict[str, int] = {}
_SIMHASH_MEMO_MAX = 1 << 20


def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over a whole Arrow batch, vectorized: tokens are
    factorized (C-level) so md5 runs ONCE per distinct token (memoized
    across batches), hashes fan back out with one gather, and the bit-vote
    is 64 segmented sums over uint32 halves (1-D ``np.add.reduceat`` — the
    2-D/unpackbits paths measure 10-60× slower here). No per-token Python
    in the hot path. Token hash = LE(first 8 md5 bytes), identical to
    DuckDB's md5_number_upper, so the SQL oracle replays it exactly."""
    import hashlib
    out = np.zeros(len(texts), dtype=np.int64)
    flat: list[str] = []
    starts: list[int] = []
    lens: list[int] = []
    rows: list[int] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = str(t).lower().split()
        if not toks:
            continue
        rows.append(i)
        starts.append(len(flat))
        lens.append(len(toks))
        flat.extend(toks)
    if not flat:
        return pd.Series(out)
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    memo = _SIMHASH_MEMO
    if len(memo) > _SIMHASH_MEMO_MAX:
        memo.clear()
    md5 = hashlib.md5
    uniq_hash = np.empty(len(uniq), dtype=np.uint64)
    for j, u in enumerate(uniq):
        h = memo.get(u)
        if h is None:
            h = int.from_bytes(md5(u.encode()).digest()[:8], "little")
            memo[u] = h
        uniq_hash[j] = h
    hs = uniq_hash[codes]
    starts_a = np.asarray(starts, dtype=np.int64)
    rows_a = np.asarray(rows, dtype=np.int64)
    ones = np.empty((len(rows_a), 64), dtype=np.int64)
    halves = ((hs & np.uint64(0xFFFFFFFF)).astype(np.uint32),
              (hs >> np.uint64(32)).astype(np.uint32))
    for h_i, arr in enumerate(halves):
        for k in range(32):
            b = (arr >> np.uint32(k)) & np.uint32(1)
            ones[:, 32 * h_i + k] = np.add.reduceat(b, starts_a,
                                                    dtype=np.int64)
    votes_positive = 2 * ones > np.asarray(lens, dtype=np.int64)[:, None]
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    sims = (votes_positive.astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64)
    out[rows_a] = sims.view(np.int64)
    return pd.Series(out)


_simhash64 = pandas_udf(LongType())(_simhash64_batch)


def simhash_dedup(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates = docs sharing the SimHash top-``prefix_bits``
    prefix (one blocking pass; full multi-probe Hamming search would rotate
    the blocks). Spark-only op: driver records a rows-only check."""
    sigs = docs.select(F.col(id_col).alias("id"),
                       _simhash64(F.col(text_col)).alias("sim"))
    block = F.shiftrightunsigned(F.col("sim"), 64 - prefix_bits)
    return (sigs.withColumn("block", block)
            .groupBy("block")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("id").alias("keep_id"))
            .filter(F.col("n") > 1))


# -------------------------------------------------------------- embedding dup
def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            exact: bool = False,
                            num_planes: int = 8, tables: int = 4,
                            seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs. Default is LSH-bucketed: candidates
    come from random-hyperplane bucket equi-joins
    (``engine.ops.similarity.lsh_bucket``, one bucket column per hash
    table), exact cosine verifies candidates only — never a cross join, so
    the pair space is O(Σ bucket²) not O(n²). Recall vs the exact path is
    pytest-asserted (tests/test_ops.py); more ``tables`` buys recall without
    touching per-table bucket sizes.

    ``exact=True`` is the all-pairs baseline (and the DuckDB-oracle path at
    sf0.01): a self-join on id_a < id_b — O(n²), opt-in only. Cosine is pure
    Spark SQL (zip_with + aggregate) — stays in codegen, no UDF."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        from .similarity import lsh_bucket
        ba = lsh_bucket(emb.select(F.col(id_col).alias("id_a"),
                                   F.col(vec_col).alias("va")),
                        num_planes=num_planes, seed=seed, tables=tables,
                        vec_col="va")
        bb = lsh_bucket(emb.select(F.col(id_col).alias("id_b"),
                                   F.col(vec_col).alias("vb")),
                        num_planes=num_planes, seed=seed, tables=tables,
                        vec_col="vb")
        cands = None
        for t in range(tables):
            c = (ba.select("id_a", "va", f"bucket_{t}")
                 .join(bb.select("id_b", "vb", f"bucket_{t}"),
                       f"bucket_{t}")
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "va", "id_b", "vb"))
            cands = c if cands is None else cands.unionByName(c)
        pairs = cands.dropDuplicates(["id_a", "id_b"])
    cos = _cosine(F.col("va"), F.col("vb"))
    return (pairs.withColumn("cosine", F.round(cos, 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def _cosine(va, vb):
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)
