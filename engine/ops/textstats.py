"""Text analysis for training-data curation: language ID, quality scoring,
token counting, document fingerprinting.

Reference analogs: column type profiling via textual-cell ratios
(``codes/utils/generalFunctions.py:22-39``), char-length statistics
(``codes/search/construct_index.py:181-183``), string canonicalization
(``generalFunctions.py:44-56``). All pure Spark SQL (wholestage codegen);
the winnowing fingerprint is the one Arrow-vectorized UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .dedup import normalized_text, tokens

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pour", "que", "dans", "une"],
    "es": ["el", "la", "los", "que", "de", "es", "para", "con", "por", "una"],
}


def token_count(col: str = "text"):
    """Whitespace tokenization count; a BPE-ish proxy adds subword splits at
    alpha/digit boundaries (regexp below) — both are O(len) string ops."""
    return F.size(tokens(col))


def bpe_ish_count(col: str = "text"):
    # split camelCase / alnum boundaries before counting: a cheap proxy for
    # subword token counts used to budget training sequence lengths
    pre = F.regexp_replace(F.col(col), r"([a-z])([A-Z])", r"$1 $2")
    pre = F.regexp_replace(pre, r"([A-Za-z])([0-9])", r"$1 $2")
    pre = F.regexp_replace(pre, r"([0-9])([A-Za-z])", r"$1 $2")
    return F.size(F.split(F.trim(F.regexp_replace(pre, r"\s+", " ")), " "))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + a composite score
    in [0,1]. Used as a pre-training filter predicate."""
    length = F.length(F.col(text_col))
    punct = (F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
             / F.greatest(length, F.lit(1)))
    upper = (F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", ""))
             / F.greatest(length, F.lit(1)))
    toks = tokens(text_col)
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = (F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
                  / F.greatest(F.size(toks), F.lit(1)))
    score = (F.when(length < 10, 0.0)
             .otherwise(
                 F.least(F.lit(1.0), length / F.lit(500.0)) * 0.4
                 + (1 - F.least(punct * 5, F.lit(1.0))) * 0.3
                 + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3))
    return docs.withColumn("n_chars_q", length) \
        .withColumn("punct_ratio", F.round(punct, 6)) \
        .withColumn("upper_ratio", F.round(upper, 6)) \
        .withColumn("stop_ratio", F.round(stop_ratio, 6)) \
        .withColumn("quality", F.round(score, 6))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit-count language ID: argmax over per-language stopword hits
    with deterministic ties (language name DESC — reverse(array_sort)[0]
    sorts ascending on (hits, lang) and takes the last element, so equal hit
    counts resolve to the lexicographically larger language; the DuckDB
    oracle mirrors exactly this). n-gram-free heuristic that is exactly
    SQL-expressible."""
    toks = tokens(text_col)
    scores = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
                     .alias("hits"),
                     F.lit(lang).alias("lang")))
    best = F.reverse(F.array_sort(F.array(*scores)))[0]
    return docs.withColumn("lang_pred",
                           F.when(best["hits"] > 0, best["lang"])
                           .otherwise(F.lit("unknown"))) \
               .withColumn("lang_hits", best["hits"])


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact document fingerprint: md5 of normalized text (cross-engine)."""
    return docs.withColumn("fp", F.md5(normalized_text(text_col)))


_WINNOW_K, _WINNOW_W = 5, 8
_WINNOW_CAP = 4096          # bytes per doc — bounds batch memory
_WINNOW_CHUNK = 1 << 23     # concatenated bytes per vectorized sub-batch


def _sliding_min(h: np.ndarray, W: int) -> np.ndarray:
    """Width-W sliding minimum in ⌈log₂ W⌉ contiguous ``np.minimum`` passes
    (sparse-table doubling; min is idempotent so the final step may overlap).
    ~8× faster than ``sliding_window_view(h, W).min(axis=1)``, whose strided
    2-D reduction defeats SIMD."""
    m, width, L = h, 1, len(h)
    while width * 2 <= W:
        m = np.minimum(m[:-width or None], m[width:])
        width *= 2
    out_len = L - W + 1
    if width < W:
        m = np.minimum(m[:out_len], m[W - width:W - width + out_len])
    return m[:out_len]


def _winnow_batch(bufs: list[bytes],
                  char_ok: np.ndarray | None = None) -> np.ndarray:
    """Winnowing fingerprints for one list of (already truncated) byte
    strings, fully vectorized: ONE concatenated numpy pass over the whole
    batch with starts/lens bookkeeping — the same shape as
    ``engine.ops.dedup._simhash64_batch`` (no per-document Python loop).

    Steps: concatenate → global k-gram polynomial rolling hash (K shifted
    fused multiply-adds) → global width-W sliding minimum → per-doc segment
    XOR via prefix-xor gather (windows crossing document boundaries are
    simply never gathered — the bookkeeping masks them out).

    All arithmetic is int64, not uint64: the K=5 base-257 hash tops out
    below 2⁴¹ so signed math is exact and bit-identical — and this host's
    numpy runs uint64 multiply/minimum ~7-10× slower than int64 (measured;
    the dtype alone was most of the old path's cost)."""
    K, W = _WINNOW_K, _WINNOW_W
    n = len(bufs)
    out = np.zeros(n, dtype=np.int64)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    keep = lens >= K            # shorter docs fingerprint to 0
    if char_ok is not None:
        # historical gate is CHARACTER count ≥ K (== byte count on ASCII;
        # a multi-byte doc with <K chars but ≥K bytes still fingerprints 0)
        keep &= char_ok
    if not keep.any():
        return out
    big = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    L = len(big) - K + 1        # global k-gram hash count
    h = np.zeros(L, dtype=np.int64)
    for j in range(K):
        h = h * 257 + big[j:L + j]
    # per-doc valid hash range: [offs[i], offs[i] + hc) with hc = len-K+1
    hs = offs[:-1][keep]
    hc = (lens - K + 1)[keep]
    # prefix-xor tables: segment xor = px[end] ^ px[start] (one C pass each,
    # instead of one reduce call per document)
    long = hc >= W
    res = np.zeros(len(hs), dtype=np.int64)
    if long.any():
        smin = _sliding_min(h, W)
        pxm = np.zeros(len(smin) + 1, dtype=np.int64)
        np.bitwise_xor.accumulate(smin, out=pxm[1:])
        s, c = hs[long], hc[long]
        res[long] = pxm[s + c - W + 1] ^ pxm[s]
    if (~long).any():           # doc has < W k-grams: xor of the raw hashes
        pxh = np.zeros(L + 1, dtype=np.int64)
        np.bitwise_xor.accumulate(h, out=pxh[1:])
        s, c = hs[~long], hc[~long]
        res[~long] = pxh[s + c] ^ pxh[s]
    out[keep] = res
    return out


@pandas_udf(LongType())
def _winnow_udf(texts: pd.Series) -> pd.Series:
    """Winnowing fingerprint (Schleimer et al. 2003): min rolling hash over
    windows of k-gram hashes → one 64-bit doc signature. The Arrow batch is
    processed in concatenated sub-batches of ≤ _WINNOW_CHUNK bytes so the
    temporaries (uint64 code/hash arrays, ~24 B per input byte) stay bounded
    regardless of Arrow batch sizing."""
    strs = [("" if t is None else str(t).lower()) for t in texts]
    bufs = [s.encode("utf-8", "replace")[:_WINNOW_CAP] for s in strs]
    char_ok = np.fromiter((len(s) >= _WINNOW_K for s in strs),
                          dtype=bool, count=len(strs))
    out = np.zeros(len(bufs), dtype=np.int64)
    i = 0
    while i < len(bufs):
        j, nbytes = i, 0
        while j < len(bufs) and (j == i or nbytes + len(bufs[j])
                                 <= _WINNOW_CHUNK):
            nbytes += len(bufs[j])
            j += 1
        out[i:j] = _winnow_batch(bufs[i:j], char_ok[i:j])
        i = j
    return pd.Series(out)


def winnow_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("winnow_fp", _winnow_udf(F.col(text_col)))
