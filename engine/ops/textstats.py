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


@pandas_udf(LongType())
def _winnow_udf(texts: pd.Series) -> pd.Series:
    """Winnowing fingerprint (Schleimer et al. 2003): min rolling hash over
    windows of k-gram hashes → one 64-bit doc signature. Vectorized per
    Arrow batch; the per-doc loop is numpy over char codes."""
    K, W = 5, 8
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        s = ("" if t is None else str(t).lower())
        if len(s) < K:
            out[i] = 0
            continue
        codes = np.frombuffer(s.encode("utf-8", "replace")[:4096],
                              dtype=np.uint8).astype(np.uint64)
        # polynomial rolling hash of k-grams
        h = np.zeros(len(codes) - K + 1, dtype=np.uint64)
        for j in range(K):
            h = h * np.uint64(257) + codes[j:len(codes) - K + 1 + j]
        if len(h) >= W:
            mins = np.lib.stride_tricks.sliding_window_view(h, W).min(axis=1)
        else:
            mins = h
        out[i] = np.int64(np.bitwise_xor.reduce(mins).view(np.int64))
    return pd.Series(out)


def winnow_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("winnow_fp", _winnow_udf(F.col(text_col)))
