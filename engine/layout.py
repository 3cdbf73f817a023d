"""Physical layout: Z-order / Hilbert 64-bit key interleave (vectorized).

The reference has no clustering at all (tables are whatever order the CSV came
in); locality there is faked by scanning everything. Our engine clusters data
files on ``(xxhash64(conv_id) high bits, quantized unix_micros(ts))`` so both
conv-targeted and time-range scans prune well from per-file min/max stats.

Per the UDF discipline (SURVEY.md §2.8): the interleave is a single
``pandas_udf`` over numpy uint64 arrays — Arrow-batched, zero per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_BITS = 31  # 31 bits per dimension → 62-bit key, fits signed int64


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave-ready bit spreading (Morton): 32→64-bit magic masks."""
    v = v.astype(np.uint64) & np.uint64((1 << _BITS) - 1)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return (_spread_bits(x) | (_spread_bits(y) << np.uint64(1))).astype(np.int64)


def hilbert_xy2d(x: np.ndarray, y: np.ndarray, order: int = _BITS) -> np.ndarray:
    """Vectorized Hilbert curve (x,y) → d, ``order`` bits per dimension.

    Classic xy2d with the rotate step expressed as numpy boolean masks; the
    loop runs ``order`` times regardless of row count (fully vectorized).
    Locality-verified by the golden 2×2/4×4 tests (tests/test_layout.py).
    """
    x = x.astype(np.uint64) & np.uint64((1 << order) - 1)
    y = y.astype(np.uint64) & np.uint64((1 << order) - 1)
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.uint64(1) << np.uint64(order - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x.copy()
        x = np.where(flip, s - one - x, x)
        y = np.where(flip, s - one - y, y)
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, np.where(flip, s - one - x_f, x_f), y)
        x, y = x2, y2
        s >>= one
    return d.astype(np.int64)


@pandas_udf(LongType())
def _zorder_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(morton_interleave(x.to_numpy(np.uint64),
                                       y.to_numpy(np.uint64)))


@pandas_udf(LongType())
def _hilbert_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(hilbert_xy2d(x.to_numpy(np.uint64),
                                  y.to_numpy(np.uint64)))


def _dims(ts_col: str, conv_col: str,
          ts_bounds: tuple[int, int] | None) -> tuple[Column, Column]:
    """Two 31-bit dimensions: conversation-hash and range-normalized time.

    Both dimensions MUST span comparable ranges before interleaving —
    otherwise the wide one's high bits dominate the curve and the narrow one
    degenerates to noise (a raw 31-bit hash vs a few-hour micros range would
    make Z-order ≈ hash order, destroying ts locality). The hash is uniform
    over its 31 bits by construction; ts is stretched over [lo, hi] taken from
    manifest stats (metadata-only — no extra data scan).
    """
    x = F.shiftrightunsigned(F.xxhash64(F.col(conv_col)), 33)
    micros = F.unix_micros(F.col(ts_col))
    if ts_bounds is not None:
        lo, hi = ts_bounds
        span = max(1, hi - lo)
        y = (((micros - F.lit(lo)).cast("double") / F.lit(float(span)))
             * F.lit(float((1 << _BITS) - 1))).cast("long")
        y = F.greatest(F.least(y, F.lit((1 << _BITS) - 1)), F.lit(0))
    else:
        # no bounds known: 16 s buckets since 2020 (covers ~1000 years)
        secs = (micros / F.lit(1_000_000)).cast("long")
        y = F.shiftrightunsigned(
            F.greatest(secs - F.lit(1577836800), F.lit(0)).cast("long"), 4)
    return x, y


def _spread_bits_sql(v: Column) -> Column:
    """Morton bit-spreading as native Spark SQL (wholestage-codegen'd).

    Identical math to ``_spread_bits`` but with zero Python in the hot path:
    the Z-order pass then runs entirely JVM-side — measured 2× faster at 32
    cores than the pandas-UDF variant purely from avoiding Python worker
    fan-out (the UDF body itself was already vectorized)."""
    v = v.bitwiseAND(F.lit((1 << _BITS) - 1))
    for shift, mask in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                        (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                        (1, 0x5555555555555555)):
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def zorder_key(ts_col: str = "ts", conv_col: str = "conv_id",
               ts_bounds: tuple[int, int] | None = None) -> Column:
    x, y = _dims(ts_col, conv_col, ts_bounds)
    return _spread_bits_sql(x).bitwiseOR(F.shiftleft(_spread_bits_sql(y), 1))


def hilbert_key(ts_col: str = "ts", conv_col: str = "conv_id",
                ts_bounds: tuple[int, int] | None = None) -> Column:
    x, y = _dims(ts_col, conv_col, ts_bounds)
    return _hilbert_udf(x, y)


def curve_key(strategy: str = "zorder", ts_col: str = "ts",
              conv_col: str = "conv_id",
              ts_bounds: tuple[int, int] | None = None) -> Column:
    return zorder_key(ts_col, conv_col, ts_bounds) if strategy == "zorder" \
        else hilbert_key(ts_col, conv_col, ts_bounds)


def sample_quantile_bounds(keyed: DataFrame, col: str, num_parts: int,
                           rows_total: int,
                           sample_rows: int = 400_000,
                           seed: int = 42) -> list[int]:
    """Partition boundaries from a seeded sample + EXACT numpy quantiles on
    the driver. Shared by the fused merge+cluster path and the standalone
    ``cluster()`` cadence: ``approxQuantile``'s GK sketch costs ~1 µs on
    EVERY row (measured ~3× a sample at 6 M rows) — a 400 k sample bounds
    per-file row imbalance to well under 1 % and the driver-side quantile is
    microseconds. Deterministic at every parallelism level (seeded, and the
    sample fraction derives from DATA SIZE, never core count). Returns a
    strictly-increasing boundary list (duplicates collapsed)."""
    if num_parts <= 1:
        return []
    import time as _time
    from .merge import _tmark
    t0 = _time.time()
    frac = min(1.0, sample_rows / max(1, rows_total))
    pdf = keyed.select(col).sample(fraction=frac, seed=seed).toPandas()
    if len(pdf) == 0:
        return []
    qs = [i / num_parts for i in range(1, num_parts)]
    raw = np.quantile(pdf[col].to_numpy(), qs)
    bounds: list[int] = []
    for b in raw:
        b = int(b)
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    _tmark("layout.sample_bounds", t0)
    return bounds


def curve_bounds(df: DataFrame, strategy: str, num_files: int,
                 ts_col: str = "ts", conv_col: str = "conv_id",
                 ts_bounds: tuple[int, int] | None = None,
                 rows_total: int | None = None) -> list[int]:
    """Curve-key partition boundaries over a two-column scan (Parquet column
    pruning makes it a fraction of one full pass, and the write pass then
    needs no sampling at all — repartitionByRange's sampler would evaluate
    the FULL parent rows a second time). Quantiles come from the shared
    seeded-sample helper; ``rows_total`` (e.g. from manifest record counts)
    avoids even the count job — when unknown, one count over the pruned
    two-column scan is paid instead."""
    key = curve_key(strategy, ts_col, conv_col, ts_bounds)
    keyed = df.select(key.alias("__ckey"))
    if rows_total is None:
        rows_total = keyed.count()
    return sample_quantile_bounds(keyed, "__ckey", num_files, rows_total)


def cluster_dataframe(df: DataFrame, strategy: str = "zorder",
                      num_files: int | None = None,
                      ts_col: str = "ts", conv_col: str = "conv_id",
                      ts_bounds: tuple[int, int] | None = None,
                      bounds: list[int] | None = None) -> DataFrame:
    """Attach the space-filling-curve key, range-partition on it (each output
    file owns a contiguous curve segment → tight min/max on BOTH dimensions),
    sort within partitions, drop the key.

    With ``bounds`` (from ``curve_bounds``) the exchange is the sampling-free
    bucket/representative path of ``engine.write``; otherwise
    ``repartitionByRange`` samples — recomputing the parent plan."""
    key = curve_key(strategy, ts_col, conv_col, ts_bounds)
    out = df.withColumn("__ckey", key)
    if bounds:
        from .write import bucket_expr, partition_reps
        pid = bucket_expr(F.col("__ckey"), bounds)
        reps = partition_reps(len(bounds) + 1)
        rep = F.element_at(F.array(*[F.lit(r).cast("long") for r in reps]),
                           pid + 1)
        out = out.repartition(len(bounds) + 1, rep)
    elif num_files:
        out = out.repartitionByRange(num_files, "__ckey")
    else:
        out = out.repartitionByRange("__ckey")
    return out.sortWithinPartitions("__ckey").drop("__ckey")
