"""Z-order / Hilbert golden tests (SURVEY.md §7 risk: verify locality on a
known small grid before trusting the curve at scale)."""

import numpy as np

from engine.layout import hilbert_xy2d, morton_interleave


def test_morton_golden():
    x = np.array([0, 1, 0, 1, 2, 3], dtype=np.uint64)
    y = np.array([0, 0, 1, 1, 2, 3], dtype=np.uint64)
    # interleave: x bits even positions, y bits odd
    got = morton_interleave(x, y).tolist()
    assert got == [0, 1, 2, 3, 12, 15]


def test_hilbert_2x2_golden():
    # order-1 Hilbert curve visits (0,0) (0,1) (1,1) (1,0)
    xs = np.array([0, 0, 1, 1], dtype=np.uint64)
    ys = np.array([0, 1, 1, 0], dtype=np.uint64)
    assert hilbert_xy2d(xs, ys, order=1).tolist() == [0, 1, 2, 3]


def test_hilbert_4x4_is_bijective_and_local():
    xs, ys = np.meshgrid(np.arange(4, dtype=np.uint64),
                         np.arange(4, dtype=np.uint64))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_xy2d(xs, ys, order=2)
    assert sorted(d.tolist()) == list(range(16))  # bijection
    # locality: consecutive curve positions are grid neighbors (Hilbert's
    # defining property; Z-order does NOT satisfy this)
    pos = {int(dd): (int(x), int(y)) for dd, x, y in zip(d, xs, ys)}
    for i in range(15):
        (x1, y1), (x2, y2) = pos[i], pos[i + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_large_order_bijective_sample():
    rng = np.random.RandomState(42)
    xs = rng.randint(0, 1 << 16, 1000).astype(np.uint64)
    ys = rng.randint(0, 1 << 16, 1000).astype(np.uint64)
    d = hilbert_xy2d(xs, ys, order=16)
    # distinct inputs → distinct outputs
    uniq_in = len({(int(a), int(b)) for a, b in zip(xs, ys)})
    assert len(set(d.tolist())) == uniq_in
    assert (d >= 0).all()


def test_sql_morton_matches_numpy(spark):
    """The codegen'd SQL bit-spread must agree with the numpy reference."""
    import numpy as np
    from pyspark.sql import functions as F

    from engine.layout import _spread_bits_sql
    rng = np.random.RandomState(3)
    xs = rng.randint(0, 1 << 31, 500).astype(np.uint64)
    ys = rng.randint(0, 1 << 31, 500).astype(np.uint64)
    want = morton_interleave(xs, ys).tolist()
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], ["x", "y"])
    got = [r["m"] for r in df.select(
        _spread_bits_sql(F.col("x"))
        .bitwiseOR(F.shiftleft(_spread_bits_sql(F.col("y")), 1))
        .alias("m")).collect()]
    assert got == want


def test_morton_preserves_prefix_locality():
    # points in the same 2^k-aligned tile share the morton prefix
    x = np.array([5, 6], dtype=np.uint64)      # tile [4,8)
    y = np.array([9, 10], dtype=np.uint64)     # tile [8,12)
    d = morton_interleave(x, y)
    assert (d[0] >> 4) == (d[1] >> 4)
