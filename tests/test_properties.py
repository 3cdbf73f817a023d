"""Property-based invariants (hypothesis) for the pure driver-side logic
that everything else trusts: manifest-stats file pruning must NEVER drop a
file that could hold a matching row, string bound truncation must stay an
upper bound, and the driver-side murmur3 must keep matching Spark's hash
for the partition-representative construction.

Deterministic profile: ``derandomize=True`` (the driver runs ``pytest -x``;
a randomly-found flake would fail the whole round) and no deadline (shared
host).
"""

from hypothesis import given, settings, strategies as st

from engine.format import DataFile, _truncate_upper, _MAX_BOUND_LEN
from engine.scan import Predicate, conv_overlap
from engine.write import _murmur3_32, partition_reps

DET = settings(deadline=None, derandomize=True, max_examples=200)

_vals = st.integers(min_value=-1000, max_value=1000)
_strs = st.text(alphabet="abcz019 é\U0010fffe", max_size=80)


@st.composite
def _file_and_row(draw, values=_vals):
    """A file stats range [lo, hi] plus a row value inside it."""
    a, b = draw(values), draw(values)
    lo, hi = min(a, b), max(a, b)
    v = draw(st.integers(min_value=lo, max_value=hi))
    nulls = draw(st.integers(min_value=0, max_value=5))
    f = DataFile("data/x.parquet", record_count=10, file_size_bytes=1,
                 stats={"c": {"min": lo, "max": hi, "null_count": nulls}})
    return f, v


@DET
@given(_file_and_row(), _vals)
def test_prune_soundness_point_ops(fv, w):
    """If a row with value v exists in the file, every predicate v
    satisfies must keep the file (might_match may over-approximate, never
    under)."""
    f, v = fv
    cases = [
        (Predicate("c", "eq", w), v == w),
        (Predicate("c", "lt", w), v < w),
        (Predicate("c", "le", w), v <= w),
        (Predicate("c", "gt", w), v > w),
        (Predicate("c", "ge", w), v >= w),
    ]
    for pred, row_matches in cases:
        if row_matches:
            assert pred.might_match(f), (pred, f.stats, v)


@DET
@given(_file_and_row(), st.lists(_vals, min_size=0, max_size=8))
def test_prune_soundness_in_op(fv, keys):
    """IN-set pruning (bisect over a SORTED key list): a file holding a row
    whose value is in the set must survive."""
    f, v = fv
    keys = sorted(set(keys) | {v})
    assert Predicate("c", "in", keys).might_match(f)


@DET
@given(_file_and_row())
def test_prune_soundness_notnull(fv):
    """notnull keeps any file whose null_count < record_count (some row is
    non-null)."""
    f, v = fv
    assert Predicate("c", "notnull").might_match(f)  # nulls ≤ 5 < 10 rows


@DET
@given(_strs, _strs)
def test_truncated_upper_bound_is_still_an_upper_bound(prefix, tail):
    """Iceberg-style truncate-with-carry: for ANY string s, the stored
    upper bound u satisfies s <= u (or u is None = unbounded) — otherwise
    pruning could drop a file that contains s. Also bounds stay short."""
    s = prefix + tail
    u = _truncate_upper(s)
    if u is not None:
        assert s <= u, (s, u)
        assert len(u) <= _MAX_BOUND_LEN


@DET
@given(_strs, _strs, _strs, _strs)
def test_conv_overlap_is_symmetric_and_sound(a1, a2, b1, b2):
    """conv_overlap is symmetric, and two ranges sharing a point overlap."""
    fa = DataFile("data/a", 1, 1, {"conv_id": {"min": min(a1, a2),
                                               "max": max(a1, a2)}})
    fb = DataFile("data/b", 1, 1, {"conv_id": {"min": min(b1, b2),
                                               "max": max(b1, b2)}})
    assert conv_overlap(fa, fb) == conv_overlap(fb, fa)
    shared = max(min(a1, a2), min(b1, b2))
    if (min(a1, a2) <= shared <= max(a1, a2)
            and min(b1, b2) <= shared <= max(b1, b2)):
        assert conv_overlap(fa, fb)


@DET
@given(st.integers(min_value=0, max_value=2 ** 63 - 1))
def test_murmur3_matches_range_and_determinism(v):
    """The driver-side murmur3 stays in int32 range (Spark hash contract)
    and is deterministic — the partition-representative solve depends on
    pmod(hash(rep), n) == j holding exactly (cross-checked against
    F.hash in tests/test_write.py; this pins the pure-python half)."""
    h1, h2 = _murmur3_32(v), _murmur3_32(v)
    assert h1 == h2
    assert -(2 ** 31) <= h1 < 2 ** 31


def test_partition_reps_solve_property():
    """reps[j] really lands in partition j for a range of bucket counts."""
    for n in (1, 2, 3, 7, 16, 63):
        reps = partition_reps(n)
        assert len(set(reps)) == n
        for j, r in enumerate(reps):
            assert _murmur3_32(r) % n == j


def _files_strategy():
    """Manifest entries over a small conv universe, some single-conv (with
    turn stats), some spanning ranges."""
    def mk(i, kind, count, tmax):
        conv = f"c{kind[0]:03d}"
        if kind[0] == kind[1]:
            stats = {"conv_id": {"min": conv, "max": conv},
                     "turn_idx": {"min": 0, "max": tmax}}
        else:
            stats = {"conv_id": {"min": conv, "max": f"c{kind[1]:03d}"},
                     "turn_idx": {"min": 0, "max": tmax}}
        return DataFile(f"data/f{i}.parquet", count, count * 10, stats)
    return st.lists(
        st.tuples(st.tuples(st.integers(0, 9), st.integers(0, 9))
                  .map(lambda p: (min(p), max(p))),
                  st.integers(1, 5000), st.integers(0, 4999)),
        min_size=1, max_size=12).map(
        lambda specs: [mk(i, k, c, t) for i, (k, c, t) in enumerate(specs)])


@DET
@given(_files_strategy(), st.integers(2, 9))
def test_range_bounds_composite_invariants(entries, num_files):
    """Composite (conv, turn) boundaries are strictly increasing under the
    lexicographic key, never exceed num_files-1, and the turn-free call
    stays a subsequence-compatible conv-only list — the preconditions
    bucket_expr's binary search and the part↔plan alignment rely on."""
    from engine.write import range_bounds_from_entries

    def key(b):
        return (b[0], b[1]) if isinstance(b, tuple) else (b, float("-inf"))

    for turn_col in (None, "turn_idx"):
        bounds = range_bounds_from_entries(entries, num_files, "conv_id",
                                           turn_col=turn_col)
        assert bounds is not None
        assert len(bounds) <= num_files - 1
        keys = [key(b) for b in bounds]
        assert keys == sorted(keys)
        assert len(set(keys)) == len(keys)  # strictly increasing
        if turn_col is None:
            assert all(isinstance(b, str) for b in bounds)


@DET
@given(st.sampled_from(["eq", "lt", "le", "gt", "ge", "in", "notnull"]),
       st.integers(0, 50), st.integers(0, 50), st.integers(0, 50),
       st.integers(0, 3))
def test_matches_all_is_sound(op, lo, hi, v, nulls):
    """matches_all(file) == True must IMPLY every representable row of the
    file matches the predicate (the metadata-only whole-file delete gate):
    check against the boundary rows [min, max], which bound every value the
    stats admit for the monotone ops."""
    from engine.scan import Predicate

    lo, hi = min(lo, hi), max(lo, hi)
    f = DataFile("data/x.parquet", 10, 100,
                 {"turn_idx": {"min": lo, "max": hi, "null_count": nulls}})
    value = sorted({v, v + 3}) if op == "in" else v
    p = Predicate("turn_idx", op, None if op == "notnull" else value)
    if p.matches_all(f):
        assert nulls == 0
        for row in (lo, hi):
            if op == "eq":
                assert row == value
            elif op == "in":
                assert row in value
            elif op == "lt":
                assert row < value
            elif op == "le":
                assert row <= value
            elif op == "gt":
                assert row > value
            elif op == "ge":
                assert row >= value
        # matches_all ⟹ might_match (all ⟹ some)
        assert p.might_match(f)
