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
