"""Property-based checks (hypothesis) for the deletion-neighborhood
fuzzy join's candidate COMPLETENESS and the bloom filter's
NO-FALSE-NEGATIVE contract — the two invariants whose violation would
silently lose results rather than erroring."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fluss_iceberg_spark.lake.table import _bloom_positions
from fluss_iceberg_spark.operators.fuzzy import deletion_signatures  # noqa: F401


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _del_neighborhood(s: str) -> set[str]:
    # pure-python twin of deletion_signatures (the Spark column form is
    # exercised by test_fuzzy.py against the same corpus)
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcde ", min_size=0, max_size=12),
       st.text(alphabet="abcde ", min_size=0, max_size=12))
def test_deletion_signatures_complete_for_ed1(a, b):
    """If lev(a,b) <= 1 the deletion neighborhoods MUST intersect —
    candidate generation can never lose a true pair (the exact-verify
    step then removes any false candidate, so completeness here implies
    end-to-end exactness)."""
    if _lev(a, b) <= 1:
        assert _del_neighborhood(a) & _del_neighborhood(b)


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.text(min_size=0, max_size=40),
                 st.integers(min_value=-(2**62), max_value=2**62)))
def test_bloom_membership_never_false_negative(v):
    """A value's own k positions are by definition set when it was
    inserted — determinism of the positions across calls IS the
    no-false-negative property at the metadata layer."""
    p1 = _bloom_positions(v)
    p2 = _bloom_positions(v)
    assert p1 == p2
    assert p1 is not None
    assert all(0 <= p < 2048 for p in p1)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_bloom_int_and_string_forms_agree(i):
    """Write side hashes the pyarrow int; predicate side may carry the
    SQL literal as int — and a string literal of the same integer must
    resolve to the same positions (canon: str(int))."""
    assert _bloom_positions(i) == _bloom_positions(str(i))
