"""Property tests for the SQL DML parser shim (plans/dml.py) — the
skeleton grammar must never mis-split an expression or accept a
malformed statement. Pure-Python (no Spark session)."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from dst_spark_k8_lakehouse_spark.plans.dml import (
    _merge_keys,
    _split_assignments,
    _split_top_keyword,
)

ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)

# expressions with nested calls, commas, and quoted strings — the
# shapes a naive comma-split breaks on
expr = st.recursive(
    st.one_of(
        ident,
        st.integers(-999, 999).map(str),
        st.sampled_from(["'a,b'", "\"x(\"", "'don''t'"]),
    ),
    lambda inner: st.builds(
        lambda f, args: f + "(" + ", ".join(args) + ")",
        st.sampled_from(["greatest", "coalesce", "substr"]),
        st.lists(inner, min_size=1, max_size=3),
    ),
    max_leaves=6,
)


@given(st.dictionaries(ident, expr, min_size=1, max_size=5))
def test_split_assignments_roundtrip(assignments):
    clause = ", ".join(f"{c} = {e}" for c, e in assignments.items())
    assert _split_assignments(clause) == assignments


@given(ident, expr)
def test_split_assignments_qualified_lhs(col, e):
    got = _split_assignments(f"t.{col} = {e}")
    assert got == {col: e}


def test_split_assignments_rejects_garbage():
    for bad in ("no_equals_here", "1bad = 2", "f(x) = 3"):
        with pytest.raises(ValueError):
            _split_assignments(bad)


@given(st.lists(ident, min_size=1, max_size=4, unique=True))
def test_merge_keys_qualified_and_bare(keys):
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    assert _merge_keys(on, {"t", "s"}) == keys
    on_bare = " and ".join(f"{k} = {k}" for k in keys)
    assert _merge_keys(on_bare, {"t", "s"}) == keys


def test_merge_keys_rejects_wrong_shapes():
    for bad_on in ("t.a = s.b", "a < b", "t.a = s.a OR t.b = s.b",
                   "x.a = s.a"):
        with pytest.raises(ValueError):
            _merge_keys(bad_on, {"t", "s"})


def test_split_top_keyword_ignores_quoted_and_nested():
    # keyword inside a string literal must NOT split (ADVICE r4)
    before, after = _split_top_keyword(
        "note = 'fixed where broken' WHERE id = 1", "WHERE"
    )
    assert before.strip() == "note = 'fixed where broken'"
    assert after.strip() == "id = 1"
    # keyword inside parens (subexpression) must not split either
    before, after = _split_top_keyword(
        "x = coalesce(y, 'where') WHERE z > 0", "WHERE"
    )
    assert before.strip() == "x = coalesce(y, 'where')"
    assert after.strip() == "z > 0"
    # no top-level keyword → after is None
    before, after = _split_top_keyword("x = 'a where b'", "WHERE")
    assert after is None
    # whole-word only: 'whereabouts' is not WHERE
    before, after = _split_top_keyword("x = whereabouts", "WHERE")
    assert after is None
