"""Property-based tests: SQL rendering of range bounds can never produce
unbalanced / injectable literals, for any bound value."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spanner_data_validator_spark.jobs.query_spec_runner import bind_query
from spanner_data_validator_spark.operators.ranges import PartitionRange
from spanner_data_validator_spark.sources.jdbc_source import range_predicates

text_bounds = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40)


@given(lo=text_bounds, hi=text_bounds)
@settings(max_examples=200, deadline=None)
def test_string_predicates_always_balanced(lo, hi):
    """Every rendered predicate has an even number of quote chars (every
    embedded quote doubled), so the literal can't escape its quoting."""
    preds = range_predicates([PartitionRange(lo, hi)], "k", "STRING")
    for p in preds:
        assert p.count("'") % 2 == 0
        # the raw single-quoted value never appears unescaped mid-literal
        body = p.split(">=", 1)[1]
        assert "''" in body or "'" not in lo + hi or (lo + hi).count("'") == 0


@given(lo=text_bounds, hi=text_bounds)
@settings(max_examples=200, deadline=None)
def test_bind_query_balanced_both_dialects(lo, hi):
    src = bind_query("select * from t where k >= ? and k <= ?", lo, hi,
                     dialect="source", field_type="STRING")
    dst = bind_query("select * from t where k >= @p1 and k <= @p2", lo, hi,
                     dialect="dest", field_type="STRING")
    for q in (src, dst):
        assert q.count("'") % 2 == 0


@given(v=st.text(min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_numeric_bounds_reject_non_numeric(v):
    """LONG-domain bounds must be numeric — anything else raises instead of
    being interpolated into remote SQL."""
    try:
        float(v)
        is_num = True
    except ValueError:
        is_num = False
    if is_num:
        range_predicates([PartitionRange(v, v)], "k", "LONG")
    else:
        with pytest.raises(ValueError):
            range_predicates([PartitionRange(v, v)], "k", "LONG")
