"""Property-based tests (hypothesis): operators vs plain-Python models.

The reference's closed-form-oracle style (pipeline.d:1311-1317) taken one
step further: random inputs, model computed in Python, compared exact.
Deadlines disabled: Spark actions have multi-second jitter.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import flod_spark as fs
from flod_spark.seq import with_seq

TEXT = st.text(alphabet=list("ab \t\n"), max_size=40)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(TEXT, min_size=1, max_size=5))
def test_by_line_matches_python_split(spark, texts):
    """by_line == python str.split('\\n') with the trailing-empty rule
    (terminated final line drops the empty marker; unterminated kept)."""
    p = fs.from_array(spark, texts, type_hint="string").by_line()
    got = [(r.line_no, r.value) for r in sorted(p.to_array(), key=lambda r: r.seq)]
    expect = []
    for t in texts:
        parts = t.split("\n")
        # trailing '' is the terminated-end marker, dropped — which also
        # means an empty chunk is an empty stream: zero lines (flod:
        # byLine of an empty stream emits nothing, range.d:407-419)
        if parts and parts[-1] == "":
            parts = parts[:-1]
        for i, line in enumerate(parts, 1):
            expect.append((i, line))
    assert got == expect


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.integers(min_value=-(2**31), max_value=2**31), min_size=0, max_size=60),
)
def test_with_seq_is_rank(spark, xs):
    """seq == rank in the total order (value, uid) for arbitrary ints
    (duplicates allowed via the uid tiebreak)."""
    rows = [(i, v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "uid long, value long") if rows else spark.createDataFrame([], "uid long, value long")
    out = with_seq(df, "value", "uid").collect()
    got = {r.uid: r.seq for r in out}
    expect = {uid: rank for rank, (v, uid) in enumerate(sorted((v, u) for u, v in rows))}
    assert got == expect
