"""Bin-bucketed range join: equality with the naive theta join (the
independent formulation, including hypothesis-fuzzed edge geometry),
bin-width invariance, empty/inverted-interval guards, boundary
half-open semantics, and the no-cartesian plan shape."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crypto_near_real_time_data_ingestion_spark.operators.range_join import (
    range_join,
)


def _pairs(df):
    return sorted(
        (r["pid"], r["iid"]) for r in df.select("pid", "iid").collect()
    )


def _frames(spark, points, intervals):
    p = spark.createDataFrame(points or [(None, None)], "pid long, t long").filter(
        F.col("pid").isNotNull()
    )
    i = spark.createDataFrame(
        intervals or [(None, None, None)], "iid long, lo long, hi long"
    ).filter(F.col("iid").isNotNull())
    return p, i


def _naive(p, i):
    return p.join(i, (F.col("lo") <= F.col("t")) & (F.col("t") < F.col("hi")))


def test_range_join_matches_naive_on_planted(spark):
    """Deterministic geometry: nested, touching, disjoint, and
    boundary-sitting intervals; points on every edge."""
    points = [(k, t) for k, t in enumerate([0, 1, 5, 10, 11, 15, 99, 100])]
    intervals = [
        (0, 0, 1),      # covers only t=0 (half-open)
        (1, 0, 100),    # covers everything below 100
        (2, 10, 10),    # empty (lo == hi): matches nothing
        (3, 12, 11),    # inverted: matches nothing (guard, not DESC seq)
        (4, 100, 200),  # t=100 sits on its lo: covered
        (5, 5, 6),
    ]
    p, i = _frames(spark, points, intervals)
    want = _pairs(_naive(p, i))
    assert len(want) > 0
    for w in (1, 7, 64, None):
        got = _pairs(range_join(p, i, "t", "lo", "hi", bin_width=w))
        assert got == want, (w, got, want)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=12),
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=0,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=20),
)
def test_range_join_matches_naive_fuzzed(spark, ts, spans, w):
    points = [(k, t) for k, t in enumerate(ts)]
    intervals = [(k, a, b) for k, (a, b) in enumerate(spans)]
    p, i = _frames(spark, points, intervals)
    got = _pairs(range_join(p, i, "t", "lo", "hi", bin_width=w))
    want = _pairs(_naive(p, i))
    assert got == want


def test_range_join_exact_past_double_precision(spark):
    """Bins are exact long arithmetic: at t ≈ 2^54 a double-division
    floor rounds t and hi to the same double and bins the point one bin
    PAST the interval's last replica, silently dropping the pair (the
    bug this test pins); pmod+div must keep it."""
    base = 1 << 54
    points = [(0, base + 1), (1, base - 11)]  # in, out (below lo)
    intervals = [(0, base - 10, base + 2)]
    p, i = _frames(spark, points, intervals)
    for w in (2, 3, 1000):
        got = _pairs(range_join(p, i, "t", "lo", "hi", bin_width=w))
        assert got == [(0, 0)], (w, got)


def test_range_join_guards(spark):
    """bin_width < 1 raises (a zero width would NULL every bin and
    return silently empty); a caller '_bin' column raises; the derived
    width ignores inverted intervals (their negative spans would drag
    w to 1 and explode the valid intervals' replica counts)."""
    import pytest as _pytest

    from crypto_near_real_time_data_ingestion_spark.operators.range_join import (
        _derive_bin_width,
    )

    p, i = _frames(spark, [(0, 5)], [(0, 0, 10)])
    with _pytest.raises(ValueError, match="bin_width"):
        range_join(p, i, "t", "lo", "hi", bin_width=0)
    with _pytest.raises(ValueError, match="_bin"):
        range_join(p.withColumn("_bin", F.lit(1)), i, "t", "lo", "hi", bin_width=1)
    _, inv = _frames(spark, [], [(0, 0, 1000), (1, 2000, 0)])
    assert _derive_bin_width(inv, "lo", "hi") == 1000


def test_range_join_plan_is_equi_join_not_cartesian(spark):
    """The reformulation's whole point: the naive theta join plans a
    nested-loop/cartesian; the binned one plans an equi-join."""
    p, i = _frames(
        spark,
        [(k, k * 3) for k in range(100)],
        [(k, k * 5, k * 5 + 7) for k in range(50)],
    )
    naive_plan = _naive(p, i)._jdf.queryExecution().executedPlan().toString()
    assert ("NestedLoop" in naive_plan) or ("Cartesian" in naive_plan)
    plan = (
        range_join(p, i, "t", "lo", "hi", bin_width=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
