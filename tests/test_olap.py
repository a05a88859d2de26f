"""ROLLUP/CUBE grouping-set aggregation and pivot vs DuckDB oracles,
plus the structural guarantees the module docstring claims."""

from __future__ import annotations

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.plans import olap


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_events_rollup_oracle(spark):
    got = olap.events_rollup(_events(spark))
    want = duck_sql(olap.EVENTS_ROLLUP_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["g_type", "g_day", "event_type", "day"])


def test_events_cube_oracle(spark):
    got = olap.events_cube(_events(spark))
    want = duck_sql(olap.EVENTS_CUBE_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["g_type", "g_day", "event_type", "day"])


def test_rollup_grand_total_and_lattice(spark):
    """The subtotal algebra: the grand-total row counts every event, and
    the cube adds exactly the per-day stratum rollup lacks."""
    ev = _events(spark)
    total = ev.count()
    roll = olap.events_rollup(ev).toPandas()
    grand = roll[(roll.g_type == 1) & (roll.g_day == 1)]
    assert len(grand) == 1 and int(grand.n_events.iloc[0]) == total
    cube = olap.events_cube(ev).toPandas()
    extra = cube[(cube.g_type == 1) & (cube.g_day == 0)]
    n_days = ev.selectExpr("date_trunc('day', ts) AS d").distinct().count()
    assert len(extra) == n_days
    assert len(cube) == len(roll) + n_days


def test_rollup_single_aggregation_pass(spark):
    """One Expand + the aggregation's exchanges — no per-grain re-scan:
    the parquet relation appears exactly once in the physical plan."""
    plan = olap.events_rollup(_events(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan, plan


def test_events_pivot_oracle(spark):
    got = olap.events_pivot(_events(spark))
    want = duck_sql(olap.EVENTS_PIVOT_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["day"])


def test_pivot_count_preservation(spark):
    """The pinned value list covers the vocabulary: wide counts sum back
    to the row count (an unexpected type would silently drop — this is
    the companion assertion the module docstring promises)."""
    ev = _events(spark)
    wide = olap.events_pivot(ev).toPandas()
    assert int(wide[list(olap.EVENT_TYPES)].sum().sum()) == ev.count()


def test_pivot_strict_modes(spark):
    """Planted off-vocabulary types (one unseen string + one NULL) fire
    the strict guard; 'other' counts them per day in the same pass; the
    default fast path keeps the pinned schema and drops them."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    ev = _events(spark).select("event_type", "ts")
    planted = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_type": ["mystery", None],
                "ts": pd.to_datetime(["2024-03-01 10:00", "2024-03-02 11:00"]),
            }
        )
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"))
    dirty = ev.unionByName(planted)

    with pytest.raises(ValueError, match="2 rows carry an event_type"):
        olap.events_pivot(dirty, strict="error")

    other = olap.events_pivot(dirty, strict="other").toPandas()
    assert "__other" in other.columns
    assert int(other["__other"].sum()) == 2
    # count preservation now INCLUDES the off-vocab rows
    assert (
        int(other[[*olap.EVENT_TYPES, "__other"]].sum().sum()) == dirty.count()
    )

    # clean data: strict='error' passes and EQUALS the fast path
    clean_strict = (
        olap.events_pivot(ev, strict="error")
        .toPandas().sort_values("day").reset_index(drop=True)
    )
    assert "__other" not in clean_strict.columns
    fast_clean = (
        olap.events_pivot(ev).toPandas().sort_values("day").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(clean_strict, fast_clean)
    fast = olap.events_pivot(dirty).toPandas()
    assert "__other" not in fast.columns

    with pytest.raises(ValueError, match="ignore|error|other"):
        olap.events_pivot(ev, strict="loud")
