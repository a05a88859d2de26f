"""Z-order layout (`sources/layout.py`): the pruning claim is measured
from the written files' parquet footers, not inferred from timings.

Scenario: gold events filtered by `ts BETWEEN …` AND `user_id = …` —
the two-dimensional access pattern a single-column layout can only serve
on its leading key. The test writes the SAME events three ways (linear
by ts, linear by user_id, z-ordered by both) and computes, per layout,
what fraction of files each range predicate can skip.
"""

from __future__ import annotations

import pandas as pd
import pytest

from conftest import SF_DIR

from crypto_near_real_time_data_ingestion_spark.sources.layout import (
    file_skip_fraction,
    write_linear,
    write_zordered,
    zorder_value,
)

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("zorder")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    paths = {
        "linear_ts": str(root / "linear_ts"),
        "linear_user": str(root / "linear_user"),
        "zorder": str(root / "zorder"),
    }
    write_linear(events, paths["linear_ts"], "ts", N_FILES)
    write_linear(events, paths["linear_user"], "user_id", N_FILES)
    write_zordered(events, paths["zorder"], ["ts", "user_id"], N_FILES)
    return spark, events, paths


def test_zorder_roundtrip_lossless(layouts):
    spark, events, paths = layouts
    got = spark.read.parquet(paths["zorder"])
    assert got.count() == events.count()
    # same multiset of rows (event_id is unique)
    assert (
        got.select("event_id").subtract(events.select("event_id")).count() == 0
    )
    assert sorted(got.columns) == sorted(events.columns)


def test_zorder_prunes_both_dimensions(layouts):
    """A ~10% band predicate on EACH dimension must skip a substantial
    fraction of the z-ordered files, while each linear layout skips only
    on its own sort key (the trailing column spreads across every file)."""
    spark, events, paths = layouts
    pdf = events.select("ts", "user_id").toPandas()
    ts_lo, ts_hi = pdf["ts"].min(), pdf["ts"].max()
    u_lo, u_hi = int(pdf["user_id"].min()), int(pdf["user_id"].max())
    ts_band = (
        (ts_lo + (ts_hi - ts_lo) * 0.45).tz_localize("UTC"),
        (ts_lo + (ts_hi - ts_lo) * 0.55).tz_localize("UTC"),
    )
    u_band = (
        u_lo + int((u_hi - u_lo) * 0.45),
        u_lo + int((u_hi - u_lo) * 0.55),
    )

    skip = {
        name: {
            "ts": file_skip_fraction(p, "ts", *ts_band),
            "user_id": file_skip_fraction(p, "user_id", *u_band),
        }
        for name, p in paths.items()
    }
    # each linear layout serves exactly its own key…
    assert skip["linear_ts"]["ts"] >= 0.8
    assert skip["linear_ts"]["user_id"] == 0.0
    assert skip["linear_user"]["user_id"] >= 0.8
    assert skip["linear_user"]["ts"] == 0.0
    # …the z-ordered layout serves BOTH (16 files = 4 Morton quadrant
    # levels: a 10% band overlaps ~2 of 4 top-level stripes per dim)
    assert skip["zorder"]["ts"] >= 0.4, skip
    assert skip["zorder"]["user_id"] >= 0.4, skip


def test_zorder_string_dimension_prunes(spark, tmp_path):
    """String columns join the curve via an order-PRESERVING 2-byte
    prefix rank (the Delta binary-truncation trick), so the string
    column's own footer min/max stays tight and a point predicate
    (`event_type = '…'`) prunes files — while the ts-linear layout
    spreads every type across every file."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    types = sorted(
        r["event_type"]
        for r in events.select("event_type").distinct().collect()
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "l")
    write_zordered(events, zpath, ["ts", "event_type"], N_FILES)
    write_linear(events, lpath, "ts", N_FILES)
    t = types[0]
    z_skip = file_skip_fraction(zpath, "event_type", t, t)
    l_skip = file_skip_fraction(lpath, "event_type", t, t)
    assert l_skip == 0.0, l_skip
    assert z_skip >= 0.25, (z_skip, types)
    # and the ts dimension still prunes on the z-ordered layout
    pdf = events.select("ts").toPandas()
    ts_lo, ts_hi = pdf["ts"].min(), pdf["ts"].max()
    band = (ts_lo + (ts_hi - ts_lo) * 0.45, ts_lo + (ts_hi - ts_lo) * 0.55)
    assert file_skip_fraction(zpath, "ts", *band) >= 0.25


def test_zvalue_is_pure_catalyst(spark):
    """The z-value is whole-stage-codegen bit math — no UDF, no Python
    in the layout job's plan."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = (
        zorder_value(events, ["ts", "user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_nan_dimension_does_not_collapse_ranking(spark):
    """One NaN in a float z-order dimension previously made span NaN and
    frac NaN for EVERY row (floor(NaN)=0 → the whole dimension ranked
    0, silently killing pruning on it, with no DegenerateZOrderBounds).
    Now NaN rows rank 0 like NULLs and the rest of the column still
    spreads across the rank space (r5 review)."""
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.sources.layout import (
        zorder_value,
    )

    # tuple API keeps float('nan') as true NaN (not NULL)
    rows = [(i, float("nan") if i == 0 else float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "a long, b double")
    z = zorder_value(df, ["a", "b"]).select("a", "b", "zvalue").toPandas()
    assert z["zvalue"].nunique() == len(z)
    # the discriminating check: the pre-fix collapse ranked b as 0 for
    # every row — identical to a CONSTANT b (span 0 → rank 0). Post-fix
    # only the one NaN row matches that layout.
    collapsed = (
        zorder_value(df.select("a", F.lit(0.0).alias("b")), ["a", "b"])
        .select("a", F.col("zvalue").alias("zc"))
    )
    both = z.merge(collapsed.toPandas(), on="a")
    same = int((both["zvalue"] == both["zc"]).sum())
    # exactly two legitimate matches: the NaN row (rank 0 by the NULL
    # convention) and the b-minimum row (frac 0 → rank 0); pre-fix ALL
    # 100 rows matched
    assert same == 2, f"{same} rows rank as if b were constant (collapse)"
    # an ALL-NaN dimension now fails the degenerate guard like all-NULL
    from crypto_near_real_time_data_ingestion_spark.sources.layout import (
        DegenerateZOrderBounds,
    )
    import pytest as _pytest
    with _pytest.raises(DegenerateZOrderBounds):
        zorder_value(
            df.select("a", F.lit(float("nan")).alias("b")), ["a", "b"]
        ).collect()
