"""Shared pytest fixtures: one local SparkSession, generated transcripts."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_near_real_time_data_ingestion_spark.datagen import (  # noqa: E402
    ensure_transcripts,
    transcripts_path,
)
from crypto_near_real_time_data_ingestion_spark.session import get_spark  # noqa: E402

TEST_SF = 0.001
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_parquet() -> str:
    return ensure_transcripts(TEST_SF)


@pytest.fixture(scope="session")
def stream_parquet_dir(transcripts_parquet) -> str:
    from crypto_near_real_time_data_ingestion_spark.datagen.transcripts import stream_dir

    return stream_dir(TEST_SF)


def duck_sql(sql: str) -> pd.DataFrame:
    """Run oracle SQL in a fresh DuckDB with the testdata views registered
    (mirrors the driver's setup)."""
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def assert_df_equal(spark_df, oracle_pdf: pd.DataFrame, sort_cols=None, rtol=1e-9):
    """Order-insensitive comparison: same columns, same rows (approx for floats)."""
    left = spark_df.toPandas()
    right = oracle_pdf
    assert sorted(left.columns) == sorted(right.columns), (
        f"columns differ: {sorted(left.columns)} vs {sorted(right.columns)}"
    )
    cols = sorted(left.columns)
    left = left[cols]
    right = right[cols]
    sort_cols = sort_cols or cols
    left = left.sort_values(sort_cols, na_position="last").reset_index(drop=True)
    right = right.sort_values(sort_cols, na_position="last").reset_index(drop=True)
    assert len(left) == len(right), f"row counts differ: {len(left)} vs {len(right)}"
    for c in cols:
        lc, rc = left[c], right[c]
        if pd.api.types.is_float_dtype(lc) or pd.api.types.is_float_dtype(rc):
            l_na, r_na = lc.isna(), rc.isna()
            assert (l_na == r_na).all(), f"null mismatch in {c}"
            import numpy as np

            assert np.allclose(
                lc[~l_na].astype(float), rc[~r_na].astype(float), rtol=rtol, atol=1e-9
            ), f"value mismatch in float column {c}"
        else:
            lc = lc.astype(str).where(~lc.isna(), "<NA>")
            rc = rc.astype(str).where(~rc.isna(), "<NA>")
            mism = (lc != rc)
            assert not mism.any(), (
                f"value mismatch in {c}: first diffs\n"
                f"{pd.DataFrame({'spark': lc[mism], 'oracle': rc[mism]}).head()}"
            )


def executed_plan_metrics(df, node_cls: str):
    """Runtime SQL-metric dicts of every ``node_cls`` node in the
    EXECUTED plan, walking through the AQE wrapper and query stages
    (shared by the DPP and runtime-Bloom pins — one place to fix if a
    Spark upgrade renames the adaptive node shapes)."""
    out = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(n.executedPlan())
            continue
        if "QueryStage" in cls:
            stack.append(n.plan())
            continue
        if cls == node_cls:
            m, vals = n.metrics(), {}
            it = m.keys().iterator()
            while it.hasNext():
                k = it.next()
                vals[k] = m.apply(k).value()
            out.append(vals)
        ch = n.children().iterator()
        while ch.hasNext():
            stack.append(ch.next())
    return out
