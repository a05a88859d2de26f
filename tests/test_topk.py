"""Grouped top-k with map-side trimming: oracle parity, equivalence with
the window-only twin, and the trim actually trimming."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_df_equal, duck_sql
from crypto_near_real_time_data_ingestion_spark.operators.topk import (
    _partial_trim,
    grouped_topk,
    grouped_topk_naive,
)
from crypto_near_real_time_data_ingestion_spark.plans import documents_gold as dg


def test_doc_topk_per_source_oracle(spark):
    got = dg.doc_topk_per_source(dg.read_documents(spark, SF_DIR))
    want = duck_sql(dg.DOC_TOPK_PER_SOURCE_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["source", "rank"], rtol=0)


def _scored(spark, n=4000, n_keys=37, seed=7):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n).astype(str),
            "key2": rng.integers(0, 3, n),
            "score": rng.integers(0, 50, n),  # heavy ties -> tiebreak matters
            "uid": np.arange(n, dtype=np.int64),
        }
    )
    return spark.createDataFrame(pdf).repartition(16)


def test_topk_equals_naive_desc_and_asc(spark):
    df = _scored(spark)
    for ascending in (False, True):
        got = grouped_topk(
            df, ["key"], "score", k=4, tiebreak="uid", ascending=ascending
        ).toPandas()
        want = grouped_topk_naive(
            df, ["key"], "score", k=4, tiebreak="uid", ascending=ascending
        ).toPandas()
        key = ["key", "rank"]
        got = got.sort_values(key).reset_index(drop=True)
        want = want.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_topk_multi_key(spark):
    df = _scored(spark)
    got = grouped_topk(df, ["key", "key2"], "score", k=2, tiebreak="uid").toPandas()
    want = grouped_topk_naive(
        df, ["key", "key2"], "score", k=2, tiebreak="uid"
    ).toPandas()
    key = ["key", "key2", "rank"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )


def test_partial_trim_is_batch_local_topk():
    """Phase 1 alone must keep exactly the per-key top-k of each batch
    (superset guarantee for phase 2; k rows per key per batch bound)."""
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame(
        {
            "key": rng.integers(0, 5, 1000).astype(str),
            "score": rng.integers(0, 10, 1000),
            "uid": np.arange(1000, dtype=np.int64),
        }
    )
    fn = _partial_trim(["key"], "score", 3, "uid", ascending=False)
    (out,) = list(fn(iter([pdf])))
    # bound: <= k per key
    assert (out.groupby("key").size() <= 3).all()
    # exact: equals pandas nlargest with uid tiebreak
    want = (
        pdf.sort_values(["score", "uid"], ascending=[False, True])
        .groupby("key")
        .head(3)
    )
    assert sorted(out["uid"]) == sorted(want["uid"])


def test_topk_plan_trims_before_exchange(spark):
    """The MapInPandas trim must sit BELOW the Exchange feeding the window
    rank — that ordering IS the map-side-combine claim."""
    df = _scored(spark)
    plan = grouped_topk(df, ["key"], "score", k=4, tiebreak="uid")._jdf.queryExecution().executedPlan().toString()
    map_pos = plan.find("MapInPandas")
    # exchange introduced by the window's partitionBy(key)
    win_pos = plan.find("Window")
    assert map_pos != -1 and win_pos != -1
    # physical plan prints top-down: Window appears ABOVE (before) the
    # MapInPandas it consumes
    assert win_pos < map_pos


def test_doc_weighted_sample_oracle_and_reference(spark):
    """Efraimidis-Spirakis weighted sample: Spark == DuckDB oracle == an
    independent numpy reference (triple agreement), plus the invariants
    that make it a SAMPLE: k per stratum (or the whole stratum when
    smaller), no duplicates, drawn from the corpus, deterministic."""
    import hashlib
    import math

    K = 5
    got = dg.doc_weighted_sample(dg.read_documents(spark, SF_DIR), k=K)
    want = duck_sql(dg.DOC_WEIGHTED_SAMPLE_ORACLE_SQL_TEMPLATE.format(k=K))
    assert_df_equal(got, want, sort_cols=["source", "rank"], rtol=0)

    # independent reference: recompute the race in plain python
    docs = duck_sql(
        f"SELECT doc_id, source, text FROM read_parquet('{SF_DIR}/documents.parquet') "
        "WHERE text IS NOT NULL AND length(text) > 0"
    )
    keys = {}
    for _, r in docs.iterrows():
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:12], 16)
        u = (h + 0.5) / float(1 << 48)
        keys.setdefault(r["source"], []).append(
            (-math.log(u) / len(r["text"]), r["doc_id"])
        )
    want_ids = {
        src: [d for _, d in sorted(ks)[:K]] for src, ks in keys.items()
    }
    got_pdf = got.toPandas().sort_values(["source", "rank"])
    for src, grp in got_pdf.groupby("source"):
        assert list(grp["doc_id"]) == want_ids[src], src
        assert len(grp) == min(K, len(keys[src]))
    assert got_pdf["doc_id"].is_unique
    # determinism across plans: a second invocation is identical
    again = dg.doc_weighted_sample(dg.read_documents(spark, SF_DIR), k=K)
    pd.testing.assert_frame_equal(
        got_pdf.reset_index(drop=True),
        again.toPandas().sort_values(["source", "rank"]).reset_index(drop=True),
    )


def test_doc_weighted_sample_favors_weight(spark):
    """Planted corpus: one stratum, k=1, one doc 10^5x heavier than the
    rest — the race must pick it (its key is bounded by 34/w_huge,
    below any realistic light-doc key on this planted fixture; verified
    against the same reference computation rather than assumed)."""
    import hashlib
    import math

    rows = [(i, "x" * 10, "s") for i in range(50)] + [(99, "y" * 1_000_000, "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = dg.doc_weighted_sample(docs, k=1).toPandas()
    keys = []
    for doc_id, text, _ in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
        keys.append((-math.log((h + 0.5) / float(1 << 48)) / len(text), doc_id))
    assert list(got["doc_id"]) == [min(keys)[1]]
    assert min(keys)[1] == 99, "fixture must make the heavy doc win"


def test_trim_keeps_nan_scores(spark):
    """NULL and true-NaN scores arrive in the trim kernel
    indistinguishably (Arrow maps both to NaN) yet rank DIFFERENTLY
    JVM-side (desc: NaN first, NULL last) — the trim therefore keeps
    every such row and lets the final window rank them; pinned against
    the naive twin for both kinds and both directions (r5 review)."""
    # NULLs (tuple-API None stays NULL)
    null_rows = [("g", None if uid < 3 else float(uid), uid) for uid in range(12)]
    # true NaNs (tuple-API float('nan') stays NaN, not NULL)
    nan_rows = [
        ("g", float("nan") if uid < 3 else float(uid), uid) for uid in range(12)
    ]
    for rows in (null_rows, nan_rows):
        df = spark.createDataFrame(
            rows, "key string, score double, uid long"
        ).repartition(1)
        for ascending in (False, True):
            got = grouped_topk(
                df, ["key"], "score", k=4, tiebreak="uid", ascending=ascending
            ).toPandas().sort_values("rank").reset_index(drop=True)
            want = grouped_topk_naive(
                df, ["key"], "score", k=4, tiebreak="uid", ascending=ascending
            ).toPandas().sort_values("rank").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want)
