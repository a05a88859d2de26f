"""Count-Min sketch: certified-bound contracts vs the exact twin plus a
bit-equal numpy reference (the HLL / GK / Misra-Gries sketch rule —
approximate ops are graded by their guarantees, never a value hash)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from conftest import SF_DIR
from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
    cms_build,
    cms_estimates,
    cms_merge,
    cms_reference,
    cms_total,
    token_cms,
)
from crypto_near_real_time_data_ingestion_spark.operators.heavy_hitters import (
    token_counts_exact,
)
from crypto_near_real_time_data_ingestion_spark.plans import documents_gold as dg

W, D = 256, 4


def _sketch_dict(sketch_df) -> dict[tuple[int, int], int]:
    return {
        (r["row"], r["col"]): r["count"] for r in sketch_df.collect()
    }


def test_cms_matches_numpy_reference_bit_exact(spark):
    """The distributed build equals a single-machine numpy build from the
    same xxhash64 values, cell for cell (partials are pure addition)."""
    docs = dg.read_documents(spark, SF_DIR).repartition(16)
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[A-Za-z0-9]+"), 0)
        ).alias("token")
    )
    h64 = np.array(
        [r["h"] for r in toks.select(F.xxhash64("token").alias("h")).collect()],
        dtype=np.int64,
    )
    want = cms_reference(h64, W, D)
    got = np.zeros((D, W), dtype=np.int64)
    for (row, col), cnt in _sketch_dict(cms_build(toks, "token", W, D)).items():
        got[row, col] = cnt
    assert np.array_equal(got, want)
    # every depth row folds every occurrence: row sums all equal N
    assert (got.sum(axis=1) == len(h64)).all()


def test_cms_never_underestimates_and_bounds(spark):
    """est >= true for EVERY distinct token (deterministic CMS property),
    mean overcount within the analytic expectation 2N/width, and the
    self-carried total equals N."""
    w_narrow = 16  # << vocabulary: every bucket holds several tokens
    docs = dg.read_documents(spark, SF_DIR).repartition(16)
    exact = token_counts_exact(docs).toPandas().set_index("token")["count"]
    sketch = token_cms(docs, width=w_narrow, depth=D)
    n_total = cms_total(sketch).collect()[0]["n_total"]
    assert n_total == int(exact.sum())

    items = spark.createDataFrame(pd.DataFrame({"token": exact.index}))
    est = (
        cms_estimates(sketch, items, "token", width=w_narrow, depth=D)
        .toPandas()
        .set_index("item")["est"]
        .reindex(exact.index)
    )
    err = est - exact
    assert (err >= 0).all(), "CMS underestimated"
    # w=16 << vocabulary forces real collisions — the bound is doing
    # work here, not trivially zero
    assert (err > 0).any()
    assert err.mean() <= 2.0 * n_total / w_narrow


def test_cms_exactness_at_wide_width(spark):
    """width >> distinct tokens: collisions across ALL depth rows are
    (deterministically, at this seed) absent — est == exact everywhere,
    pinning that the sketch degrades to the exact count."""
    docs = dg.read_documents(spark, SF_DIR)
    exact = token_counts_exact(docs).toPandas().set_index("token")["count"]
    sketch = token_cms(docs, width=1 << 16, depth=D)
    items = spark.createDataFrame(pd.DataFrame({"token": exact.index}))
    est = (
        cms_estimates(sketch, items, "token", width=1 << 16, depth=D)
        .toPandas()
        .set_index("item")["est"]
        .reindex(exact.index)
    )
    assert (est == exact).all()


def test_cms_merge_equals_union_and_partition_invariance(spark):
    """Pointwise sum of per-slice sketches == the sketch of the union
    (mergeable summaries), and the build is partition-count invariant —
    together these are what makes per-micro-batch deltas additive under
    the streaming sink."""
    docs = dg.read_documents(spark, SF_DIR)
    a = docs.filter(F.col("doc_id") < 250)
    b = docs.filter(F.col("doc_id") >= 250)
    merged = cms_merge(
        token_cms(a, width=W, depth=D), token_cms(b, width=W, depth=D)
    )
    whole = token_cms(docs, width=W, depth=D)
    assert _sketch_dict(merged) == _sketch_dict(whole)
    assert _sketch_dict(
        token_cms(docs.repartition(3), width=W, depth=D)
    ) == _sketch_dict(whole)


def test_cms_unseen_item_and_nulls(spark):
    """An item hashing to untouched cells estimates 0 via the left join;
    NULL items are dropped on both build and query sides."""
    docs = spark.createDataFrame(
        pd.DataFrame({"text": ["alpha alpha beta", None, "alpha"]})
    )
    sketch = token_cms(docs, width=W, depth=D)
    items = spark.createDataFrame(
        pd.DataFrame(
            {"token": pd.Series(["alpha", "beta", "zzz_never_seen", None])}
        )
    )
    est = (
        cms_estimates(sketch, items, "token", width=W, depth=D)
        .toPandas()
        .set_index("item")["est"]
        .to_dict()
    )
    assert est == {"alpha": 3, "beta": 1, "zzz_never_seen": 0}


def test_cms_width_validation():
    import pytest

    from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
        _check_width,
    )

    with pytest.raises(ValueError):
        _check_width(1000)
    with pytest.raises(ValueError):
        _check_width(0)
    assert _check_width(1024) == 54


def test_countmin_sink_merge_replay_and_compaction(spark, tmp_path):
    """The streaming sink's pointwise cell merge: deltas sum to the
    sketch of the union, replay of a committed batch is a no-op (the
    additive merge is not idempotent — the commit log makes it
    exactly-once), and snapshot compaction folds without changing the
    read view. Point queries through the sink never underestimate."""
    from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
        CountMinSink,
    )

    sink = CountMinSink(str(tmp_path / "cms"))
    docs1 = spark.createDataFrame([("a b a",), ("b c",)], ["text"])
    docs2 = spark.createDataFrame([("a c",)], ["text"])
    sink.process_batch(token_cms(docs1, width=W, depth=D), 0)
    sink.process_batch(token_cms(docs2, width=W, depth=D), 1)
    sink.process_batch(token_cms(docs2, width=W, depth=D), 1)  # replay → no-op
    whole = token_cms(
        spark.createDataFrame([("a b a",), ("b c",), ("a c",)], ["text"]),
        width=W,
        depth=D,
    )
    assert _sketch_dict(sink.read(spark)) == _sketch_dict(whole)

    items = spark.createDataFrame(pd.DataFrame({"token": ["a", "b", "c", "d"]}))
    est = (
        cms_estimates(sink.read(spark), items, "token", width=W, depth=D)
        .toPandas()
        .set_index("item")["est"]
        .to_dict()
    )
    assert est == {"a": 3, "b": 2, "c": 2, "d": 0}

    # compaction folds the deltas into one snapshot; read view unchanged,
    # replay of a compacted-away id still a no-op
    res = sink.compact(spark)
    assert res["compacted_deltas"] == 2
    sink.process_batch(token_cms(docs1, width=W, depth=D), 0)
    assert _sketch_dict(sink.read(spark)) == _sketch_dict(whole)
