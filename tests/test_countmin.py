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
    from crypto_near_real_time_data_ingestion_spark.functions.text import word_tokens

    docs = dg.read_documents(spark, SF_DIR).repartition(16)
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(word_tokens(F.col("text"))).alias("token")
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
    with pytest.raises(ValueError):
        _check_width(1)  # shift 64 is UB on 64-bit ints
    assert _check_width(1024) == 54


def test_cms_estimates_param_mismatch_fails_loudly(spark):
    """Querying a sketch with a smaller width/depth than it was built
    with must raise, not silently underestimate (the structural half of
    the parameter binding; a seed mismatch is invisible and is bound via
    CountMinSink's persisted params instead)."""
    import pytest

    docs = spark.createDataFrame(pd.DataFrame({"text": ["alpha beta"] * 50}))
    sketch = token_cms(docs, width=W, depth=D)
    items = spark.createDataFrame(pd.DataFrame({"token": ["alpha"]}))
    with pytest.raises(ValueError, match="never-underestimate"):
        cms_estimates(sketch, items, "token", width=W // 4, depth=D).collect()


def test_countmin_sink_merge_replay_and_compaction(spark, tmp_path):
    """The streaming sink's pointwise cell merge: deltas sum to the
    sketch of the union, replay of a committed batch is a no-op (the
    additive merge is not idempotent — the commit log makes it
    exactly-once), and snapshot compaction folds without changing the
    read view. Point queries through the sink never underestimate."""
    from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
        CountMinSink,
    )

    import pytest

    sink = CountMinSink(str(tmp_path / "cms"), width=W, depth=D)
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
        sink.estimates(spark, items, "token")
        .toPandas()
        .set_index("item")["est"]
        .to_dict()
    )
    assert est == {"a": 3, "b": 2, "c": 2, "d": 0}

    # params are persisted: reopening with the SAME config works,
    # a different config is refused (deltas must never mix)
    CountMinSink(str(tmp_path / "cms"), width=W, depth=D)
    with pytest.raises(ValueError, match="refusing to reopen"):
        CountMinSink(str(tmp_path / "cms"), width=W, depth=D, seed=1)

    # compaction folds the deltas into one snapshot; read view unchanged,
    # replay of a compacted-away id still a no-op
    res = sink.compact(spark)
    assert res["compacted_deltas"] == 2
    sink.process_batch(token_cms(docs1, width=W, depth=D), 0)
    assert _sketch_dict(sink.read(spark)) == _sketch_dict(whole)


def test_cms_inner_product_join_size(spark):
    """Join-size estimation: the sketch inner product never
    underestimates the true equi-join cardinality, degrades to exact at
    wide width, and folds to 0 against a disjoint or empty side."""
    from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
        cms_inner_product,
    )

    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 3 + ["b"] * 2 + ["x"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 4 + ["b"] * 1 + ["y"] * 5})
    )
    # true |left JOIN right ON k| = 3*4 + 2*1 = 14
    wide = 1 << 12
    a = cms_build(left, "k", width=wide, depth=D)
    b = cms_build(right, "k", width=wide, depth=D)
    assert cms_inner_product(a, b).collect()[0]["est"] == 14

    # narrow width: collisions only ever ADD cross terms
    a4 = cms_build(left, "k", width=4, depth=D)
    b4 = cms_build(right, "k", width=4, depth=D)
    assert cms_inner_product(a4, b4).collect()[0]["est"] >= 14

    # disjoint keys at wide width: (deterministically) no shared cells
    disjoint = cms_build(
        spark.createDataFrame(pd.DataFrame({"k": ["z1", "z2"]})),
        "k",
        width=wide,
        depth=D,
    )
    assert cms_inner_product(a, disjoint).collect()[0]["est"] == 0

    # empty side folds to 0, not null
    empty = cms_build(left.filter(F.lit(False)), "k", width=wide, depth=D)
    assert cms_inner_product(a, empty).collect()[0]["est"] == 0
    assert cms_inner_product(empty, a).collect()[0]["est"] == 0
