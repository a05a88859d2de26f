"""Corpus drift (JS divergence + total variation): DuckDB tolerance
oracle on the driver corpus (float/ln venue — the doc_unigram_logprob /
BM25 rule), planted closed-form fixtures, orientation, and symmetry."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from conftest import SF_DIR, duck_sql
from crypto_near_real_time_data_ingestion_spark.operators.drift import (
    DRIFT_ORACLE_SQL_TEMPLATE,
    corpus_drift,
)
from crypto_near_real_time_data_ingestion_spark.plans import documents_gold as dg


def _docs(spark, texts):
    return spark.createDataFrame(pd.DataFrame({"text": pd.Series(texts, dtype="object")}))


def test_drift_matches_duckdb_oracle(spark):
    """Split the driver corpus by doc_id parity and compare both
    divergences against DuckDB computing the identical formula."""
    docs = dg.read_documents(spark, SF_DIR)
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    got = corpus_drift(a, b).collect()[0]
    want = duck_sql(
        DRIFT_ORACLE_SQL_TEMPLATE.format(
            a="SELECT text FROM documents WHERE doc_id % 2 = 0",
            b="SELECT text FROM documents WHERE doc_id % 2 = 1",
        )
    ).iloc[0]
    assert got["js_divergence"] == pytest.approx(want["js_divergence"], rel=1e-9)
    assert got["total_variation"] == pytest.approx(
        want["total_variation"], rel=1e-9
    )
    # a real split of a real corpus drifts some but not maximally
    assert 0 < got["js_divergence"] < math.log(2)
    assert 0 < got["total_variation"] < 1


def test_drift_identical_corpora_is_zero(spark):
    docs = dg.read_documents(spark, SF_DIR).limit(100)
    row = corpus_drift(docs, docs).collect()[0]
    assert row["js_divergence"] == pytest.approx(0.0, abs=1e-12)
    assert row["total_variation"] == pytest.approx(0.0, abs=1e-12)
    assert row["n_tokens_a"] == row["n_tokens_b"]
    assert row["vocab_a"] == row["vocab_b"] == row["vocab_shared"]


def test_drift_disjoint_vocabulary_attains_bounds(spark):
    """Disjoint vocabularies: JS = ln 2 exactly, TV = 1 exactly —
    the closed-form maxima."""
    a = _docs(spark, ["aa bb aa", "cc"])
    b = _docs(spark, ["xx yy", "zz zz zz"])
    row = corpus_drift(a, b).collect()[0]
    assert row["js_divergence"] == pytest.approx(math.log(2), rel=1e-12)
    assert row["total_variation"] == pytest.approx(1.0, rel=1e-12)
    assert row["vocab_shared"] == 0


def test_drift_planted_closed_form(spark):
    """Hand-computed: A = {a:1/2, b:1/2}, B = {a:1/4, b:3/4}."""
    a = _docs(spark, ["a b a b"])
    b = _docs(spark, ["a b b b"])
    row = corpus_drift(a, b).collect()[0]
    p, q = [0.5, 0.5], [0.25, 0.75]
    js = 0.0
    for pi, qi in zip(p, q):
        m = (pi + qi) / 2
        js += 0.5 * (pi * math.log(pi / m) + qi * math.log(qi / m))
    tv = 0.5 * sum(abs(pi - qi) for pi, qi in zip(p, q))
    assert row["js_divergence"] == pytest.approx(js, rel=1e-12)
    assert row["total_variation"] == pytest.approx(tv, rel=1e-12)


def test_drift_orientation_and_symmetry(spark):
    """A bigger perturbation drifts further, and both divergences are
    symmetric in their arguments."""
    base = _docs(spark, ["a b c d e f g h"] * 10)
    small = _docs(spark, ["a b c d e f g h"] * 9 + ["a b c d e f g x"])
    large = _docs(spark, ["a b c d x y z w"] * 10)
    js_small = corpus_drift(base, small).collect()[0]["js_divergence"]
    js_large = corpus_drift(base, large).collect()[0]["js_divergence"]
    assert 0 < js_small < js_large
    fwd = corpus_drift(base, large).collect()[0]
    rev = corpus_drift(large, base).collect()[0]
    assert fwd["js_divergence"] == pytest.approx(rev["js_divergence"], rel=1e-12)
    assert fwd["total_variation"] == pytest.approx(
        rev["total_variation"], rel=1e-12
    )


def test_drift_empty_side_is_null_not_zero(spark):
    """'Nothing to compare' must not alias 'no drift': an empty side
    yields NULL divergences; two empty sides yield an empty frame."""
    a = _docs(spark, ["a b"])
    empty = _docs(spark, [None])
    row = corpus_drift(a, empty).collect()[0]
    assert row["js_divergence"] is None
    assert row["total_variation"] is None
    assert row["n_tokens_a"] == 2 and row["n_tokens_b"] == 0
    # both-empty: still exactly one row (the sketch_drift shape contract),
    # NULL divergences, zeroed counters
    rows = corpus_drift(empty, empty).collect()
    assert len(rows) == 1
    assert rows[0]["js_divergence"] is None
    assert rows[0]["n_tokens_a"] == 0 and rows[0]["vocab_shared"] == 0


def test_sketch_drift_is_certified_floor(spark):
    """Data-processing inequality: the sketch-bucket divergences never
    exceed the true ones at ANY width, and reach them exactly once the
    width is collision-free (deterministically, at this seed)."""
    from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
        token_cms,
    )
    from crypto_near_real_time_data_ingestion_spark.operators.drift import (
        sketch_drift,
    )

    docs = dg.read_documents(spark, SF_DIR)
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    true_row = corpus_drift(a, b).collect()[0]
    for width in (8, 64, 1 << 16):
        row = sketch_drift(
            token_cms(a, width=width), token_cms(b, width=width), width=width
        ).collect()[0]
        assert row["js_floor"] <= true_row["js_divergence"] + 1e-12, width
        assert row["tv_floor"] <= true_row["total_variation"] + 1e-12, width
        assert row["js_floor"] >= 0 and row["tv_floor"] >= 0
    wide = sketch_drift(
        token_cms(a, width=1 << 16), token_cms(b, width=1 << 16), width=1 << 16
    ).collect()[0]
    assert wide["js_floor"] == pytest.approx(true_row["js_divergence"], rel=1e-9)
    assert wide["tv_floor"] == pytest.approx(
        true_row["total_variation"], rel=1e-9
    )


def test_sketch_drift_identical_and_empty(spark):
    from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
        token_cms,
    )
    from crypto_near_real_time_data_ingestion_spark.operators.drift import (
        sketch_drift,
    )

    docs = dg.read_documents(spark, SF_DIR).limit(50)
    s = token_cms(docs)
    same = sketch_drift(s, s).collect()[0]
    assert same["js_floor"] == pytest.approx(0.0, abs=1e-12)
    assert same["tv_floor"] == pytest.approx(0.0, abs=1e-12)
    empty = token_cms(_docs(spark, [None]))
    row = sketch_drift(s, empty).collect()[0]
    assert row["js_floor"] is None and row["tv_floor"] is None


def test_sketch_drift_param_mismatch_fails_loudly(spark):
    """Sketches built wider than the declared parameters must raise —
    comparing cells from different pushforward maps would certify drift
    that does not exist."""
    from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
        token_cms,
    )
    from crypto_near_real_time_data_ingestion_spark.operators.drift import (
        sketch_drift,
    )

    docs = dg.read_documents(spark, SF_DIR).limit(50)
    wide = token_cms(docs, width=1024)
    with pytest.raises(ValueError, match="inconsistent with"):
        sketch_drift(wide, wide, width=8).collect()


def test_drift_by_group_vs_duckdb_and_planted(spark):
    """Grouped drift: one source identical (→ 0), one disjoint (→ ln 2 /
    TV 1), one present only on side A (→ NULL, counts kept); the real-
    corpus grouped values match DuckDB computing the same per-group
    formula."""
    from crypto_near_real_time_data_ingestion_spark.operators.drift import (
        corpus_drift_by,
    )

    a = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["same", "same", "moved", "gone"],
                "text": ["x y", "z", "aa bb", "only here"],
            }
        )
    )
    b = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["same", "same", "moved"],
                "text": ["x y", "z", "cc dd"],
            }
        )
    )
    rows = {
        r["source"]: r for r in corpus_drift_by(a, b, "source").collect()
    }
    assert rows["same"]["js_divergence"] == pytest.approx(0.0, abs=1e-12)
    assert rows["moved"]["js_divergence"] == pytest.approx(
        math.log(2), rel=1e-12
    )
    assert rows["moved"]["total_variation"] == pytest.approx(1.0, rel=1e-12)
    assert rows["gone"]["js_divergence"] is None
    assert rows["gone"]["n_tokens_a"] == 2 and rows["gone"]["n_tokens_b"] == 0

    # real corpus, grouped oracle in DuckDB (same formula per source)
    docs_a = "SELECT source, text FROM documents WHERE doc_id % 2 = 0"
    docs_b = "SELECT source, text FROM documents WHERE doc_id % 2 = 1"
    want = duck_sql(f"""
        WITH ta AS (SELECT source AS grp,
                 unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
            FROM ({docs_a}) WHERE text IS NOT NULL),
        tb AS (SELECT source AS grp,
                 unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS token
            FROM ({docs_b}) WHERE text IS NOT NULL),
        fa AS (SELECT grp, token, count(*) AS ca FROM ta GROUP BY 1, 2),
        fb AS (SELECT grp, token, count(*) AS cb FROM tb GROUP BY 1, 2),
        j AS (SELECT coalesce(fa.grp, fb.grp) AS grp,
                     coalesce(fa.ca, 0) AS ca, coalesce(fb.cb, 0) AS cb
              FROM fa FULL OUTER JOIN fb
                ON fa.grp = fb.grp AND fa.token = fb.token),
        t AS (SELECT grp, sum(ca) AS na, sum(cb) AS nb FROM j GROUP BY 1)
        SELECT j.grp,
          sum(CASE WHEN ca > 0 THEN (ca / t.na) * ln((ca / t.na) /
                ((ca / t.na + cb / t.nb) / 2)) ELSE 0 END
            + CASE WHEN cb > 0 THEN (cb / t.nb) * ln((cb / t.nb) /
                ((ca / t.na + cb / t.nb) / 2)) ELSE 0 END) / 2 AS js
        FROM j JOIN t ON j.grp = t.grp
        GROUP BY j.grp
    """).set_index("grp")["js"]
    docs = dg.read_documents(spark, SF_DIR)
    got = {
        r["source"]: r["js_divergence"]
        for r in corpus_drift_by(
            docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
        ).collect()
    }
    assert set(got) == set(want.index)
    for src, js in got.items():
        if math.isnan(want[src]):
            # a source present on only one side of the split: the oracle's
            # bare formula degenerates to NaN, the operator contractually
            # reports NULL ("nothing to compare")
            assert js is None, src
        else:
            assert js == pytest.approx(want[src], rel=1e-9), src


def test_streaming_drift_monitor_composition(spark, tmp_path):
    """The streaming story end-to-end: a CountMinSink accumulates
    per-batch sketch deltas; drift of the accumulated stream vs a static
    reference sketch is a read-side sketch_drift — and equals the batch
    sketch_drift over the same data (exactly-once through replay)."""
    from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
        token_cms,
    )
    from crypto_near_real_time_data_ingestion_spark.operators.drift import (
        sketch_drift,
    )
    from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
        CountMinSink,
    )

    W2 = 64
    reference = token_cms(_docs(spark, ["a b c d", "a b"]), width=W2)
    sink = CountMinSink(str(tmp_path / "drift_cms"), width=W2)
    batches = [["a b", "c"], ["x y z"], ["a"]]
    for i, texts in enumerate(batches):
        sink.process_batch(token_cms(_docs(spark, texts), width=W2), i)
    sink.process_batch(token_cms(_docs(spark, batches[1]), width=W2), 1)  # replay
    streamed = sketch_drift(sink.read(spark), reference, width=W2).collect()[0]
    whole = token_cms(_docs(spark, [t for b in batches for t in b]), width=W2)
    batch_row = sketch_drift(whole, reference, width=W2).collect()[0]
    assert streamed["js_floor"] == pytest.approx(batch_row["js_floor"], rel=1e-12)
    assert streamed["tv_floor"] == pytest.approx(batch_row["tv_floor"], rel=1e-12)
    assert streamed["js_floor"] > 0  # the stream genuinely drifted
