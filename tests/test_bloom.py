"""Bloom-filter membership (operators/bloom.py) and the bloom-backed
decontamination plan.

The filter is probabilistic, so (like the HLL and GK sketches) its
verification is invariant-based rather than a DuckDB value hash:

  * NO false negatives — every key that went in tests positive. This
    is exact, not statistical, so it is asserted for every eval
    shingle.
  * false-positive rate bounded — measured FPP on a disjoint probe set
    stays within a small multiple of the closed form (everything is
    seed-free and deterministic: same data -> same bitmap -> same FPs).
  * the bloom decontamination dominates the exact one ONE-SIDEDLY:
    per-doc n_overlap >= exact n_overlap, contaminated ⊇ exact
    contaminated, and at the test sizing (m generous for the corpus)
    the two agree on virtually every document.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from conftest import SF_DIR

from crypto_near_real_time_data_ingestion_spark.operators.bloom import (
    BLOOM_K,
    bloom_count_members,
    build_bloom,
    probe_bloom,
    theoretical_fpp,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    DECONTAM_EVAL_BYTE_MIN,
    _md5_byte,
    doc_decontaminate,
    doc_decontaminate_bloom,
    doc_shingles,
)

M_BITS = 1 << 20


def _eval_grams(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = doc_shingles(docs, 3).withColumn("hb", _md5_byte(F.col("doc_id")))
    return (
        sh.filter(F.col("hb") >= DECONTAM_EVAL_BYTE_MIN)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )


def test_no_false_negatives(spark):
    grams = _eval_grams(spark).cache()
    words = build_bloom(grams, "s", M_BITS, BLOOM_K)
    probed = probe_bloom(grams, "s", words, M_BITS, BLOOM_K)
    n = probed.count()
    n_member = probed.filter("maybe_member").count()
    assert n > 0
    assert n_member == n  # a Bloom filter NEVER misses an inserted key


def test_false_positive_rate_bounded(spark):
    grams = _eval_grams(spark).cache()
    n_keys = grams.count()
    words = build_bloom(grams, "s", M_BITS, BLOOM_K)
    # probe keys disjoint by construction: eval shingles are space-joined
    # lowercase [a-z0-9]+ trigrams, these contain ':' so can never collide
    probes = spark.range(50_000).select(
        F.concat(F.lit("fp:probe:"), F.col("id")).alias("s")
    )
    fp = probe_bloom(probes, "s", words, M_BITS, BLOOM_K).filter("maybe_member").count()
    fpp = fp / 50_000
    bound = max(3 * theoretical_fpp(n_keys, M_BITS, BLOOM_K), 1e-4)
    assert fpp <= bound, f"measured FPP {fpp} exceeds bound {bound} (n={n_keys})"


def test_count_members_handles_empty_arrays(spark):
    words = np.full(M_BITS // 64, -1, dtype=np.int64)  # all bits set
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, ["c"])], "id long, arr array<string>"
    )
    got = {
        r["id"]: r["n_member"]
        for r in bloom_count_members(df, "arr", words, M_BITS, BLOOM_K).collect()
    }
    assert got == {1: 2, 2: 0, 3: 1}


def test_bloom_decontam_dominates_exact(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = doc_decontaminate(docs).toPandas().set_index("doc_id").sort_index()
    bloom = (
        doc_decontaminate_bloom(docs, m_bits=M_BITS, k=BLOOM_K)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(exact.index) == list(bloom.index)
    assert (exact["n_shingles"] == bloom["n_shingles"]).all()
    # one-sided error: bloom can only overcount, never undercount
    assert (bloom["n_overlap"] >= exact["n_overlap"]).all()
    assert bool((~exact["contaminated"] | bloom["contaminated"]).all()), (
        "exact-contaminated doc escaped the bloom flag (false negative!)"
    )
    # at this sizing the overcount should be essentially nonexistent
    agree = (bloom["n_overlap"] == exact["n_overlap"]).mean()
    assert agree >= 0.99, f"bloom/exact n_overlap agreement only {agree:.3f}"


def test_bloom_probe_is_map_only(spark):
    """The decontamination probe must be shuffle-free: shingling, position
    derivation, the vectorized bit test, and the per-doc count all happen
    in one map pass (the exact path pays an explode + groupBy exchange)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = np.zeros(M_BITS // 64, dtype=np.int64)
    sh = doc_shingles(docs, 3).withColumn("hb", _md5_byte(F.col("doc_id")))
    probe = bloom_count_members(
        sh.filter(F.col("hb") < DECONTAM_EVAL_BYTE_MIN),
        "shingles",
        words,
        M_BITS,
        BLOOM_K,
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:500]


def test_bloom_probe_composes_with_streaming(spark, tmp_path):
    """Deployment shape: decontamination runs AT INGEST — the probe is a
    stateless map-only transform, so the same ``probe_bloom`` call drops
    into a streaming query unchanged (no watermark, no state store).
    Drain a file stream of the documents corpus through the probe and
    require bit-equal flags to the batch probe."""
    import pyspark.sql.functions as F2

    grams = _eval_grams(spark).cache()
    words = build_bloom(grams, "s", M_BITS, BLOOM_K)

    batch = {
        r["s"]: r["maybe_member"]
        for r in probe_bloom(grams, "s", words, M_BITS, BLOOM_K).collect()
    }

    src = str(tmp_path / "gram_stream")
    grams.write.parquet(src)
    stream = spark.readStream.schema("s string").parquet(src)
    probed = probe_bloom(stream, "s", words, M_BITS, BLOOM_K)
    out: dict[str, bool] = {}

    def sink(df, _bid):
        for r in df.collect():
            out[r["s"]] = r["maybe_member"]

    q = probed.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert out == batch


def test_null_keys_are_absences(spark):
    """Family contract (cms/hll): NULL items never enter the bitmap and
    NULL probes answer NULL — unfiltered, xxhash64(NULL) = seed would
    insert one phantom key and flag EVERY NULL probe as a member."""
    import pandas as pd

    keys = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "b", None]})
    )
    words = build_bloom(keys, "k")
    probes = probe_bloom(
        spark.createDataFrame(pd.DataFrame({"k": ["a", None, "zzz"]})), "k", words
    ).toPandas().set_index("k", drop=False)
    assert bool(probes.loc["a", "maybe_member"])
    assert probes["maybe_member"].isna().sum() == 1  # the NULL probe
    # an all-NULL build yields an empty bitmap: nothing is a member
    empty_words = build_bloom(
        spark.createDataFrame(pd.DataFrame({"k": [None, None]}), "k string"), "k"
    )
    assert int(np.abs(empty_words).sum()) == 0
