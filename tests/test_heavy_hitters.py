"""Misra-Gries heavy hitters: certified-bound contracts vs the exact twin
(same pattern as the HLL / GK sketch tests — approximate ops are graded
by their guarantees, not a value hash)."""

from __future__ import annotations

import pandas as pd

from conftest import SF_DIR
from crypto_near_real_time_data_ingestion_spark.operators.heavy_hitters import (
    _mg_trim,
    token_counts_exact,
    token_heavy_hitters,
)
from crypto_near_real_time_data_ingestion_spark.plans import documents_gold as dg

K = 64


def test_heavy_hitters_certified_bounds(spark):
    docs = dg.read_documents(spark, SF_DIR).repartition(16)
    exact = (
        token_counts_exact(docs).toPandas().set_index("token")["count"].to_dict()
    )
    hh = token_heavy_hitters(docs, k=K).toPandas()
    assert len(hh) > 0
    und = int(hh["max_undercount"].iloc[0])
    n = sum(exact.values())

    # 1. analytic bound on the accumulated decrement: sum over partitions
    #    of n_p/(k+1) <= n/(k+1)
    assert 0 <= und <= n // (K + 1)

    # 2. every reported count is an under-estimate within the bound
    for token, count in zip(hh["token"], hh["count"]):
        true = exact[token]  # no false tokens: must exist
        assert 0 < count <= true
        assert true - count <= und

    # 3. completeness: every token with true count > bound is present
    reported = set(hh["token"])
    for token, true in exact.items():
        if true > und:
            assert token in reported, f"missing heavy hitter {token} ({true} > {und})"


def test_heavy_hitters_small_k_still_complete(spark):
    """k = 8 forces aggressive trimming — the guarantee must hold even
    when almost everything is decremented away."""
    docs = dg.read_documents(spark, SF_DIR).repartition(16)
    exact = (
        token_counts_exact(docs).toPandas().set_index("token")["count"].to_dict()
    )
    hh = token_heavy_hitters(docs, k=8).toPandas()
    und = int(hh["max_undercount"].iloc[0]) if len(hh) else 0
    reported = set(hh["token"])
    for token, true in exact.items():
        if true > und:
            assert token in reported


def test_heavy_hitters_all_null_text(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"text": pd.Series([None, None], dtype="object")})
    )
    hh = token_heavy_hitters(docs, k=4).toPandas()
    assert len(hh) == 0


def test_mg_trim_unit():
    s = pd.Series({"a": 10, "b": 7, "c": 7, "d": 3, "e": 1})
    trimmed, dec = _mg_trim(s, k=2)
    # (k+1)-th largest of [10,7,7,3,1] is 7 -> subtract 7, keep > 0
    assert dec == 7
    assert trimmed.to_dict() == {"a": 3}
    # no-op when already small
    trimmed2, dec2 = _mg_trim(s, k=5)
    assert dec2 == 0 and trimmed2.equals(s)


def test_additive_sink_merge_and_replay(spark, tmp_path):
    """The streaming sink's pointwise merge sums per-batch summaries, and
    the commit log makes the NON-idempotent additive merge exactly-once:
    replaying a committed batch id must not double-count."""
    from crypto_near_real_time_data_ingestion_spark.operators.heavy_hitters import (
        mg_batch_summary,
    )
    from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
        AdditiveSummarySink,
    )

    sink = AdditiveSummarySink(str(tmp_path / "hh"))
    docs1 = spark.createDataFrame([("a b a",), ("b c",)], ["text"])
    docs2 = spark.createDataFrame([("a",)], ["text"])
    sink.process_batch(mg_batch_summary(docs1, k=1024), 0)
    sink.process_batch(mg_batch_summary(docs2, k=1024), 1)
    sink.process_batch(mg_batch_summary(docs2, k=1024), 1)  # replay → no-op
    rows = sink.read(spark).collect()
    assert {r["token"]: r["count"] for r in rows} == {"a": 3, "b": 2, "c": 1}
    assert all(r["max_undercount"] == 0 for r in rows)


def test_additive_sink_trimming_regime_bounds(spark, tmp_path):
    """Small k across several merged batch deltas: the summed decrements
    still certify [count, count + max_undercount] for every survivor, and
    every token with true count > max_undercount survives (mergeable-
    summaries guarantee across the sink's pointwise addition)."""
    from crypto_near_real_time_data_ingestion_spark.operators.heavy_hitters import (
        mg_batch_summary,
    )
    from crypto_near_real_time_data_ingestion_spark.streaming.sinks import (
        AdditiveSummarySink,
    )

    docs = dg.read_documents(spark, SF_DIR).limit(200).cache()
    exact = {
        r["token"]: r["count"] for r in token_counts_exact(docs).collect()
    }
    sink = AdditiveSummarySink(str(tmp_path / "hh_trim"))
    # three deltas over disjoint slices (simulating three micro-batches)
    parts = docs.randomSplit([1.0, 1.0, 1.0], seed=7)
    for i, p in enumerate(parts):
        sink.process_batch(mg_batch_summary(p, k=8), i)
    rows = sink.read(spark).collect()
    assert rows
    bound = rows[0]["max_undercount"]
    assert bound > 0  # k=8 genuinely trims on this corpus
    got = {r["token"]: r["count"] for r in rows}
    for tok, cnt in got.items():
        assert cnt <= exact[tok] <= cnt + bound, tok
    for tok, true_cnt in exact.items():
        if true_cnt > bound:
            assert tok in got, f"guaranteed survivor {tok} missing"
