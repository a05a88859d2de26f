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
