"""Property-based tests (hypothesis): operator semantics vs plain-Python
reference implementations on randomized tiny frames.

Spark-session-per-example is too slow, so each property batches the
randomized input through ONE Spark job and compares against a pure-pandas
model of the semantics."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crypto_near_real_time_data_ingestion_spark.operators.dedup import dedup_latest_wins
from crypto_near_real_time_data_ingestion_spark.operators.sessionize import (
    sessionize_batch,
)

BASE = dt.datetime(2025, 3, 1)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # conv_id
        st.integers(min_value=0, max_value=5),      # turn_idx
        st.integers(min_value=0, max_value=7200),   # ts offset seconds
        st.booleans(),                              # has tool
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows_strategy)
def test_dedup_latest_wins_property(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "off", "tool"])
    pdf["ts"] = pdf["off"].map(lambda s: BASE + dt.timedelta(seconds=int(s)))
    pdf["event_id"] = range(len(pdf))
    df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "ts", "event_id"]])

    got = (
        dedup_latest_wins(df, ["conv_id", "turn_idx"], "ts", tiebreakers=["event_id"])
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # model: keep the row with max (ts, event_id) per key
    model = (
        pdf.sort_values(["ts", "event_id"])
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()[["conv_id", "turn_idx", "ts", "event_id"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "ts", "event_id"]].astype({"event_id": "int64"}),
        model.astype({"event_id": "int64"}),
        check_dtype=False,
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows_strategy)
def test_sessionize_property(spark, rows):
    # unique (conv, turn) with monotone ts per conv, like silver output
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "off", "tool"])
    pdf = pdf.drop_duplicates(["conv_id", "turn_idx"]).copy()
    pdf = pdf.sort_values(["conv_id", "off", "turn_idx"]).reset_index(drop=True)
    pdf["ts"] = pdf["off"].map(lambda s: BASE + dt.timedelta(seconds=int(s)))
    pdf["role"] = "user"
    pdf["tool"] = pdf["tool"].map(lambda b: "t" if b else None)
    df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "role", "tool", "ts"]])

    got = sessionize_batch(df, gap_s=1800).toPandas()

    # model: gap-and-island per conv on (ts, turn_idx) order
    sessions = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        sid, start, last, n, ntool = 0, None, None, 0, 0
        for _, r in g.iterrows():
            if start is None or (r["ts"] - last).total_seconds() >= 1800:
                if start is not None:
                    sessions.append((conv, sid, start, last, n, ntool))
                sid += 1
                start, n, ntool = r["ts"], 0, 0
            last = r["ts"]
            n += 1
            ntool += 1 if r["tool"] else 0
        sessions.append((conv, sid, start, last, n, ntool))
    model = pd.DataFrame(
        sessions,
        columns=["conv_id", "session_id", "session_start", "session_end", "n_turns", "n_tool_calls"],
    )
    key = ["conv_id", "session_id"]
    got = got.sort_values(key).reset_index(drop=True)
    model = model.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "session_id", "session_start", "session_end", "n_turns", "n_tool_calls"]],
        model,
        check_dtype=False,
    )


# --- hash / winnowing cores vs pure-Python references (no Spark session:
# these pin the numpy-vectorized batch kernels that the DuckDB oracles
# re-derive, so a kernel regression fails here before it fails the
# driver's value hash on some new corpus) -----------------------------------

def _poly_splitmix_ref(s: str) -> int:
    """Straight-line reference: Horner fold then splitmix64, pure ints."""
    M = 1 << 64
    h = 0
    for b in s.encode():
        h = (h * 1099511628211 + b) % M
    x = (h + 0x9E3779B97F4A7C15) % M
    z = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % M
    return z ^ (z >> 31)


ascii_word = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789 "),
    min_size=0,
    max_size=40,
)


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(ascii_word, min_size=1, max_size=50))
def test_vectorized_hash_matches_reference(strings):
    import numpy as np

    from crypto_near_real_time_data_ingestion_spark.operators.text_dedup import (
        _hash_flat_strings,
    )

    got = _hash_flat_strings(strings)
    want = np.array([_poly_splitmix_ref(s) for s in strings], dtype=np.uint64)
    assert (got == want).all()


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(ascii_word, min_size=0, max_size=20), min_size=1, max_size=10
    )
)
def test_minhash_batch_matches_per_doc(doc_shingle_lists):
    """Batched reduceat signatures == per-document computation (including
    empty-document sentinel rows interleaved anywhere in the batch)."""
    import numpy as np
    import pandas as pd

    from crypto_near_real_time_data_ingestion_spark.operators import text_dedup as td

    hashes, starts, lens = td._batch_segments(pd.Series(doc_shingle_lists))
    got = td._minhash_sigs_batch(hashes, starts, lens)
    for i, shingles in enumerate(doc_shingle_lists):
        h = td._hash_flat_strings(list(shingles))
        if len(h) == 0:
            want = np.full(td.N_PERMS, np.iinfo(np.int64).max, dtype=np.int64)
        else:
            hm = h % td._MERSENNE
            with np.errstate(over="ignore"):
                vals = (td._A[:, None] * hm[None, :] + td._B[:, None]) % td._MERSENNE
            want = vals.min(axis=1).astype(np.int64)
        assert (got[i] == want).all(), f"doc {i}"


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-100, max_value=100), min_size=0, max_size=40),
       st.integers(min_value=2, max_value=6))
def test_winnow_selection_matches_naive(hash_seq, window):
    """sliding_window_view min-selection == the naive O(n·w) definition."""
    import numpy as np

    h = np.array(hash_seq, dtype=np.int64)
    if len(h) == 0:
        return
    if len(h) <= window:
        got = {int(h.min())}
    else:
        view = np.lib.stride_tricks.sliding_window_view(h, window)
        got = set(int(x) for x in view.min(axis=1))
    naive = set()
    if len(h) <= window:
        naive = {int(min(h))}
    else:
        for i in range(len(h) - window + 1):
            naive.add(int(min(h[i : i + window])))
    assert got == naive
