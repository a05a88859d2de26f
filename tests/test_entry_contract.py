"""Driver-contract smoke: every queries() entry runs; every oracle matches
at the tiny scale (sf0.001 stand-in for the driver's sf0.01 gate).

The heavyweight per-query oracle checks live in the dedicated test modules;
this test guards the CONTRACT itself — names, column alignment, and the
two newest entries (JSON props parse, SQL-view layer).
"""

from __future__ import annotations

import duckdb

from conftest import SF_DIR, assert_df_equal, duck_sql
import __spark_entry__ as entry


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]


def test_oracle_keys_subset_of_queries():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    # every query is oracle-graded — no rows-only entries left (the
    # custom-hash ops re-derive their hashes in DuckDB HUGEINT SQL; the
    # approximate-index ops are exact by construction or recall-pinned)
    assert set(q) == set(o)


def test_bench_json_line_fits_driver_tail():
    """The round driver keeps only the LAST 2000 chars of bench.py
    stdout and parses the result JSON out of that tail — round 2's line
    overflowed the window and the driver recorded ``parsed: null``.
    Rebuild the line bench.py prints (same keys, compact separators,
    worst-case numeric widths) over the LIVE registry, so adding a
    query that would push the line past the window fails here instead
    of silently costing the round its BENCH artifact."""
    import json

    names = ["streaming_drain_total", *entry.queries()]
    result = {
        "metric": "bench_total",
        "value": 99999.99,
        "unit": "sec",
        # realistic-worst per-query width: the costliest entry ever
        # recorded is the 105 s drain total; bench.py rounds per-query
        # timings to ONE decimal (0.1 s line-item resolution), so 999.9
        # (5 chars) bounds it
        "queries": {n: 999.9 for n in names},
        "sf": 0.1,
        # mirror of bench.py main()'s streaming block, worst-case widths
        "streaming": {
            "bench_turns": 8000000,
            "cores_N": 32,
            "cores_4N": 128,
            "turns_per_sec_N": 999999.9,
            "turns_per_sec_4N": 999999.9,
            "samples_N": [999999.9] * 3,
            "samples_4N": [999999.9] * 3,
            "scaling_efficiency": 1.063,
            "turns_per_sec_peak": 999999.9,
            "peak_cores": 32,
            "p99_batch_latency_s_N": 999.999,
            "p99_batch_latency_s_4N": 999.999,
            "p99_batch_latency_s_small_batches": 999.999,
        },
    }
    line = json.dumps(result, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"bench JSON line projects to {len(line)} chars — the driver's "
        "2000-char stdout tail will clip it; retire a query or shorten keys"
    )


def test_events_props_parse(spark):
    from crypto_near_real_time_data_ingestion_spark.plans import events_gold as eg

    got = eg.events_props_parse(eg.read_events(spark, SF_DIR))
    want = duck_sql(eg.EVENTS_PROPS_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["event_type"])


def test_events_json_entities(spark):
    """P4-P6 literal: explode_outer keeps empty-array and malformed rows,
    map_entries flattens the attrs map, struct fields flatten to columns."""
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.plans import events_gold as eg

    events = eg.read_events(spark, SF_DIR)
    got = eg.events_json_entities(events)
    want = duck_sql(eg.EVENTS_JSON_ENTITIES_ORACLE_SQL)
    assert_df_equal(got, want, sort_cols=["event_id", "entity_name"])
    # explode_outer row-preservation: every source event appears
    assert got.select("event_id").distinct().count() == events.count()
    # malformed rows survive as all-null rows
    assert (
        got.filter((F.col("event_id") % 7 == 0) & F.col("attrs_flat").isNull()).count()
        > 0
    )


def test_sql_view_gold_hour(spark, transcripts_parquet):
    from crypto_near_real_time_data_ingestion_spark.plans.gold_windows import (
        WINDOW_STATS_ORACLE_SQL_TEMPLATE,
    )

    got = entry._sql_view_gold_hour(spark, SF_DIR)
    want = duckdb.sql(
        WINDOW_STATS_ORACLE_SQL_TEMPLATE.format(path=transcripts_parquet, grain="hour")
    ).df()
    assert_df_equal(got, want, sort_cols=["conv_id", "window_start"])
