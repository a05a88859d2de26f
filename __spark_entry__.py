"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The engine's primary input (per ``BASELINE.json`` input_hint) is a
transcripts table that does not ship in ``/root/testdata`` — it is
synthesized deterministically (seed=42, no wall clock, no external data)
by ``crypto_near_real_time_data_ingestion_spark.datagen`` into
``/root/repo/data/transcripts/sf{sf}/``. Oracle SQL for transcript
queries reads the same parquet via DuckDB ``read_parquet``; queries over
driver-provided tables (events/documents/embeddings) use the
pre-registered views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_near_real_time_data_ingestion_spark.datagen import (  # noqa: E402
    ensure_transcripts,
    sf_from_dir,
)
from crypto_near_real_time_data_ingestion_spark.operators import joins as joins_op  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.operators import (  # noqa: E402
    sessionize as sessions_op,
)
from crypto_near_real_time_data_ingestion_spark.plans import events_gold as eg  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import gold_features  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import gold_windows  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.plans import silver as silver_plan  # noqa: E402
from crypto_near_real_time_data_ingestion_spark.sources import read_transcripts  # noqa: E402

# The driver's correctness gate runs at sf=0.01; materialize that scale's
# transcripts (and the smoke scale) eagerly so oracle SQL paths exist.
_ORACLE_SF = 0.01
_SMOKE_SF = 0.001


def _tpath(sf: float) -> str:
    return ensure_transcripts(sf)


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_transcripts(spark, _tpath(sf_from_dir(sf_dir)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the silver cleanse+dedup pipeline."""
    return silver_plan.silver_batch(_transcripts(spark, "sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    def _silver(spark, sf_dir):
        return silver_plan.silver_batch(_transcripts(spark, sf_dir))

    # --- medallion pipeline over transcripts (SURVEY §2: P11-P16, W1-W4,
    # A3-A5, J2, streaming-analog batch oracles) ----------------------------
    q["silver_cleanse_dedup"] = _silver
    q["gold_window_stats_hour"] = lambda s, d: gold_windows.conv_window_stats(
        _silver(s, d), "hour"
    )
    q["gold_window_stats_day"] = lambda s, d: gold_windows.conv_window_stats(
        _silver(s, d), "day"
    )
    q["gold_sessions_30m"] = lambda s, d: sessions_op.sessionize_batch(_silver(s, d))
    q["gold_user_response_pairs"] = lambda s, d: joins_op.user_response_pairs(
        _silver(s, d)
    )
    q["gold_conv_features"] = lambda s, d: gold_features.conv_features(_silver(s, d))

    # --- reference gold programs on the driver-provided events table
    # (W1/W2 keep-latest, A1 QA agg, W5-W10+A2+J1/J2 ML features) -----------
    q["events_dedup_latest"] = lambda s, d: eg.events_dedup_latest(
        eg.read_events(s, d)
    )
    q["events_minute_qa"] = lambda s, d: eg.events_minute_qa(eg.read_events(s, d))
    q["events_ml_features"] = lambda s, d: eg.events_ml_features(eg.read_events(s, d))

    return q


def oracle_sql() -> dict[str, str]:
    path = _tpath(_ORACLE_SF)
    return {
        "silver_cleanse_dedup": silver_plan.SILVER_ORACLE_SQL_TEMPLATE.format(path=path),
        "gold_window_stats_hour": gold_windows.WINDOW_STATS_ORACLE_SQL_TEMPLATE.format(
            path=path, grain="hour"
        ),
        "gold_window_stats_day": gold_windows.WINDOW_STATS_ORACLE_SQL_TEMPLATE.format(
            path=path, grain="day"
        ),
        "gold_sessions_30m": sessions_op.SESSIONS_ORACLE_SQL_TEMPLATE.format(
            path=path, gap_s=1800
        ),
        "gold_user_response_pairs": joins_op.PAIRS_ORACLE_SQL_TEMPLATE.format(path=path),
        "gold_conv_features": gold_features.CONV_FEATURES_ORACLE_SQL_TEMPLATE.format(
            path=path, gap_s=1800
        ),
        "events_dedup_latest": eg.EVENTS_DEDUP_ORACLE_SQL,
        "events_minute_qa": eg.EVENTS_MINUTE_QA_ORACLE_SQL,
        "events_ml_features": eg.EVENTS_ML_ORACLE_SQL,
    }
