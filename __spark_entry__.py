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

    # --- medallion pipeline over transcripts -------------------------------
    q["silver_cleanse_dedup"] = lambda spark, sf_dir: silver_plan.silver_batch(
        _transcripts(spark, sf_dir)
    )

    return q


def oracle_sql() -> dict[str, str]:
    path = _tpath(_ORACLE_SF)
    return {
        "silver_cleanse_dedup": silver_plan.SILVER_ORACLE_SQL_TEMPLATE.format(path=path),
    }
