"""Cleansing expressions for the silver layer.

Transcript-domain analog of the reference silver job's repair battery:
required-field predicate (``silver_glue_job.py:253-255``), negative→null
repair (``:260-261``), NaN→null repair (``:258-263``), explicit cast
battery (``gold_features_base_job.py:36-58``), sha2 dedup key
(``silver_glue_job.py:266-268``). All pure Catalyst Column expressions —
JVM-side, whole-stage-codegen friendly; zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def required_fields_filter() -> Column:
    """Rows must have a key, a non-negative turn index, a role, and event time.

    Analog of "non-null event time AND (id OR symbol OR name)"
    (``silver_glue_job.py:253-255``) — here the key is mandatory, not
    alternative, because (conv_id, turn_idx) is the dedup identity.
    """
    return (
        F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
        & (F.col("turn_idx") >= F.lit(0))
        & F.col("role").isNotNull()
        & F.col("ts").isNotNull()
    )


def cleanse_turns(df: DataFrame) -> DataFrame:
    """Filter + normalize a raw transcripts DataFrame (batch or streaming).

    * drop rows failing :func:`required_fields_filter`
    * ``role`` → lower(trim) (enum normalization)
    * ``tool`` → trimmed, empty-string → null (negative→null analog)
    * ``text`` preserved byte-exact (per-turn text-equality invariant)
    * explicit casts pin the output schema (cast battery analog)
    """
    return df.filter(required_fields_filter()).select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.lower(F.trim(F.col("role"))).alias("role"),
        F.col("text").cast("string").alias("text"),
        F.nullif(F.trim(F.col("tool")), F.lit("")).alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


def dedup_key() -> Column:
    """sha2 surrogate dedup key over the natural key, as the reference builds
    (``silver_glue_job.py:266-268``). The engine deduplicates on the typed
    key columns directly (null-exact, cheaper); this expression exists for
    parity and for sinks that want a single-key layout."""
    return F.sha2(F.concat_ws("||", F.col("conv_id"), F.col("turn_idx")), 256)
