"""Dataset fingerprint: an order- and partition-invariant content hash
for released tables — the "did both engines/runs produce the SAME
dataset" check, cheap enough to stamp on every release manifest.

    fingerprint = bit_xor over rows of h(row), with
    h(row) = first 8 hex digits of md5(canonical '|'-joined row string)

XOR makes it invariant to row order, partitioning, engine, and file
layout (the properties a distributed equality check must have), and any
single changed/added/dropped row flips it with probability 1 − 2⁻³².
Beside it, n_rows catches the one blind spot XOR has alone (a row
appearing an even number of times XORs out). This is the same
verification the driver's value-hash performs, reduced to a constant
that can live in a dataset card / release manifest — and portable:
DuckDB computes the identical value from the identical SQL semantics
(md5 of the same canonical string), which is what the oracle pins.

Scale shape: one map-side expression per row + a single 1-row XOR/count
aggregate (partial aggregation makes the shuffle one row per task). No
sort, no collect beyond the 1-row result.

Canonicalization matters and is part of the contract: columns are
joined in CALLER-GIVEN order with '|', NULL encoded as the literal
``\\N`` (distinct from the string "null" or ""), and non-string types
rendered via CAST AS STRING on both engines — keep fingerprinted
columns to strings/integers (floats and timestamps render differently
across engines; hash their integer micro/round6 forms, the same
discipline as the graded oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_TOKEN = "\\N"


def dataset_fingerprint(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: (n_rows, fingerprint) over the given columns in the
    given order."""
    if not cols:
        raise ValueError("cols must be non-empty")
    canon = F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit(NULL_TOKEN)) for c in cols],
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.bit_xor(h), F.lit(0)).cast("long").alias("fingerprint"),
    )


def fingerprint_oracle_sql(table_sql: str, cols: list[str]) -> str:
    """DuckDB twin over any relation SQL: same canonical string, same
    md5-prefix hash, same XOR fold (hex parsed digit-by-digit — DuckDB
    has no hex-string cast; 8 nibbles, horner form like conv)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    canon = " || '|' || ".join(
        f"coalesce(CAST({c} AS VARCHAR), '\\N')" for c in cols
    )
    nibble = "(strpos('0123456789abcdef', substr(md5({c}), {i}, 1)) - 1)"
    hex32 = " + ".join(
        nibble.format(c="canon", i=i + 1) + f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
WITH rows_c AS (SELECT {canon} AS canon FROM ({table_sql}) t)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(bit_xor(CAST({hex32} AS BIGINT)), 0) AS BIGINT)
           AS fingerprint
FROM rows_c
"""
