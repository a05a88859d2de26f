"""Dataset fingerprint: an order- and partition-invariant content hash
for released tables — the "did both engines/runs produce the SAME
dataset" check, cheap enough to stamp on every release manifest.

    fingerprint = Σ over rows of h(row)  (exact — no overflow, see below)
    h(row) = first 8 hex digits of md5(canonical '|'-joined row string)

A SUM of per-row hashes is invariant to row order, partitioning,
engine, and file layout (the properties a distributed equality check
must have) while staying sensitive to multiplicities — unlike XOR,
where any row repeated an even number of times vanishes and {A,A} vs
{C,C} collide deterministically. With 32-bit row hashes the sum stays
below 2⁶³ for up to 2³¹ rows, so it is EXACT in a BIGINT on both
engines (no wrap-semantics divergence: Spark wraps long sums, DuckDB
promotes to HUGEINT — staying under the bound sidesteps both).
Differing datasets collide only with hash probability (~2⁻³² per
changed row), never structurally. This is the driver's value-hash
verification reduced to a constant that can live in a dataset card /
release manifest — and portable: DuckDB computes the identical value
from the identical SQL semantics, which is what the oracle pins.

Scale shape: one map-side expression per row + a single 1-row SUM/count
aggregate (partial aggregation makes the shuffle one row per task). No
sort, no collect beyond the 1-row result.

Canonicalization matters and is part of the contract: columns are
joined in CALLER-GIVEN order with '|' after ESCAPING (backslash doubles,
'|' becomes backslash-pipe) so a '|' inside a value cannot alias column
boundaries (('x|y','z') vs ('x','y|z')); NULL encodes as the UNESCAPED
token ``\\N``, which escaping makes distinct from every literal string
including "\\N" itself. Non-string types render via CAST AS STRING on
both engines — keep fingerprinted columns to strings/integers (floats
and timestamps render differently across engines; hash their integer
micro/round6 forms, the same discipline as the graded oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_TOKEN = "\\N"


def _esc(col):
    """Escape the canonical delimiters: backslash doubles first, then
    '|' → backslash-pipe. NULL bypasses escaping (the token stays bare,
    so no literal value can render as it)."""
    e = F.replace(
        F.replace(col.cast("string"), F.lit("\\"), F.lit("\\\\")),
        F.lit("|"),
        F.lit("\\|"),
    )
    return F.coalesce(e, F.lit(NULL_TOKEN))


def dataset_fingerprint(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: (n_rows, fingerprint) over the given columns in the
    given order. Exact for up to 2³¹ rows (documented sum bound)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    canon = F.concat_ws("|", *[_esc(F.col(c)) for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(h), F.lit(0)).cast("long").alias("fingerprint"),
    )


def fingerprint_oracle_sql(table_sql: str, cols: list[str]) -> str:
    """DuckDB twin over any relation SQL: same escaping, same canonical
    string, same md5-prefix hash, same SUM fold (hex parsed digit-by-
    digit — DuckDB has no hex-string cast; 8 nibbles, horner form like
    conv)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    esc = (
        "coalesce(replace(replace(CAST({c} AS VARCHAR),"
        " '\\', '\\\\'), '|', '\\|'), '\\N')"
    )
    canon = " || '|' || ".join(esc.format(c=c) for c in cols)
    nibble = "(strpos('0123456789abcdef', substr(md5({c}), {i}, 1)) - 1)"
    hex32 = " + ".join(
        nibble.format(c="canon", i=i + 1) + f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
WITH rows_c AS (SELECT {canon} AS canon FROM ({table_sql}) t)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CAST({hex32} AS BIGINT)), 0) AS BIGINT)
           AS fingerprint
FROM rows_c
"""
