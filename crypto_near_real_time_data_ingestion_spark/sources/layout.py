"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning.

The reference's partitioned layouts (`sources/partitioned.py`, reference
`glue_jobs/partitioned_write.py` semantics) prune on ONE dimension — the
partition key. Real gold-table access patterns filter on several
(`ts BETWEEN … AND user_id = …`); a layout sorted by one column spreads
the other across every file, so footer min/max stats prune nothing for
the second predicate. Z-ordering interleaves the bits of the (rank-
normalized) dimensions into a single sort key, so each written FILE
covers a small hyper-rectangle of the key space and parquet footer
min/max on EVERY z-ordered column stays tight — the `OPTIMIZE ZORDER BY`
of Delta/Iceberg, expressed as a plain Spark job:

    zvalue (pure Catalyst bit arithmetic, map-only)
      → repartitionByRange(n_files, zvalue)   # one range shuffle
      → sortWithinPartitions(zvalue)          # in-task sort
      → parquet write                          # one file per range

100 TB shape: the normalization bounds come from one aggregate pass
(min/max per column — at production scale swap in approxQuantile edges
per column to be skew-robust; min/max keeps this module closed-form and
testable), the z-value is whole-stage-codegen bit math, and the range
shuffle is the SAME single exchange any sorted write pays. Like sink
compaction, this is a maintenance/layout job: run it per partition (the
`dt=…` grain), not across the whole table at once.

Pruning is verified from the written files' parquet FOOTERS (pyarrow),
not inferred: `tests/test_zorder.py` computes the fraction of files a
range predicate can skip on each dimension and pins that the z-ordered
layout prunes on BOTH while the linear layout prunes only its leading
column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension; 2 dims × 16 bits fit a positive int32


def _normalize_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a numeric/timestamp column to an integer rank in
    [0, 2^bits) via min/max bounds (constant-foldable once the bounds
    are literal). Degenerate ranges (min == max) map to 0, and NULLs
    rank 0 too (they must land SOMEWHERE deterministic; without the
    coalesce, ``F.least`` would skip the null and silently rank them
    as the TOP bucket, widening that file's ranges on the other
    dimension)."""
    span = cmax - cmin
    frac = F.coalesce(
        F.when(span > 0, (col - cmin) / span), F.lit(0.0)
    )
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (1 << bits)).cast("long"), top.cast("long"))


def _interleave_bits(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton interleave of two `bits`-wide integer columns — pure
    Catalyst shift/or arithmetic (whole-stage codegen, no UDF): bit i of
    ``a`` lands at position 2i+1, bit i of ``b`` at 2i."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        bbit = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z.bitwiseOR(abit).bitwiseOR(bbit)
    return z


class DegenerateZOrderBounds(ValueError):
    """The frame has no rankable values (empty, or a z-order column is
    all-NULL). Distinct from the arity/misuse ValueError so maintenance
    callers can degrade gracefully on THIS case only — a caller bug
    (wrong column count) must still propagate."""


def zorder_value(df: DataFrame, cols: list[str], bits: int = ZBITS) -> DataFrame:
    """Append a ``zvalue`` column interleaving the rank-normalized bits
    of two columns. Bounds come from ONE aggregate pass over ``df``
    (collected as two literals — a bounded driver action, like the IVF
    centroid sample)."""
    if len(cols) != 2:
        raise ValueError("zorder_value interleaves exactly 2 columns")

    def numeric(c: str) -> Column:
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp"):
            # covers TIMESTAMP_NTZ too (session TZ is pinned UTC)
            return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        if dt == "string":
            # order-preserving 2-byte prefix rank (the Delta/Iceberg
            # binary-truncation trick): clustering by prefix keeps the
            # string column's own footer min/max tight, which is what
            # predicates prune on — a hash would cluster but leave every
            # file's min/max spanning the whole domain. F.ascii returns
            # the full Unicode CODEPOINT (can exceed 255), so clamp each
            # position to 255: the map stays weakly monotone (never
            # inverts string order — non-ASCII just coarsens into one
            # top bucket per position) instead of overflowing the radix.
            first = F.least(F.coalesce(F.ascii(F.col(c)), F.lit(0)), F.lit(255))
            second = F.least(
                F.coalesce(F.ascii(F.substring(F.col(c), 2, 1)), F.lit(0)),
                F.lit(255),
            )
            return (first * 256 + second).cast("double")
        # NaN → NULL at the projection: Spark max() treats NaN as the
        # LARGEST value, so one NaN in a float dimension would make the
        # bounds (and every row's frac) NaN — floor(NaN) = 0 silently
        # collapsed the WHOLE dimension to rank 0 with no
        # DegenerateZOrderBounds (r5 review). Nulled, the bounds ignore
        # NaN rows, those rows rank 0 like NULLs (the documented
        # convention), and an ALL-NaN column raises the degenerate
        # guard exactly like an all-NULL one.
        x = F.col(c).cast("double")
        return F.when(~F.isnan(x), x)

    nums = [numeric(c).alias(f"__z{i}") for i, c in enumerate(cols)]
    base = df.select("*", *nums)
    bounds = base.agg(
        F.min("__z0"), F.max("__z0"), F.min("__z1"), F.max("__z1")
    ).first()
    if any(x is None for x in bounds):
        raise DegenerateZOrderBounds(
            f"zorder_value: no non-null values to rank in {cols} "
            "(empty input or an all-null column)"
        )
    lo0, hi0, lo1, hi1 = (F.lit(float(x)) for x in bounds)
    r0 = _normalize_to_bits(F.col("__z0"), lo0, hi0, bits)
    r1 = _normalize_to_bits(F.col("__z1"), lo1, hi1, bits)
    return base.withColumn("zvalue", _interleave_bits(r0, r1, bits)).drop(
        "__z0", "__z1"
    )


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Morton
    curve of ``cols`` — each file covers a compact hyper-rectangle, so
    footer min/max stats prune file scans on EITHER column."""
    (
        zorder_value(df, cols)
        .repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_linear(
    df: DataFrame, path: str, col: str, n_files: int = 16
) -> None:
    """The single-column baseline layout (range-sorted on one key) the
    z-order test compares against."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of the layout's parquet files a ``col BETWEEN lo AND hi``
    predicate can SKIP, computed from the files' own footer min/max
    stats (pyarrow) — the measurement, not an inference from timings."""
    import datetime
    import glob
    import os

    import pyarrow.parquet as pq_  # noqa: N813

    def norm(v):
        # footer timestamp stats parse tz-aware OR naive depending on the
        # writer's logical type (see sinks.py `_ts`); compare in naive UTC
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        if hasattr(v, "tzinfo") and getattr(v, "tzinfo", None) is not None:
            return v.tz_convert("UTC").tz_localize(None)
        return v

    lo, hi = norm(lo), norm(hi)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    skipped = 0
    for f in files:
        md = pq_.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                fmin = None
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None and (norm(fmax) < lo or norm(fmin) > hi):
            skipped += 1
    return skipped / len(files) if files else 0.0
