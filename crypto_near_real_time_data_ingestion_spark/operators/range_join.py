"""Range (interval) join without the cross product — bin bucketing.

The brief's custom-operator list names the range join beside the as-of
join (``operators/asof.py``): match each point t to every interval
[lo, hi) containing it. Spark has no native range-join strategy, so a
plain ``points.join(intervals, (lo <= t) & (t < hi))`` plans a
BroadcastNestedLoopJoin / cartesian product — O(|P|·|I|) comparisons,
unrunnable at scale.

The bucketing reformulation: pick a bin width w; each POINT lives in
exactly one bin (floor(t/w)), each INTERVAL is replicated to every bin
it overlaps (floor(lo/w) … floor((hi−ε)/w)); an equi-join on the bin id
followed by the exact containment filter yields each matching pair
EXACTLY ONCE (the pair meets only in the point's bin — no distinct
needed). Cost: shuffle ∝ |P| + Σ⌈span/w⌉ candidate rows ∝ points ×
intervals-overlapping-their-bin — the classic interval-join bound.

Choosing w: replication per interval is span/w (w too small → interval
blow-up); candidate fan-in per point is the number of intervals
overlapping its bin (w too large → toward all-pairs). The default
derives w from the average interval span (one tiny driver-side agg),
the standard heuristic; results are bin-width-INVARIANT (pinned in
tests), so w is purely a performance knob — like ``sub_blocks`` in the
GEMM tiles, never a correctness knob. Skewed bins (a hot time range)
are AQE's job, same as any hot join key.

Semantics: inner join, half-open containment lo <= t < hi (the
window-semantics convention everywhere in this engine); intervals with
lo >= hi match nothing (guarded — Spark's ``sequence(a, b)`` DESCENDS
when b < a rather than being empty). INTEGER domains: bins are computed
in exact long arithmetic (pmod + integral ``div``), because the obvious
``floor(col / w)`` goes through double division and silently drops
matching pairs past 2^53 (a long t and hi that round to the same double
can land the point one bin PAST the interval's last replica). Join time
columns via ``epoch_us`` casts — the integer-µs discipline of the gold
plans; scale float domains to integers first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _derive_bin_width(intervals: DataFrame, lo: str, hi: str) -> int:
    """Average VALID-interval span, floored at 1 — one 1-row driver agg
    over a column-pruned scan (the offline knob-fit shape; pass
    bin_width explicitly to skip it). Inverted/empty intervals are
    excluded: they match nothing, but their negative spans would drag
    the average toward 1 and blow up every valid interval's replica
    count (sequence length ∝ span/w)."""
    row = (
        intervals.filter(F.col(lo) < F.col(hi))
        .agg(F.avg(F.col(hi) - F.col(lo)).alias("span"))
        .collect()[0]
    )
    span = row["span"]
    return max(1, int(span)) if span is not None else 1


def _floor_div(col_name: str, w: int, negate: bool = False):
    """floor(col/w) (or ceil = −floor(−col/w) with ``negate``) in EXACT
    long arithmetic: pmod's non-negative remainder makes the subtraction
    land on the floor multiple, and integral ``div`` of an exact
    multiple is exact — no double rounding anywhere (see module note)."""
    c = f"(- `{col_name}`)" if negate else f"`{col_name}`"
    e = F.expr(f"({c} - pmod({c}, {w})) div {w}")
    return -e if negate else e


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    t: str,
    lo: str,
    hi: str,
    bin_width: int | None = None,
) -> DataFrame:
    """All (point, interval) pairs with lo <= t < hi, as one equi-join
    on the bin id. Output columns = points' ++ intervals' (the caller
    disambiguates name clashes beforehand, as with any join)."""
    w = bin_width if bin_width is not None else _derive_bin_width(intervals, lo, hi)
    if w < 1:
        raise ValueError(f"bin_width must be >= 1, got {w}")
    for side, name in ((points, "points"), (intervals, "intervals")):
        if "_bin" in side.columns:
            raise ValueError(f"{name} already has a '_bin' column")
    p = points.withColumn("_bin", _floor_div(t, w))
    # last covered bin = ceil(hi/w) − 1, including hi exactly on a bin
    # boundary (half-open ⇒ that bin is NOT covered); lo < hi guarantees
    # the sequence ascends (Spark's sequence DESCENDS on inverted bounds
    # instead of being empty)
    covered = F.sequence(
        _floor_div(lo, w), _floor_div(hi, w, negate=True) - 1
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.when(F.col(lo) < F.col(hi), covered).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    )
    return (
        p.join(i, "_bin")
        .filter((F.col(lo) <= F.col(t)) & (F.col(t) < F.col(hi)))
        .drop("_bin")
    )
