"""Budget-constrained greedy selection — "take the best documents per
source until a token budget is spent", the corpus-selection step of a
data-constrained training run (quality-ranked greedy under budget, as in
the published data-selection recipes that rank by a quality score and
cut at a token target).

Semantics (the PREFIX rule, deterministic): within each key group, order
rows by (score desc, tiebreak asc) and keep a row iff the running token
total INCLUDING it is still within budget. Once the running total
crosses the budget, nothing later is taken (the cumsum is monotone), so
the result is a strict prefix of the quality ordering — append-stable
and reproducible.

Scale shape: the obvious formulation is one window over
``partitionBy(key).orderBy(score desc)`` — which puts an ENTIRE key
group (a source can be most of the corpus) on one task, a sequential
sort + scan per source. This module implements the TWO-PHASE
formulation that holds at 100 TB:

  1. aggregate tokens per (key, score) — map-side partial agg; the
     per-key sequential window then runs over DISTINCT SCORES (the
     boundary ledger), not documents;
  2. join the ledger back on (key, score) — co-partitioned with the
     window below, so one more exchange total;
  3. rank ONLY within (key, score) tie groups — fine-grained window
     partitions (no one-source hotspot); a doc is selected iff its
     group's starting cumsum plus its within-group cumsum fits.

Both formulations produce bit-identical output (pytest-pinned against
each other and against the DuckDB window oracle); the naive window twin
lives in ``plans/documents_gold.py::doc_budget_select_naive`` as the
ground-truth formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def budget_select(
    df: DataFrame,
    keys: list[str],
    score_col: str,
    tokens_col: str,
    budget: int,
    tiebreak: str,
) -> DataFrame:
    """Two-phase budget selection. Adds ``cum_tokens`` (position in the
    quality ordering's running token total) and ``selected`` to ``df``.

    ``score_col`` must order identically in any engine re-deriving the
    result (here: doubles derived from integer ratios); ``tiebreak``
    must be unique per row within a key group.
    """
    # phase 1: the boundary ledger — token mass per (key, score), then a
    # per-key running total over distinct scores only
    ledger = df.groupBy(*keys, score_col).agg(
        F.sum(tokens_col).cast("long").alias("_grp_tokens")
    )
    wk = Window.partitionBy(*keys).orderBy(
        F.col(score_col).desc_nulls_last(),
    )
    ledger = ledger.withColumn(
        "_cum_end", F.sum("_grp_tokens").over(wk)
    ).select(
        *keys,
        score_col,
        (F.col("_cum_end") - F.col("_grp_tokens")).alias("_cum_start"),
    )

    # phase 2: within-tie-group running totals — window partitions are
    # (key, score) tie groups, never a whole source. The join back is
    # NULL-SAFE on the score: a plain equality join would silently DROP
    # NULL-score rows (NULL = NULL is not true) while the ledger window
    # deliberately ranks them (desc_nulls_last) — the naive twin keeps
    # them, so the two pinned-equal formulations would diverge (r5
    # review; pinned by a planted NULL score in test_budget_select).
    wt = Window.partitionBy(*keys, score_col).orderBy(F.col(tiebreak).asc())
    lg = ledger
    for c in [*keys, score_col]:
        lg = lg.withColumnRenamed(c, f"__lg_{c}")
    cond = None
    for c in [*keys, score_col]:
        t = df[c].eqNullSafe(lg[f"__lg_{c}"])
        cond = t if cond is None else (cond & t)
    out = (
        df.join(lg, cond)
        .drop(*[f"__lg_{c}" for c in [*keys, score_col]])
        .withColumn("_within", F.sum(tokens_col).over(wt).cast("long"))
        .withColumn("cum_tokens", F.col("_cum_start") + F.col("_within"))
        .withColumn("selected", F.col("cum_tokens") <= F.lit(budget))
        .drop("_cum_start", "_within")
    )
    return out
