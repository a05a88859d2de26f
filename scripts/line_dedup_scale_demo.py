#!/usr/bin/env python
"""Line-dedup occurrence-fate decision: first-occurrence AGGREGATE +
hash-join vs the ``row_number`` window formulation, measured at TWO
duplication regimes on the same 4M-occurrence corpus.

The measurement that re-decided the op's plan (round 5): the agg+join
form LOOKS scalable ("shuffle ∝ distinct lines after partial
collapse") but reads the exploded occurrence table TWICE — the winners
subtree and the join probe are separate scans unless the whole table
is persisted, which at corpus scale is its own cost — and at high
duplication the md5 partial-agg's collapse never pays back the second
scan. ``row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id,
pos)`` is a SINGLE pass with one hash shuffle; the in-group sorts are
per-distinct-line (tiny). Measured (32 cores, best-of-REPS):

  * broad pool (occ/distinct ≈ 40):   window 4.1× faster
  * heavy boilerplate (≈ 2000):       window 1.3× faster

`doc_line_dedup` therefore ships the window form (its DuckDB oracle
always was that formulation). Both formulations asserted to remove
identical line counts. Inputs derive deterministically from xxhash64
(no RNG, no wall clock).

Run:  python scripts/line_dedup_scale_demo.py   # ~2-3 min
Output: one JSON line — recorded in BASELINE.md §29.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("LD_DEMO_DOCS", "200000"))
LINES_PER_DOC = int(os.environ.get("LD_DEMO_LINES", "20"))
DISTINCT_LINES = int(os.environ.get("LD_DEMO_DISTINCT", "100000"))
REPS = int(os.environ.get("LD_DEMO_REPS", "2"))


def _corpus(spark, distinct_lines):
    from pyspark.sql import functions as F

    # deterministic skewed corpus: line id = h² mod D (quadratic skew →
    # boilerplate lines dominate, the web shape)
    return (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(LINES_PER_DOC - 1)),
                    lambda i: F.concat(
                        F.lit("line "),
                        F.pmod(
                            F.pmod(F.xxhash64(F.col("id") * LINES_PER_DOC + i), F.lit(distinct_lines))
                            * F.pmod(F.xxhash64(F.col("id") * LINES_PER_DOC + i), F.lit(distinct_lines)),
                            F.lit(distinct_lines),
                        ).cast("string"),
                        F.lit(" of the boilerplate pool"),
                    ),
                ),
                "\n",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.session import get_spark

    spark = get_spark("line-dedup-scale-demo", cores=32)

    def occurrences(docs):
        return docs.select(
            "doc_id", F.posexplode(F.split("text", "\n", -1)).alias("pos", "line")
        ).filter(F.trim("line") != "")

    def removed_agg_join(docs):
        # the op's decision subplan (documents_gold.doc_line_dedup):
        # winners agg (map-side partials) + one hash join
        cand = occurrences(docs)
        winners = (
            cand.groupBy(F.md5("line").alias("h"))
            .agg(F.min(F.struct("doc_id", "pos")).alias("first_occ"),
                 F.count(F.lit(1)).alias("c"))
            .filter("c > 1")
            .select("h", "first_occ")
        )
        return (
            cand.withColumn("h", F.md5("line"))
            .join(winners, "h")
            .filter(
                (F.col("doc_id") != F.col("first_occ.doc_id"))
                | (F.col("pos") != F.col("first_occ.pos"))
            )
            .count()
        )

    def removed_window(docs):
        w = Window.partitionBy(F.md5("line")).orderBy("doc_id", "pos")
        return (
            occurrences(docs)
            .withColumn("rn", F.row_number().over(w))
            .filter("rn > 1")
            .count()
        )

    out = {
        "metric": "line_dedup_scale",
        "n_docs": N_DOCS,
        "n_line_occurrences": N_DOCS * LINES_PER_DOC,
        "regimes": {},
    }
    for regime, pool in (("broad", DISTINCT_LINES), ("heavy", max(DISTINCT_LINES // 50, 100))):
        docs = _corpus(spark, pool)
        row = {"distinct_pool": pool}
        vals = {}
        for name, fn in (("agg_join", removed_agg_join), ("window", removed_window)):
            best, val = None, None
            for _ in range(REPS):
                t0 = time.time()
                val = fn(docs)
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            row[f"{name}_sec"] = round(best, 2)
            vals[name] = val
        assert vals["agg_join"] == vals["window"], vals
        row["removed_lines"] = int(vals["agg_join"])
        row["agg_speedup"] = round(row["window_sec"] / max(row["agg_join_sec"], 1e-9), 2)
        out["regimes"][regime] = row
        docs.unpersist()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
