#!/usr/bin/env python
"""Count-Min sketch scale demonstration: per-key counting at a key
cardinality where the exact groupBy's shuffle is the cost, SAME input.

The pytest suite grades the sketch's guarantees on the tiny driver
corpus (vocabulary ~10²), where exact counting is trivially cheap and
wall-clock says nothing. This script is the scale evidence: at N
high-cardinality keys (default 20M, all distinct — the worst case for
exact counting, the regime the operator exists for) the exact plan must
shuffle ~one row per distinct key per partition (map-side partial aggs
cannot combine what never repeats) and build reduce-side hash tables
over the full key space, while the CMS build shuffles at most
partitions × depth × width CELLS — a constant as N grows. Both numbers
are COUNTED here (rows entering each exchange, from the frames
themselves), not inferred from timings; wall-clock is reported beside
them with the usual shared-VM steal caveat. The never-underestimate
guarantee is asserted on a sampled key set against the exact counts.

Run:  python scripts/cms_scale_demo.py            # ~1-3 min
      (at N ≥ 50M give the driver headroom: SPARK_DRIVER_MEM=16g)
Env:  CMS_DEMO_N (default 20_000_000), CMS_DEMO_WIDTH (1<<16),
      CMS_DEMO_ZIPF_DUP (0 → all-distinct; k>0 plants k hot keys at
      ~N/(2k) occurrences each to exercise the estimate side too)
Output: one JSON line — recorded in SCALE.md (Count-Min entry).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("CMS_DEMO_N", str(20_000_000)))
WIDTH = int(os.environ.get("CMS_DEMO_WIDTH", str(1 << 16)))
DEPTH = 4
HOT = int(os.environ.get("CMS_DEMO_ZIPF_DUP", "8"))


def main() -> None:
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
        cms_build,
        cms_estimates,
        cms_total,
    )
    from crypto_near_real_time_data_ingestion_spark.session import get_spark

    spark = get_spark("cms_scale_demo", cores=32)
    parts = spark.sparkContext.defaultParallelism

    # key stream: md5 of the row id, with HOT planted heavy keys taking
    # half the stream (id % 2 == 0 → one of HOT hot keys) so point
    # queries have something to estimate; HOT=0 → all distinct.
    base = spark.range(N).repartition(parts)
    if HOT > 0:
        key = F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("hot:"), (F.col("id") % HOT).cast("string")),
        ).otherwise(F.md5(F.col("id").cast("string")))
    else:
        key = F.md5(F.col("id").cast("string"))
    # NOT cached/checkpointed: the key column is a pure function of id,
    # so both plans regenerate it deterministically and pay the same
    # generation cost (materializing 50M md5 strings OOMs an 8g driver
    # and would bill the cache write to whichever plan ran first)
    keys = base.select(key.alias("k"))

    # ---- exact groupBy ----------------------------------------------------
    t0 = time.time()
    exact = keys.groupBy("k").count()
    n_groups = exact.count()
    exact_s = time.time() - t0
    # rows into the exact exchange = Σ_p distinct(k) within partition p
    # (what survives the map-side partial agg) — counted, not inferred
    exact_shuffle_rows = (
        keys.select(F.spark_partition_id().alias("p"), "k")
        .distinct()
        .count()
    )

    # ---- CMS build ---------------------------------------------------------
    t1 = time.time()
    sketch = cms_build(keys, "k", width=WIDTH, depth=DEPTH).localCheckpoint(
        eager=True
    )
    n_cells = sketch.count()
    cms_s = time.time() - t1
    # rows into the CMS exchange = nonzero cells emitted across all
    # partition partials — counted by re-running phase 1 alone
    from crypto_near_real_time_data_ingestion_spark.operators.countmin import (
        _CELL_SCHEMA,
        _cms_partial,
    )

    cms_shuffle_rows = (
        keys.select(F.xxhash64(F.col("k").cast("string")).alias("h64"))
        .mapInPandas(_cms_partial(DEPTH, WIDTH, 0), _CELL_SCHEMA)
        .count()
    )
    cms_shuffle_rows_bound = parts * DEPTH * WIDTH

    assert cms_total(sketch).collect()[0]["n_total"] == N

    # ---- guarantee spot-check on the hot keys ------------------------------
    est_err_max = None
    if HOT > 0:
        import pandas as pd

        items = spark.createDataFrame(
            pd.DataFrame({"k": [f"hot:{i}" for i in range(HOT)]})
        )
        est = {
            r["item"]: r["est"]
            for r in cms_estimates(
                sketch, items, "k", width=WIDTH, depth=DEPTH
            ).collect()
        }
        true = {
            r["k"]: r["count"]
            for r in exact.filter(F.col("k").startswith("hot:")).collect()
        }
        for k, t in true.items():
            assert est[k] >= t, f"underestimate at {k}: {est[k]} < {t}"
        est_err_max = max(est[k] - t for k, t in true.items())

    print(
        json.dumps(
            {
                "n": N,
                "n_groups": n_groups,
                "parts": parts,
                "exact_s": round(exact_s, 2),
                "cms_s": round(cms_s, 2),
                "exact_shuffle_rows": exact_shuffle_rows,
                "cms_shuffle_rows": cms_shuffle_rows,
                "cms_shuffle_rows_max": cms_shuffle_rows_bound,
                "cms_cells": n_cells,
                "shuffle_reduction": round(
                    exact_shuffle_rows / max(cms_shuffle_rows, 1), 1
                ),
                "est_err_max_hot": est_err_max,
                "width": WIDTH,
                "depth": DEPTH,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
