#!/usr/bin/env python
"""HyperLogLog scale demonstration: distinct counting at a cardinality
where the exact count(distinct)'s shuffle IS the cost, SAME input.

The pytest suite grades the sketch's guarantees on the tiny driver
corpus (hundreds of distinct values), where exact counting is trivially
cheap. This script is the scale evidence: at N all-distinct keys the
exact plan must shuffle ~one row per key per partition (map-side
partial aggs cannot combine what never repeats — Spark's two-phase
distinct ships every within-partition-distinct key), while the HLL
build shuffles at most partitions × 2^p REGISTER rows — a constant as
N grows, and the register frame itself is 2^p rows at 10^12 keys. Both
numbers are COUNTED (rows entering each exchange, from the frames
themselves), not inferred from timings; wall-clock is reported beside
them with the usual shared-VM steal caveat. The estimate is asserted
within 4×(1.04/√m) of the true cardinality.

Run:  python scripts/hll_scale_demo.py            # ~1-3 min
Env:  HLL_DEMO_N (default 25_000_000), HLL_DEMO_P (default 14),
      HLL_DEMO_DUP (default 2 → each key appears ~DUP times; duplicate
      absorption is the sketch's job, so the default exercises it)
Output: one JSON line — recorded in SCALE.md (HyperLogLog entry).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("HLL_DEMO_N", str(25_000_000)))
P = int(os.environ.get("HLL_DEMO_P", "14"))
DUP = int(os.environ.get("HLL_DEMO_DUP", "2"))


def main() -> None:
    from pyspark.sql import functions as F

    from crypto_near_real_time_data_ingestion_spark.operators.hll import (
        _REG_SCHEMA,
        _hll_partial,
        hll_build,
        hll_estimate,
        hll_salt,
        hll_standard_error,
    )
    from crypto_near_real_time_data_ingestion_spark.session import get_spark

    spark = get_spark("hll_scale_demo", cores=32)
    parts = spark.sparkContext.defaultParallelism

    # key stream: md5 of id // DUP — every key ~DUP occurrences spread
    # across the range (true cardinality ceil(N/DUP)). NOT cached: the
    # column is a pure function of id, both plans regenerate it and pay
    # the same generation cost (materializing 25M md5 strings would
    # bill the cache write to whichever plan runs first).
    true_distinct = -(-N // DUP)
    keys = (
        spark.range(N)
        .repartition(parts)
        .select(F.md5((F.col("id") / DUP).cast("long").cast("string")).alias("k"))
    )

    # ---- exact distinct count ----------------------------------------------
    t0 = time.time()
    n_exact = keys.distinct().count()
    exact_s = time.time() - t0
    assert n_exact == true_distinct
    # rows into the exact exchange = Σ_p distinct(k) within partition p
    # (what survives the map-side partial distinct) — counted, not inferred
    exact_shuffle_rows = (
        keys.select(F.spark_partition_id().alias("p"), "k").distinct().count()
    )

    # ---- HLL build -----------------------------------------------------------
    t1 = time.time()
    sketch = hll_build(keys, "k", p=P).localCheckpoint(eager=True)
    n_regs = sketch.count()
    hll_s = time.time() - t1
    # rows into the HLL exchange = nonzero registers emitted across all
    # partition partials — counted by re-running the partial fold alone
    hll_shuffle_rows = (
        keys.select(
            F.xxhash64(F.concat(F.lit(hll_salt(0)), F.col("k"))).alias("h64")
        )
        .mapInPandas(_hll_partial(P), _REG_SCHEMA)
        .count()
    )
    hll_shuffle_rows_bound = parts * (1 << P)

    # ---- estimate within the published bound ---------------------------------
    est = hll_estimate(sketch, P).collect()[0]["n_distinct_est"]
    rel_err = abs(est - true_distinct) / true_distinct
    bound = 4 * hll_standard_error(P)
    assert rel_err <= bound, f"relative error {rel_err:.4f} > {bound:.4f}"

    print(
        json.dumps(
            {
                "n": N,
                "true_distinct": true_distinct,
                "parts": parts,
                "exact_s": round(exact_s, 2),
                "hll_s": round(hll_s, 2),
                "exact_shuffle_rows": exact_shuffle_rows,
                "hll_shuffle_rows": hll_shuffle_rows,
                "hll_shuffle_rows_max": hll_shuffle_rows_bound,
                "hll_registers": n_regs,
                "shuffle_reduction": round(
                    exact_shuffle_rows / max(hll_shuffle_rows, 1), 1
                ),
                "estimate": round(est, 1),
                "rel_err": round(rel_err, 5),
                "rel_err_bound": round(bound, 5),
                "p": P,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
