"""Planted hot-key JOIN measurement: AQE skew-join split vs plain SMJ.

BASELINE.md §11 measured the AGGREGATE side of the skew story (map-side
partial agg already collapses hot groups; salting is a loss there) and
`operators/skew.py` scopes its claim accordingly: "join-side skew is
AQE's job". This script MEASURES that scoped claim instead of leaving
it asserted: a sort-merge join whose probe side is 50% one key puts
half the fact table into one shuffle partition — the classic straggler
— and AQE's skew-join optimization (`spark.sql.adaptive.skewJoin`)
splits that partition into advisory-sized chunks, each joined against
a replicated copy of the matching build rows.

Setup: fact = N rows, conv_hot owns every even row (50%); dim = one row
per conversation (200k cold + hot). Broadcast is disabled on both AQE
paths (the dim fits memory here, but at 100 TB reference-dim joins
outgrow the broadcast limit — SMJ is the regime under test; the
broadcast fix is measured separately as a third config for context).

Expected shape (recorded honestly either way): AQE-off pays one
straggler task sorting+joining N/2 rows; AQE-on splits it — wall time
approaches the balanced-partition time; the executed plan carries the
`skew=true` marker on the join. Broadcast, where it FITS, beats both
(no shuffle of the fact side at all).

Run: python scripts/skew_join_bench.py [N_ROWS] (default 32M)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from crypto_near_real_time_data_ingestion_spark.session import get_spark  # noqa: E402

N_DIM = 200_001


def fact(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit("conv_hot"))
        .otherwise(
            F.concat(F.lit("c"), F.pmod(F.hash("id"), F.lit(N_DIM - 1)).cast("string"))
        )
        .alias("conv_id"),
        (F.col("id") % 997).cast("double").alias("metric"),
        # INCOMPRESSIBLE pad (md5, 32 hex chars): shuffle blocks are
        # lz4-compressed, and a repeated-char pad compresses so well the
        # hot partition lands UNDER AQE's default 256 MB
        # skewedPartitionThresholdInBytes — the split never fires at
        # bench scale (measured; a real fact row's entropy is closer to
        # this)
        F.md5(F.col("id").cast("string")).alias("pad"),
    )


def dim(spark):
    cold = spark.range(N_DIM - 1).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"),
        (F.pmod(F.col("id"), F.lit(7))).cast("int").alias("segment"),
    )
    hot = cold.sparkSession.createDataFrame(
        [("conv_hot", 99)], "conv_id string, segment int"
    )
    return cold.unionByName(hot)


def joined(spark, n_rows: int):
    f = fact(spark, n_rows)
    d = dim(spark)
    return f.join(d, "conv_id").select("conv_id", "metric", "segment", "pad")


def timed(df, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    spark = get_spark("skew-join-bench")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    def no_broadcast(on: bool):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1" if on else str(32 << 20))
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1" if on else str(32 << 20))

    # sanity: identical results across configs (row count is sufficient
    # for a join — contents are config-independent by construction)
    no_broadcast(True)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    n_plain = joined(spark, 1_000_000).count()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    n_aqe = joined(spark, 1_000_000).count()
    assert n_plain == n_aqe == 1_000_000

    # 1. plain sort-merge join, no AQE: the hot partition is one straggler
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t_smj = timed(joined(spark, n_rows))

    # 2. AQE skew-join split (skewJoin.enabled defaults true under AQE)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t_aqe = timed(joined(spark, n_rows))
    # plan evidence: the final adaptive plan must carry the skew split.
    # A write action plans a CLONE, so collect() on the Dataset itself
    # (its own QueryExecution) is what exposes isFinalPlan=true; the
    # filter references BOTH sides, so it cannot push below the join and
    # the full skewed join executes while 0 rows reach the driver.
    chk = joined(spark, n_rows).filter(
        (F.col("metric") + F.col("segment")) < F.lit(-1.0)
    )
    assert chk.collect() == []
    plan = chk._jdf.queryExecution().executedPlan().toString()
    skew_marker = "SortMergeJoin(skew=true)" in plan

    # 3. context: broadcast where the dim fits (not the regime under
    # test — the fact side never shuffles at all)
    no_broadcast(False)
    t_bc = timed(joined(spark, n_rows))

    print(
        f'{{"n_rows": {n_rows}, "hot_share": 0.5, '
        f'"smj_no_aqe_s": {t_smj:.2f}, "aqe_skewjoin_s": {t_aqe:.2f}, '
        f'"aqe_speedup": {t_smj / t_aqe:.2f}, '
        f'"skew_split_in_plan": {str(skew_marker).lower()}, '
        f'"broadcast_s": {t_bc:.2f}}}'
    )


if __name__ == "__main__":
    main()
