"""Approximate nearest neighbors over embedding columns.

``plans/documents_gold.emb_cosine_topk`` is the exact O(n²) baseline;
this module is the scale path:

  * random-hyperplane LSH: sign-pattern bucket per vector (H seeded
    hyperplanes → H-bit code), candidates = same-bucket pairs across R
    independent tables; exact cosine re-ranking of candidates only.
  * bucketing keeps the join shuffle ∝ candidates; multiprobe (flip one
    bit) trades recall for fan-out.

At 100 TB the same shape holds: codes are computed in one Arrow-batched
pass (mapInPandas, matrix multiply per batch), the bucket join shuffles
on (table, code) — never the full cross product. An IVF variant would
replace the code with a nearest-centroid id (k-means fit offline);
bucket-join machinery is identical, which is why only LSH is shipped.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CODE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("code", T.IntegerType()),
    ]
)


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _codes_udf(dim: int, n_bits: int, n_tables: int):
    planes = _hyperplanes(dim, n_bits, n_tables)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(n_bits)
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy())  # (n, dim)
            out_id, out_tbl, out_code = [], [], []
            for t in range(n_tables):
                proj = mat @ planes[t].T  # (n, bits)
                codes = ((proj > 0) @ weights).astype(np.int32)
                out_id.extend(pdf["vec_id"].tolist())
                out_tbl.extend([t] * len(pdf))
                out_code.extend(codes.tolist())
            yield pd.DataFrame({"vec_id": out_id, "table": out_tbl, "code": out_code})

    return fn


def lsh_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_bits: int = 5,
    n_tables: int = 16,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed approximate top-k by cosine.

    Output schema matches the exact ``emb_cosine_topk`` so tests can
    measure recall@k of the approximate result against the exact one.
    """
    codes = emb.select("vec_id", "embedding").mapInPandas(
        _codes_udf(dim, n_bits, n_tables), schema=CODE_SCHEMA
    )
    a, b = codes.alias("a"), codes.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("ssq", F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    j = (
        cand.join(e.select(F.col("vec_id"), F.col("v").alias("v1"), F.col("ssq").alias("s1")), "vec_id")
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("v2"),
                F.col("ssq").alias("s2"),
            ),
            "neighbor_id",
        )
    )
    dot = F.aggregate(
        F.zip_with("v1", "v2", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = j.select(
        "vec_id",
        "neighbor_id",
        F.round(dot / F.sqrt(F.col("s1") * F.col("s2")), 6).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine")
    )
