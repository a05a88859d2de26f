"""D4 (`operators/d4.py`): SemDeDup + SSL-prototypes pruning. The trim
logic is verified against a pandas reference over the SAME assignment
frame (kmeans/semdedup parity have their own suites), plus composition,
edge-fraction, and repartition-invariance contracts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crypto_near_real_time_data_ingestion_spark.datagen import (
    ensure_clustered_embeddings,
)
from crypto_near_real_time_data_ingestion_spark.operators.d4 import emb_d4_select
from crypto_near_real_time_data_ingestion_spark.operators.semdedup import (
    emb_semdedup,
)

THRESHOLD = 0.8
N_CELLS = 8


@pytest.fixture(scope="module")
def clustered(spark):
    return spark.read.parquet(
        ensure_clustered_embeddings(0.001, noise_scale=3.0)
    ).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def d4_out(clustered):
    return emb_d4_select(
        clustered, threshold=THRESHOLD, n_cells=N_CELLS, proto_frac=0.25
    ).toPandas()


def _reference_trim(pdf: pd.DataFrame, frac: float) -> pd.DataFrame:
    out = []
    for cell, g in pdf.groupby("proto_cell"):
        g = g.sort_values(
            ["ccos", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        m = int(np.floor(frac * len(g)))
        g["ref_selected"] = np.arange(len(g)) >= m
        out.append(g)
    return pd.concat(out, ignore_index=True)


def test_d4_trim_matches_reference(d4_out):
    ref = _reference_trim(d4_out, 0.25)
    merged = ref.merge(
        d4_out[["vec_id", "selected"]], on="vec_id", suffixes=("", "_got")
    )
    assert (merged["ref_selected"] == merged["selected_got"]).all()
    # every cell drops exactly floor(frac * size)
    per_cell = d4_out.groupby("proto_cell")["selected"].agg(["size", "sum"])
    dropped = per_cell["size"] - per_cell["sum"]
    assert (dropped == (0.25 * per_cell["size"]).apply(np.floor)).all()
    # something was actually pruned, and something survived
    assert 0 < d4_out["selected"].sum() < len(d4_out)


def test_d4_composes_on_semdedup_kept(clustered, d4_out):
    kept = (
        emb_semdedup(clustered, threshold=THRESHOLD, n_cells=N_CELLS)
        .filter("keep")
        .select("vec_id")
        .toPandas()["vec_id"]
    )
    assert set(d4_out["vec_id"]) == set(kept)


def test_d4_edge_fractions(clustered):
    all_kept = emb_d4_select(
        clustered, threshold=THRESHOLD, n_cells=N_CELLS, proto_frac=0.0
    ).toPandas()
    assert all_kept["selected"].all()
    none_kept = emb_d4_select(
        clustered, threshold=THRESHOLD, n_cells=N_CELLS, proto_frac=1.0
    ).toPandas()
    assert not none_kept["selected"].any()
    with pytest.raises(ValueError, match="proto_frac"):
        emb_d4_select(clustered, proto_frac=1.5)


def test_d4_repartition_invariance(clustered, d4_out):
    again = (
        emb_d4_select(
            clustered.repartition(7),
            threshold=THRESHOLD,
            n_cells=N_CELLS,
            proto_frac=0.25,
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    base = d4_out.sort_values("vec_id").reset_index(drop=True)
    assert base[["vec_id", "proto_cell", "selected"]].equals(
        again[["vec_id", "proto_cell", "selected"]]
    )
