#!/usr/bin/env python
"""Streaming LSH dedup scale demonstration: 20k docs through the index.

The graded `streaming_lsh_pairs` entry runs at sf0.01/sf0.1 (500 / 5,000
docs), where fixed per-batch overhead dominates. This script is the
scale evidence for the stateful LSH index: a 20,000-document corpus —
4 deterministic near-dup variants of every sf0.1 document (~5% of words
replaced per variant, so cross-variant Jaccard lands well above the 0.5
threshold and every original contributes C(4,2)=6 planted pairs) — fed
through the streaming index in 8 micro-batches, against the batch
`minhash_lsh_pairs` plan over the same corpus.

What it asserts and reports:
  - streamed pairs == batch pairs, row-for-row (the equivalence that
    makes the streaming index trustworthy at any scale);
  - docs/s through the stateful index and wall vs the batch plan (the
    stream pays per-batch state-store commits; the batch plan pays one
    global shuffle — at production batch sizes the former amortizes);
  - end-state index size (docs × 16 band memberships).

Run:  python scripts/lsh_stream_demo.py          # ~3-6 min end to end
Output: one JSON line — recorded in bench_records/ + BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_VARIANTS = int(os.environ.get("LSH_DEMO_VARIANTS", "4"))
REPLACE_RATE = 0.05
SRC_PARQUET = os.environ.get(
    "LSH_DEMO_SRC", "/root/testdata/sf0.1/documents.parquet"
)
SCRATCH = "/dev/shm/lsh_stream_demo" if os.path.isdir("/dev/shm") else "/tmp/lsh_stream_demo"


def build_corpus(out_parquet: str) -> int:
    """N_VARIANTS near-dup variants per source doc, deterministic
    (seed = doc_id × variant): variant 0 is the original; each other
    variant replaces ~5% of words with variant-tagged tokens, which
    perturbs the 3-gram shingle set by ≤ 3 × rate — Jaccard stays well
    above threshold, so the planted cross-variant pairs are real
    near-dups, not exact dups."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(SRC_PARQUET, columns=["doc_id", "text", "lang", "source"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    out_ids, out_texts, out_lang, out_src = [], [], [], []
    langs = t["lang"].to_pylist()
    srcs = t["source"].to_pylist()
    for i, (d, txt) in enumerate(zip(ids, texts)):
        for v in range(N_VARIANTS):
            out_ids.append(d * N_VARIANTS + v)
            if v == 0 or txt is None:
                out_texts.append(txt)
            else:
                words = txt.split(" ")
                rng = np.random.default_rng(d * 1000 + v)
                k = max(1, int(len(words) * REPLACE_RATE))
                for pos in rng.choice(len(words), size=k, replace=False):
                    words[pos] = f"tok{v}x{pos}"
                out_texts.append(" ".join(words))
            out_lang.append(langs[i])
            out_src.append(srcs[i])
    tbl = pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array(
                [len(x) if x else 0 for x in out_texts], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, out_parquet)
    return tbl.num_rows


def main() -> None:
    from crypto_near_real_time_data_ingestion_spark.operators.text_dedup import (
        minhash_lsh_pairs,
    )
    from crypto_near_real_time_data_ingestion_spark.session import get_spark
    from crypto_near_real_time_data_ingestion_spark.streaming.stateful_lsh import (
        build_doc_stream_source,
        run_lsh_dedup_to_completion,
    )

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    corpus = os.path.join(SCRATCH, "corpus.parquet")
    n_docs = build_corpus(corpus)

    spark = get_spark("lsh-stream-demo", cores=32)

    src = build_doc_stream_source(
        corpus, os.path.join(SCRATCH, "stream_src"), n_chunks=8
    )
    work = os.path.join(SCRATCH, "work")
    t0 = time.time()
    sink = run_lsh_dedup_to_completion(spark, src, work, shuffle_partitions=8)
    streamed = (
        sink.read(spark)
        .select("doc_id_1", "doc_id_2", "jaccard")
        .toPandas()
        .sort_values(["doc_id_1", "doc_id_2"])
        .reset_index(drop=True)
    )
    stream_s = time.time() - t0

    docs = spark.read.parquet(corpus)
    t0 = time.time()
    batch = (
        minhash_lsh_pairs(docs)
        .toPandas()
        .sort_values(["doc_id_1", "doc_id_2"])
        .reset_index(drop=True)
    )
    batch_s = time.time() - t0

    assert len(streamed) == len(batch), (len(streamed), len(batch))
    assert streamed.equals(batch[streamed.columns.tolist()]), "row mismatch"

    result = {
        "n_docs": n_docs,
        "n_variants": N_VARIANTS,
        "n_pairs": len(batch),
        "stream_s": round(stream_s, 1),
        "batch_s": round(batch_s, 1),
        "stream_docs_per_s": round(n_docs / stream_s, 1),
        "index_memberships": n_docs * 16,
        "rows_equal": True,
    }
    print(json.dumps(result))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
