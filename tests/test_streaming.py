"""Streaming front-end tests: availableNow incremental run over an
append-only directory, idempotent restart, and the watermarked window
aggregation shape."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmpdirs():
    base = tempfile.mkdtemp(prefix="stream_")
    yield base
    shutil.rmtree(base, ignore_errors=True)


def test_incremental_stream(spark, code_files, tmpdirs):
    from mel_tnnt_spark.streaming.incremental import run_incremental

    src_dir = f"{tmpdirs}/src"
    out_dir = f"{tmpdirs}/out"
    ckpt = f"{tmpdirs}/ckpt"
    code_files.limit(40).write.mode("overwrite").parquet(src_dir)

    q = run_incremental(spark, src_dir, out_dir, ckpt, once=True)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir)
    n1 = got1.count()
    assert n1 > 0
    assert set(got1.columns) == {"subj", "pred", "obj", "batch_id"}

    # restart with no new data: no duplicate triples appended
    q2 = run_incremental(spark, src_dir, out_dir, ckpt, once=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n1

    # append new files -> only the delta is processed
    code_files.limit(60).subtract(code_files.limit(40)).write.mode("append").parquet(src_dir)
    q3 = run_incremental(spark, src_dir, out_dir, ckpt, once=True)
    q3.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() > n1


def test_mention_rate_window(spark, tmpdirs):
    from mel_tnnt_spark.streaming.incremental import mention_rate_stream

    src = f"{tmpdirs}/events"
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = mention_rate_stream(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rates").collect()
    assert rows
    # oracle: batch computation of the same windows
    batch = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            F.col("count").alias("cnt"),
        )
    )
    assert {tuple(r) for r in rows} == {tuple(r) for r in batch.collect()}
