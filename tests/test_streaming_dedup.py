"""Stateful streaming dedup (applyInPandasWithState): state persists
across micro-batches, so a hash first seen in batch 1 suppresses every
later occurrence; within a batch the min-order_col row is kept."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dataqualitykit_spark.streaming.dedup_stream import dedup_stream


def test_dedup_stream_keeps_first_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    # batch 1: h1 twice (two urls), h2 once
    spark.createDataFrame(
        [("u2", "h1"), ("u1", "h1"), ("u3", "h2")], "url string, content_md5 string"
    ).coalesce(1).write.parquet(f"{src}/b1")
    # batch 2: h1 again (must be suppressed), h3 new
    spark.createDataFrame(
        [("u9", "h1"), ("u4", "h3")], "url string, content_md5 string"
    ).coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema("url string, content_md5 string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    out = dedup_stream(stream, key_col="content_md5", order_col="url")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["url"], r["content_md5"])
        for r in spark.sql("SELECT * FROM dedup_stream_t").collect()
    }
    # one row per distinct hash; h1's batch-1 winner is the min url u1
    assert rows == {("u1", "h1"), ("u3", "h2"), ("u4", "h3")}, rows
