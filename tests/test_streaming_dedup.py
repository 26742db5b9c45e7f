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
    assert q.awaitTermination(300), 'stream did not finish'
    rows = {
        (r["url"], r["content_md5"])
        for r in spark.sql("SELECT * FROM dedup_stream_t").collect()
    }
    # one row per distinct hash; h1's batch-1 winner is the min url u1
    assert rows == {("u1", "h1"), ("u3", "h2"), ("u4", "h3")}, rows


def test_near_dedup_stream_labels_across_batches(spark, tmp_path):
    """foreachBatch near-dedup emits KEEP/DROP decisions: a batch-2
    near-dup of a batch-1 doc drops with drop_reason='dup_near' via the
    disk-backed signature store; a within-batch cluster keeps its min-id
    member; unrelated docs keep."""
    from dataqualitykit_spark.semantics import _TRAIN_TEXT
    from dataqualitykit_spark.streaming.dedup_stream import near_dedup_labeler

    words = (_TRAIN_TEXT + " " + _TRAIN_TEXT).split()
    base = " ".join(words[0:100])
    near = " ".join(words[0:97] + ["extra", "tail", "words"])
    near2 = " ".join(words[0:97] + ["other", "end", "bits"])
    other = " ".join(reversed(words[100:200]))

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [("doc-a", base), ("doc-c", near2), ("doc-x", other)],
        "url string, text string",
    ).coalesce(1).write.parquet(f"{src}/b1")
    spark.createDataFrame(
        [("doc-b", near), ("doc-y", " ".join(words[200:260]))],
        "url string, text string",
    ).coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    labels = str(tmp_path / "labels")
    store = str(tmp_path / "sigstore")
    q = (
        stream.writeStream.foreachBatch(
            near_dedup_labeler(labels, store, "text", "url", threshold=0.8)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    rows = {
        r["url"]: (r["keep"], r["drop_reason"])
        for r in spark.read.parquet(labels).collect()
    }
    assert rows["doc-a"] == (True, None), rows
    assert rows["doc-c"] == (False, "dup_near"), rows  # within-batch cluster
    assert rows["doc-b"] == (False, "dup_near"), rows  # cross-batch vs store
    assert rows["doc-x"][0] and rows["doc-y"][0], rows


def test_near_dup_pairs_stream_across_batches(spark, tmp_path):
    """A near-dup arriving in batch 2 must pair with its batch-1 twin via
    the state store; unrelated docs emit nothing."""
    from dataqualitykit_spark.semantics import _TRAIN_TEXT
    from dataqualitykit_spark.streaming.dedup_stream import near_dup_pairs_stream

    words = (_TRAIN_TEXT + " " + _TRAIN_TEXT).split()
    base = " ".join(words[0:100])
    near = " ".join(words[0:97] + ["extra", "tail", "words"])
    other = " ".join(reversed(words[100:200]))

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [("doc-a", base), ("doc-x", other)], "url string, text string"
    ).coalesce(1).write.parquet(f"{src}/b1")
    spark.createDataFrame(
        [("doc-b", near)], "url string, text string"
    ).coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    out = near_dup_pairs_stream(stream, "text", "url", threshold=0.8)
    q = (
        out.writeStream.format("memory")
        .queryName("near_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), 'stream did not finish'
    pairs = {
        (r["id_a"], r["id_b"])
        for r in spark.sql("SELECT * FROM near_stream_t").collect()
    }
    assert ("doc-a", "doc-b") in pairs, pairs
    assert all({a, b} == {"doc-a", "doc-b"} for a, b in pairs), pairs


def test_near_dedup_labeler_store_schema_drift_propagates(spark, tmp_path):
    """ADVICE r3: only "no store yet" may skip the cross-batch join. A
    store with drifted schema (e.g. the operator was reconfigured between
    runs) must raise, not silently disable cross-batch dedup forever."""
    import pytest
    from pyspark.errors import AnalysisException

    from dataqualitykit_spark.streaming.dedup_stream import near_dedup_labeler

    store = str(tmp_path / "driftstore")
    # a store written by some OTHER configuration: no id/sig columns
    spark.createDataFrame(
        [(1, "x")], "wrong_a int, wrong_b string"
    ).write.partitionBy("wrong_a").parquet(store)
    batch = spark.createDataFrame(
        [("doc-1", "some document text for signatures")],
        "url string, text string",
    )
    fn = near_dedup_labeler(str(tmp_path / "labels"), store, "text", "url")
    with pytest.raises(AnalysisException):
        fn(batch, batch_id=1)


def test_near_dedup_labeler_first_batch_without_store_runs(spark, tmp_path):
    """No store on disk = genuinely the first batch: the labeler must run
    and label everything keep."""
    from dataqualitykit_spark.streaming.dedup_stream import near_dedup_labeler

    labels = str(tmp_path / "labels_fb")
    fn = near_dedup_labeler(labels, str(tmp_path / "absent_store"), "text", "url")
    batch = spark.createDataFrame(
        [("doc-1", "first document text here"), ("doc-2", "a different text body")],
        "url string, text string",
    )
    fn(batch, batch_id=0)
    rows = {
        r["url"]: r["keep"] for r in spark.read.parquet(labels).collect()
    }
    assert rows == {"doc-1": True, "doc-2": True}


def test_near_dedup_labeler_torn_store_treated_as_absent(spark, tmp_path):
    """A crash during the FIRST store write leaves the directory without
    the committer's _SUCCESS marker; the labeler must treat it as absent
    (retry rewrites it) instead of failing every batch on an unreadable
    store."""
    import os

    from dataqualitykit_spark.streaming.dedup_stream import near_dedup_labeler

    store = str(tmp_path / "tornstore")
    os.makedirs(os.path.join(store, "_temporary"))  # torn write residue
    labels = str(tmp_path / "labels_torn")
    fn = near_dedup_labeler(labels, store, "text", "url")
    batch = spark.createDataFrame(
        [("doc-1", "first text body here"), ("doc-2", "second text body here")],
        "url string, text string",
    )
    fn(batch, batch_id=0)  # must not raise
    assert spark.read.parquet(labels).count() == 2
    # the retry's write committed real store content
    from dataqualitykit_spark.streaming.dedup_stream import _store_committed

    assert _store_committed(spark, store)
