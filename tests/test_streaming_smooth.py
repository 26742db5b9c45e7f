"""Stateful streaming EWMA (streaming/smooth_stream.py): the smoothed
value must carry across micro-batches per key and match the batch
recurrence (anomaly.py_ewma) over the concatenated ordered series."""

from __future__ import annotations

import pytest

from dataqualitykit_spark.operators.anomaly import py_ewma
from dataqualitykit_spark.streaming.smooth_stream import ewma_stream


def _run(spark, tmp_path, batches, name, **kw):
    src = str(tmp_path / "in")
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "k string, pos long, x double"
        ).coalesce(1).write.parquet(f"{src}/b{i}")
    stream = (
        spark.readStream.schema("k string, pos long, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    out = ewma_stream(stream, "x", ["k"], "pos", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    return {
        (r["k"], r["pos"]): r["ewma_x"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_state_carries_across_batches(spark, tmp_path):
    # key 'a': series split across two batches; key 'b': second batch only
    b1 = [("a", 0, 10.0), ("a", 1, 20.0)]
    b2 = [("a", 2, 40.0), ("a", 3, None), ("b", 0, 7.0)]
    got = _run(spark, tmp_path, [b1, b2], "ewma_stream_t1", alpha=0.5)
    series_a = [10.0, 20.0, 40.0, None]
    want_a = py_ewma(series_a, 0.5)
    for pos, w in enumerate(want_a):
        assert got[("a", pos)] == pytest.approx(w), pos
    assert got[("b", 0)] == 7.0
    assert len(got) == 5


def test_within_batch_order_and_validation(spark, tmp_path):
    # out-of-order arrival INSIDE one batch sorts by pos before folding
    b1 = [("a", 1, 20.0), ("a", 0, 10.0), ("a", 2, 40.0)]
    got = _run(spark, tmp_path, [b1], "ewma_stream_t2", alpha=0.5)
    want = py_ewma([10.0, 20.0, 40.0], 0.5)
    for pos, w in enumerate(want):
        assert got[("a", pos)] == pytest.approx(w), pos
    with pytest.raises(ValueError, match="alpha"):
        ewma_stream(
            spark.readStream.schema("k string, pos long, x double").parquet(
                str(tmp_path / "in" / "b*")
            ),
            "x",
            ["k"],
            "pos",
            alpha=0.0,
        )
