"""Determinism (SURVEY §5.2.3): two pipeline runs over the same input —
with different partitioning — produce identical labeled content."""

from __future__ import annotations

import hashlib

from dataqualitykit_spark.config import PipelineConfig
from dataqualitykit_spark.fixtures import pages_dataframe
from dataqualitykit_spark.pipeline import run_pipeline


def _content_hash(df) -> str:
    rows = df.select(
        "url", "warc_ts", "keep", "drop_reason", "scrubbed_text", "content_md5"
    ).collect()
    canon = sorted(
        (r["url"], str(r["warc_ts"]), r["keep"], str(r["drop_reason"]),
         str(r["scrubbed_text"]), r["content_md5"])
        for r in rows
    )
    return hashlib.sha256(repr(canon).encode()).hexdigest()


def test_identical_across_runs_and_partitionings(spark):
    df = pages_dataframe(spark, 500)
    h1 = _content_hash(run_pipeline(df, PipelineConfig(salt_partitions=4)))
    h2 = _content_hash(run_pipeline(df, PipelineConfig(salt_partitions=17)))
    h3 = _content_hash(run_pipeline(df.repartition(9), PipelineConfig()))
    assert h1 == h2 == h3
