"""Skew fixture (FIXTURES.md F4): one domain contributes ~50% of rows;
assert the pipeline's salted url repartition spreads rows near-uniformly
(max/median partition ratio bounded), unlike domain-partitioned input."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from dataqualitykit_spark.config import PipelineConfig
from dataqualitykit_spark.fixtures import generate_pages
from dataqualitykit_spark.fixtures.pages import PAGES_SCHEMA


def _partition_sizes(df):
    rows = df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    return [r["count"] for r in rows]


def test_salted_repartition_bounds_skew(spark):
    rows = generate_pages(3000)
    hot = "https://hot.example/"
    # skew variant: rewrite ~50% of urls onto one domain (distinct paths)
    for i, r in enumerate(rows):
        if i % 2 == 0:
            r["url"] = f"{hot}page/{i}"
    df = spark.createDataFrame(rows, PAGES_SCHEMA)

    # adversarial baseline: partitioned BY DOMAIN -> one partition holds half
    by_domain = df.repartition(16, F.substring_index("url", "/", 3))
    dsizes = _partition_sizes(by_domain)
    assert max(dsizes) > len(rows) * 0.4  # the hot partition really is hot

    # pipeline's salt: repartition by full url
    cfg = PipelineConfig(salt_partitions=16)
    salted = df.repartition(cfg.salt_partitions, "url")
    sizes = _partition_sizes(salted)
    assert len(sizes) == 16
    ratio = max(sizes) / statistics.median(sizes)
    assert ratio < 1.5, (sizes, ratio)
