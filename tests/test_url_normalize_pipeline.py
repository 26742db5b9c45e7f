"""URL canonicalization wired into the url-dedup window
(cfg.normalize_urls): tracking-param mirrors of a page collapse into one
window group; the output url column is never rewritten. Pipeline and
python oracle agree row-for-row under both settings."""

from __future__ import annotations

import pytest

from dataqualitykit_spark.config import PipelineConfig
from dataqualitykit_spark.fixtures import generate_pages, pages_dataframe
from dataqualitykit_spark.oracle import run_oracle
from dataqualitykit_spark.pipeline import run_pipeline

N = 500
CFG = PipelineConfig(normalize_urls=True)


@pytest.fixture(scope="module")
def norm_labeled(spark):
    rows = run_pipeline(pages_dataframe(spark, N), CFG).select(
        "url", "warc_ts", "keep", "drop_reason"
    ).collect()
    return {(r["url"], r["warc_ts"]): r for r in rows}


def test_normalized_pipeline_matches_oracle(norm_labeled):
    mism = []
    for g in run_oracle(generate_pages(N), CFG):
        r = norm_labeled[(g.url, g.warc_ts)]
        if (r["keep"], r["drop_reason"]) != (g.keep, g.drop_reason):
            mism.append((g.url, g.drop_reason, r["drop_reason"]))
    assert not mism[:10], (len(mism), mism[:10])


def test_variant_urls_collapse_only_when_normalizing(norm_labeled):
    golden_norm = run_oracle(generate_pages(N), CFG)
    golden_raw = run_oracle(generate_pages(N))
    variant = [g for g in golden_norm if "?utm_source=feed" in g.url]
    assert variant, "fixture produced no url variants"

    def dup_url_count(golden):
        return sum(1 for g in golden if g.drop_reason == "dup_url")

    # normalizing merges the variant snapshots into their base url group,
    # so strictly more rows resolve as url-duplicates
    assert dup_url_count(golden_norm) > dup_url_count(golden_raw)
    # under normalization a variant row loses to (or beats) its base twin
    # inside one window group; the output url is still the RAW variant url
    assert all("?utm_source=feed" in g.url for g in variant)
    # spark output carries raw urls too
    assert any("?utm_source=feed" in url for (url, _ts) in norm_labeled)
