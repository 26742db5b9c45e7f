"""Resume contract (BASELINE.md): kill after bucket k, restart, verify no
bucket reprocessed and final output equals an uninterrupted run."""

from __future__ import annotations

import json
import os

import pytest

from dataqualitykit_spark.fixtures import pages_dataframe
from dataqualitykit_spark.lineage import run_resumable


def _labeled_set(spark, root):
    rows = (
        spark.read.parquet(f"{root}/labeled")
        .select("url", "warc_ts", "keep", "drop_reason", "scrubbed_text")
        .collect()
    )
    return {
        (r["url"], r["warc_ts"]): (r["keep"], r["drop_reason"], r["scrubbed_text"])
        for r in rows
    }


def test_kill_and_resume_matches_uninterrupted(spark, tmp_path):
    src = pages_dataframe(spark, 400)

    clean_root = str(tmp_path / "clean")
    run_resumable(spark, src, clean_root, n_buckets=4)

    resumed_root = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, src, resumed_root, n_buckets=4, fail_after=2)

    manifest_path = os.path.join(resumed_root, "manifest.json")
    before = json.load(open(manifest_path))
    assert len(before) == 2

    run_resumable(spark, src, resumed_root, n_buckets=4)
    after = json.load(open(manifest_path))
    assert len(after) == 4
    # completed buckets were NOT reprocessed (timestamps unchanged)
    for b in before:
        assert after[b]["completed_at"] == before[b]["completed_at"]

    assert _labeled_set(spark, clean_root) == _labeled_set(spark, resumed_root)
