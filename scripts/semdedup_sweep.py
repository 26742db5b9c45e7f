#!/usr/bin/env python
"""SemDeDup parameter-sweep evidence (VERDICT r4 item #6): measure
dup-pair yield and wall time across (n_cells x threshold) on the sf0.1
embeddings table, so the operator's defaults are evidence-based like the
simhash/HOF decisions.

Also sweeps target_block_rows on a PLANTED HOT CELL (50% of vectors in
one tight cluster) to show the salted block-pair fan-out's cost/benefit:
the labels are invariant (asserted), only the task fan-out and wall time
change.

Usage: python scripts/semdedup_sweep.py [sf_dir]
Prints one JSON line per measurement; paste the table into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from dataqualitykit_spark import get_spark  # noqa: E402
from dataqualitykit_spark.operators.similarity import semantic_dedup  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    probe_only = "probe" in sys.argv[2:]
    spark = get_spark(app_name="semdedup-sweep", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # plant dups so the sweep has signal: exact copies of 10% of vectors
    n = emb.count()
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    n_total = n + planted.count()

    if probe_only:
        # n_assign A/B (VERDICT r5 item #7): wall + dropped count at the
        # default threshold and at 0.8 where natural near-boundary pairs
        # exist. min-of-3 per config (bench noise policy).
        for threshold in (0.95, 0.8):
            for n_assign in (1, 2):
                best, n_drop = None, None
                for _ in range(3):
                    t0 = time.time()
                    out = semantic_dedup(
                        corpus, threshold=threshold, n_assign=n_assign
                    )
                    n_drop = out.filter(~F.col("keep")).count()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                print(
                    json.dumps(
                        {
                            "n_rows": n_total,
                            "threshold": threshold,
                            "n_assign": n_assign,
                            "n_dropped": n_drop,
                            "sec_min_of_3": round(best, 2),
                        }
                    ),
                    flush=True,
                )
        spark.stop()
        return

    rows = []
    for n_cells in (16, 64, int(max(16, min(4096, n_total ** 0.5))), 256):
        for threshold in (0.95, 0.8, 0.6):
            t0 = time.time()
            out = semantic_dedup(
                corpus, n_cells=n_cells, threshold=threshold
            )
            n_drop = out.filter(~F.col("keep")).count()
            dt = round(time.time() - t0, 2)
            row = {
                "n_rows": n_total,
                "n_cells": n_cells,
                "threshold": threshold,
                "n_dropped": n_drop,
                "planted": n_total - n,
                "sec": dt,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # hot-cell block sweep: labels invariant, fan-out measured
    import random

    rng = random.Random(3)
    hot_base = [rng.uniform(-1, 1) for _ in range(16)]
    hot_rows = [
        (i, [x + rng.uniform(-1e-2, 1e-2) for x in hot_base]) for i in range(4000)
    ] + [(10_000 + i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(4000)]
    hot = spark.createDataFrame(hot_rows, "vec_id long, embedding array<double>")
    ref_labels = None
    for tbr in (1 << 30, 1024, 256, 64):
        t0 = time.time()
        out = semantic_dedup(
            hot, n_cells=8, threshold=0.999, target_block_rows=tbr
        )
        labels = sorted(
            (r["id"], r["keep"], r["component"]) for r in out.collect()
        )
        dt = round(time.time() - t0, 2)
        if ref_labels is None:
            ref_labels = labels
        assert labels == ref_labels, f"labels changed at tbr={tbr}"
        row = {"hot_cell_rows": 4000, "target_block_rows": tbr, "sec": dt,
               "labels_match_unsalted": labels == ref_labels}
        print(json.dumps(row), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
