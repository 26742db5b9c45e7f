#!/usr/bin/env python
"""A/B: connected_components pointer-doubling shortcut (round 4) vs the
round-3 schedule (two plain propagation rounds per action, no shortcut)
on planted DEEP CHAINS — the regime where driver round-trips dominate.

The baseline below preserves the round-3 loop shape verbatim (like
microbench_votes.py preserves its rejected shapes) so the comparison
stays runnable after the production code moves on. Shallow clusters are
also measured to show the shortcut costs nothing there (it only engages
from iteration 2).

Usage: python scripts/microbench_cc.py [chain_len] [n_chains]
Prints one JSON line with wall seconds + iteration counts for both
schedules and asserts label equality.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dataqualitykit_spark import get_spark  # noqa: E402
from dataqualitykit_spark.operators.dedup import connected_components  # noqa: E402


def cc_baseline(pairs: DataFrame, max_iter: int = 300):
    """Round-3 schedule: 1 propagation round per action for iterations
    0-1, then 2 rounds per action; NO pointer doubling. O(diameter/2)
    driver actions on a chain."""

    def propagate(lbls):
        nbr = edges.join(
            lbls.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "label")
        return lbls.union(nbr).groupBy("id").agg(F.min("label").alias("label"))

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    iters = 0
    for it in range(max_iter):
        iters += 1
        new = propagate(labels)
        if it >= 2:
            new = propagate(new)
        new = new.localCheckpoint(eager=False)
        changed = (
            new.withColumnRenamed("label", "_new")
            .join(labels, "id")
            .filter(F.col("_new") != F.col("label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.withColumnRenamed("label", "component"), iters


def main() -> None:
    chain_len = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="cc-microbench", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")

    # deep chains: n_chains disjoint paths of `chain_len` edges
    rows = [
        (c * (chain_len + 1) + i, c * (chain_len + 1) + i + 1)
        for c in range(n_chains)
        for i in range(chain_len)
    ]
    deep = spark.createDataFrame(rows, "id_a long, id_b long").localCheckpoint()
    # shallow clusters: 8-member stars (the common near-dup case)
    shallow = spark.createDataFrame(
        [(g * 8, g * 8 + m) for g in range(2000) for m in range(1, 8)],
        "id_a long, id_b long",
    ).localCheckpoint()
    deep.count(), shallow.count()

    out: dict = {"chain_len": chain_len, "n_chains": n_chains}
    for name, pairs in (("deep", deep), ("shallow", shallow)):
        t0 = time.perf_counter()
        base_labels, base_iters = cc_baseline(pairs)
        base = {r["id"]: r["component"] for r in base_labels.collect()}
        t_base = time.perf_counter() - t0

        t0 = time.perf_counter()
        cur_labels = connected_components(pairs, max_iter=60)
        cur = {r["id"]: r["component"] for r in cur_labels.collect()}
        t_cur = time.perf_counter() - t0

        assert cur == base, f"{name}: label mismatch"
        out[name] = {
            "baseline_sec": round(t_base, 2),
            "shortcut_sec": round(t_cur, 2),
            "baseline_iters": base_iters,
            "speedup": round(t_base / t_cur, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
