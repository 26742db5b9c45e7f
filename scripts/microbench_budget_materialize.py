#!/usr/bin/env python
"""A/B/C the token-budget materialization trade (round-6 VERDICT item #4).

When cfg.token_budget is on, the budget sampler's bucket-sums action plus
the output action evaluate the labeled pipeline subtree twice under the
lazy 'recompute' default (PLANS.md: exchanges 11 vs 2). Candidates:

  recompute        zero pinned state, scorer runs twice
  localCheckpoint  labeled frame pinned as executor blocks, scorer once
  persist_parquet  labeled frame written to scratch parquet, read twice
                   (the shape that also survives executor loss on a real
                   cluster — localCheckpoint blocks die with an executor)

Replicates bench.py's corpus setup (same replication + salt) and times
run_pipeline(...).write at sf0.1-equivalent scale, min-of-N per mode.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/microbench_budget_materialize.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    target_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))

    from dataqualitykit_spark import get_spark, run_pipeline
    from dataqualitykit_spark.config import PipelineConfig
    from dataqualitykit_spark.pipeline import adapt_documents

    spark = get_spark(app_name="dqx-budget-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = docs.count()
    reps = max(1, target_docs // n_base)
    replicated = (
        docs.repartition(4 * int(cpus))
        .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("doc_id", F.col("doc_id") * reps + F.col("_r"))
        .withColumn("text", F.concat(F.col("text"), F.lit(" rep "), F.col("_r")))
        .drop("_r")
    )
    pages = adapt_documents(replicated)
    scratch = tempfile.mkdtemp(prefix="dqx_budget_ab_")

    # budget sized to actually cut (~half the kept tokens per lang group)
    budget = int(os.environ.get("SPARK_GRAFT_AB_BUDGET", "2000000"))

    def run_mode(mode: str) -> float:
        best = None
        for r in range(n_reps):
            cfg = PipelineConfig(
                salt_partitions=64,
                token_budget=budget,
                budget_materialize=mode,
            )
            out = f"{scratch}/{mode}_{r}"
            t0 = time.perf_counter()
            run_pipeline(pages, cfg).write.mode("overwrite").parquet(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            shutil.rmtree(out, ignore_errors=True)
        return round(best, 3)

    # warmup (spawn arrow workers / JIT)
    run_pipeline(pages.limit(2000), PipelineConfig()).count()

    results = {}
    baseline_cfg = PipelineConfig(salt_partitions=64)
    t0 = time.perf_counter()
    run_pipeline(pages, baseline_cfg).write.mode("overwrite").parquet(
        f"{scratch}/nobudget"
    )
    results["no_budget_single_pass"] = round(time.perf_counter() - t0, 3)
    for mode in ("recompute", "localCheckpoint", "persist_parquet"):
        results[mode] = run_mode(mode)

    results["loadavg_end"] = list(os.getloadavg())
    results["n_docs"] = n_base * reps
    results["budget"] = budget
    print(json.dumps(results))
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
