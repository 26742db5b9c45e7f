#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "docs_per_sec": ..., "cpus": ...}

Each timed query materializes fully (parquet write or aggregate over every
computed column) so UDF columns cannot be pruned away by Catalyst.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def build_near_corpus(docs, cpus: int, near_docs: int, near_reps: int = 8, n_base: int | None = None):
    """The near-dedup bench corpus: `near_docs` total docs as planted
    8-member near-dup clusters (worst-case clustering load — every doc
    belongs to a cluster). Unique-text copies first (distinct clusters,
    unique marker woven in every 5 words so cross-copy jaccard ~0.3),
    then the `near_reps`-way near-dup replicas inside each cluster
    (suffix-only difference, jaccard ~0.95). Shared by bench.py's q7 leg
    and scripts/near_phase_profile.py."""
    if n_base is None:
        n_base = docs.count()
    uniq = max(1, near_docs // (n_base * near_reps))
    return (
        docs.repartition(2 * int(cpus))
        .withColumn("_u", F.explode(F.sequence(F.lit(0), F.lit(uniq - 1))))
        .withColumn(
            "text",
            F.when(F.lit(uniq) == 1, F.col("text")).otherwise(
                F.regexp_replace(
                    "text",
                    F.lit(r"((?:\S+ ){5})"),
                    F.concat(F.lit("$1u"), F.col("_u"), F.lit(" ")),
                )
            ),
        )
        .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(near_reps - 1))))
        .withColumn(
            "doc_id",
            (F.col("doc_id") * uniq + F.col("_u")) * near_reps + F.col("_r"),
        )
        .withColumn("text", F.concat(F.col("text"), F.lit(" rep "), F.col("_r")))
        .drop("_u", "_r")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dataqualitykit_spark import get_spark, run_pipeline
    from dataqualitykit_spark.operators import dedup, similarity
    from dataqualitykit_spark.pipeline import adapt_documents, with_metrics
    from dataqualitykit_spark.config import PipelineConfig

    spark = get_spark(app_name="dqx-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = docs.count()

    # The driver documents tables are small (500-5k rows). Replicate the
    # corpus deterministically to ~TARGET_DOCS so the pipeline measurement
    # exercises real parallelism, and repartition by url hash — a tiny
    # single parquet file otherwise arrives as ONE partition and would
    # serialize the whole Arrow-UDF stage (the 100 TB analog is thousands
    # of input splits, so this mirrors reality, not games it).
    target_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
    reps = max(1, target_docs // n_base)
    # repartition BEFORE explode: the tiny source parquet is one split, and
    # a single-task replication stage would serialize ~13s of work that no
    # extra core can touch (measured as the fixed term in the scaling fit)
    # replicas get UNIQUE text (suffix differs) — otherwise content-dedup
    # drops every copy before the model stage and the "docs/sec" number
    # measures shuffle+write only, never the scoring path
    replicated = (
        docs.repartition(4 * int(cpus))
        .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("doc_id", F.col("doc_id") * reps + F.col("_r"))
        .withColumn("text", F.concat(F.col("text"), F.lit(" rep "), F.col("_r")))
        .drop("_r")
    )
    n_docs = n_base * reps

    out_dir = tempfile.mkdtemp(prefix="dqx_bench_")
    timings: dict[str, float] = {}
    # self-describing record: this sandbox shares a host whose load avg
    # swings 0.2-12 and stretches Spark wall-clock up to 5x — a contended
    # run must be identifiable from the JSON alone
    load_start = os.getloadavg()

    # CPU-steal bookkeeping (BENCH/BASELINE.md round-6 pathology): the
    # hypervisor cap is demand-triggered and invisible to loadavg, so the
    # JSON records steal% over the run — the honest contention tell
    def _cpu_ticks():
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            return int(parts[8]), sum(int(x) for x in parts[1:9])
        except (OSError, ValueError, IndexError):
            return None

    ticks_start = _cpu_ticks()
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # optional leg subset (comma-separated) — scaling_bench.py restricts to
    # the legs its efficiency ratio actually uses
    legs_env = os.environ.get("SPARK_GRAFT_BENCH_LEGS", "")
    only_legs = set(legs_env.split(",")) if legs_env else None

    def wanted(name: str) -> bool:
        return only_legs is None or name in only_legs

    def timed(name: str, fn) -> None:
        if not wanted(name):
            return
        # min over repetitions: this sandbox shares a host (idle load avg
        # >3 observed); the minimum is the least-contended measurement
        best = None
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    pages = adapt_documents(replicated)
    # fixed partitioning at every parallelism level: the scaling check
    # compares the SAME job at local[8] and local[32], so the salt must not
    # change with the core count (64 = 2 waves at 32 cores, 8 at 8)
    pipe_cfg = PipelineConfig(
        salt_partitions=int(os.environ.get("SPARK_GRAFT_SALT", "64"))
    )

    # untimed warmup: spawns the Python UDF workers and JITs the codegen
    # paths. A 100 TB job amortizes this once per executor lifetime; the
    # bench measures steady-state throughput, not process spawn.
    run_pipeline(pages.limit(2000), pipe_cfg).agg(
        F.sum("ppl"), F.sum("n_chars")
    ).collect()

    # q1: full pipeline (scrub + heuristics + langid/ppl UDFs + dedup +
    # decide) with a real parquet write of the output CONTRACT columns
    # (labels + scrubbed text + content fingerprint; per-check metrics go
    # to the aggregate metrics table, not every row) — headline docs/sec
    contract_cols = ["url", "keep", "drop_reason", "scrubbed_text", "content_md5"]
    timed(
        "pipeline_full",
        lambda: run_pipeline(pages, pipe_cfg)
        .select(*contract_cols)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/labeled"),
    )

    # q2: scrub+metrics+scoring stage only (no dedup shuffle, no write)
    cfg = PipelineConfig(dedup_url=False, dedup_content=False)
    timed(
        "heuristics_only",
        lambda: with_metrics(pages.drop("lang"), cfg)
        .agg(
            F.sum("n_chars").alias("a"),
            F.sum("n_words").alias("b"),
            F.sum(F.length("scrubbed_text")).alias("c"),
            F.sum("ppl").alias("d"),
        )
        .collect(),
    )

    # q3: exact dedup window over text hash
    timed(
        "dedup_exact",
        lambda: dedup.dedup_exact(docs, ["text"], order_by=[F.col("doc_id")])
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    # q4: MinHash-LSH near-dup candidates. Same single-split rationale as
    # the pipeline leg: the tiny source parquet arrives as ONE partition,
    # which would serialize the 32-permutation signature stage on one core
    # — at 100 TB the input is thousands of splits, so spread it first.
    docs_split = docs.repartition(int(cpus))
    timed(
        "minhash_lsh",
        lambda: dedup.minhash_jaccard(docs_split, "text", "doc_id")
        .filter(F.col("est_jaccard") >= 0.8)
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    # q5: brute-force cosine top-k (100 queries against full corpus)
    timed(
        "cosine_topk",
        lambda: similarity.cosine_topk(
            emb, emb.filter(F.col("vec_id") < 100), "vec_id", "embedding", k=5
        )
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    # q6: single-pass simhash over the replicated corpus
    timed(
        "simhash",
        lambda: dedup.simhash64(replicated, "text", "doc_id")
        .agg(F.sum(F.col("simhash").bitwiseAND(F.lit(255))))
        .collect(),
    )

    # q7: pipeline with near-dup dedup (xxhash64 fast path) on an 8-way
    # replica corpus — a worst-case clustering load (every doc belongs to
    # an 8-member near-dup cluster). Min-of-n_reps like every other leg:
    # single-shot timings of this leg swung 37-122 s at identical config
    # on this shared host (round-3 record), so one sample is pure noise.
    # SPARK_GRAFT_NEAR_DOCS grows the number of clusters (cluster size
    # stays 8) for scaling measurements — at the default (~40k docs) the
    # leg is mostly fixed stage latency and two parallelism levels
    # measure the same queue.
    if wanted("pipeline_near_dedup"):
        near_docs = int(os.environ.get("SPARK_GRAFT_NEAR_DOCS", str(n_base * 8)))
        near = build_near_corpus(docs, int(cpus), near_docs, n_base=n_base)
        near_cfg = PipelineConfig(salt_partitions=64, dedup_near=True)
        timed(
            "pipeline_near_dedup",
            lambda: run_pipeline(adapt_documents(near), near_cfg)
            .agg(F.sum(F.col("keep").cast("long")))
            .collect(),
        )

    ticks_end = _cpu_ticks()
    steal_pct = None
    if ticks_start and ticks_end and ticks_end[1] > ticks_start[1]:
        steal_pct = round(
            100.0
            * (ticks_end[0] - ticks_start[0])
            / (ticks_end[1] - ticks_start[1]),
            2,
        )

    total = round(sum(timings.values()), 3)
    docs_per_sec = (
        round(n_docs / timings["pipeline_full"], 1)
        if "pipeline_full" in timings
        else None
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "quality_pipeline_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "docs_per_sec": docs_per_sec,
                "cpus": int(cpus),
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "steal_pct": steal_pct,
            }
        )
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
