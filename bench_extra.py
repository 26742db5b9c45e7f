#!/usr/bin/env python
"""Round-7 optimization instrument (bench.py is FROZEN for measurement —
this file carries the extra, finer-grained timings OPTIMIZATION_r07.md
cites). Isolates the near-dedup leg's sub-phases and noop-sink versions
of the headline legs (guide §1.4), min-of-N like bench.py.

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py [phases ...]

Prints one JSON line: {"phases": {name: sec}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import build_near_corpus  # noqa: E402
from dataqualitykit_spark import get_spark, run_pipeline  # noqa: E402
from dataqualitykit_spark.config import PipelineConfig  # noqa: E402
from dataqualitykit_spark.operators import dedup, similarity  # noqa: E402
from dataqualitykit_spark.pipeline import adapt_documents, with_metrics  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    only = set(sys.argv[1:]) or None

    spark = get_spark(app_name="dqx-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = docs.count()

    timings: dict[str, float] = {}
    load_start = os.getloadavg()

    def timed(name: str, fn) -> None:
        if only is not None and name not in only:
            return
        sc.setJobDescription(name)
        best = None
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        sc.setJobDescription(None)

    # warmup: spawn python workers
    run_pipeline(adapt_documents(docs).limit(2000), PipelineConfig()).agg(
        F.sum("ppl")
    ).collect()

    # --- near-dedup sub-phases on the SAME corpus bench.py builds ---
    near_docs = int(os.environ.get("SPARK_GRAFT_NEAR_DOCS", str(n_base * 8)))
    near = build_near_corpus(docs, cpus, near_docs, n_base=n_base).localCheckpoint()
    near.count()
    pages = adapt_documents(near)

    # pipeline WITHOUT the near stage (everything else identical)
    cfg_nonear = PipelineConfig(salt_partitions=64, dedup_near=False)
    timed(
        "near:pipeline_only",
        lambda: run_pipeline(pages, cfg_nonear)
        .agg(F.sum(F.col("keep").cast("long")))
        .collect(),
    )

    # signature pass alone (noop sink — nothing pruned)
    timed(
        "near:signatures",
        lambda: noop(dedup.minhash_signatures(near, "text", "doc_id")),
    )

    # signatures -> banded candidate pairs -> est filter (count sink)
    timed(
        "near:pairs",
        lambda: dedup.minhash_jaccard(near, "text", "doc_id")
        .filter(F.col("est_jaccard") >= 0.8)
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    # CC over a materialized pair list
    pairs = (
        dedup.minhash_jaccard(near, "text", "doc_id")
        .filter(F.col("est_jaccard") >= 0.8)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    pairs.count()
    timed(
        "near:cc",
        lambda: dedup.connected_components(pairs)
        .agg(F.count_distinct("component"))
        .collect(),
    )

    # full near leg (= bench.py q7)
    near_cfg = PipelineConfig(salt_partitions=64, dedup_near=True)
    timed(
        "near:full_leg",
        lambda: run_pipeline(pages, near_cfg)
        .agg(F.sum(F.col("keep").cast("long")))
        .collect(),
    )

    # --- noop-sink versions of the cheap legs (no agg pruning) ---
    replicated = near  # reuse: same scale corpus, deterministic
    timed("noop:simhash", lambda: noop(dedup.simhash64(replicated, "text", "doc_id")))
    timed(
        "noop:minhash_sigs_basedocs",
        lambda: noop(dedup.minhash_signatures(docs.repartition(cpus), "text", "doc_id")),
    )
    timed(
        "noop:cosine_topk",
        lambda: noop(
            similarity.cosine_topk(
                emb, emb.filter(F.col("vec_id") < 100), "vec_id", "embedding", k=5
            )
        ),
    )
    timed(
        "noop:heuristics",
        lambda: noop(with_metrics(pages.drop("lang"), PipelineConfig(dedup_url=False, dedup_content=False))),
    )

    print(
        json.dumps(
            {
                "phases": timings,
                "near_docs": near_docs,
                "cpus": cpus,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
