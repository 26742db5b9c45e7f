#!/usr/bin/env python
"""Round-5 session-3 op microbench: DSIR scoring (literal vs arrow), NB
classifier, top_ngrams, lang_consistency, gumbel sampling over a
~200k-doc replicated corpus (bench.py's replication idiom). Run once per
parallelism level:

    SPARK_GRAFT_CPUS=4 python scripts/microbench_r5s3.py
    SPARK_GRAFT_CPUS=16 python scripts/microbench_r5s3.py

Prints one JSON line per run; record min-of-reps per level in
BENCH/BASELINE.md (host noise policy)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    target = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
    reps_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    from dataqualitykit_spark import get_spark
    from dataqualitykit_spark.operators import corpus_stats, dsir
    from dataqualitykit_spark.operators.paragraph_quality import lang_consistency
    from dataqualitykit_spark.operators.sampling import gumbel_weighted_sample

    spark = get_spark(app_name="r5s3-micro", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = docs.count()
    reps = max(1, target // n_base)
    replicated = (
        docs.repartition(4 * int(cpus))
        .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("doc_id", F.col("doc_id") * reps + F.col("_r"))
        .withColumn("text", F.concat(F.col("text"), F.lit(" rep "), F.col("_r")))
        .drop("_r")
    ).localCheckpoint()
    n_docs = n_base * reps

    lr = dsir.dsir_log_ratio(
        dsir.hashed_ngram_counts(replicated.filter("lang = 'en'")),
        dsir.hashed_ngram_counts(replicated),
    )
    model = dsir.nb_train(replicated, "lang", n_buckets=512)

    timings = {}

    def timed(name, fn):
        best = None
        for _ in range(reps_n):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    timed(
        "dsir_counts",
        lambda: dsir.hashed_ngram_counts(replicated).agg(
            F.sum("cnt")
        ).collect(),
    )
    timed(
        "dsir_score_literal",
        lambda: dsir.dsir_score(replicated, lr)
        .agg(F.sum("dsir_weight"))
        .collect(),
    )
    timed(
        "dsir_score_arrow",
        lambda: dsir.dsir_score(replicated, lr, method="arrow")
        .agg(F.sum("dsir_weight"))
        .collect(),
    )
    timed(
        "nb_predict_literal",
        lambda: dsir.nb_predict(replicated, model)
        .groupBy("nb_pred")
        .count()
        .collect(),
    )
    timed("top_ngrams", lambda: corpus_stats.top_ngrams(replicated, 3, 25).collect())
    timed(
        "lang_consistency",
        lambda: lang_consistency(replicated).agg(F.sum("n_mismatch")).collect(),
    )
    timed(
        "gumbel_1k",
        lambda: gumbel_weighted_sample(
            replicated.select("doc_id", F.length("text").alias("w")), 1000, "w"
        ).collect(),
    )

    print(
        json.dumps(
            {
                "cpus": int(cpus),
                "n_docs": n_docs,
                "loadavg": os.getloadavg(),
                "timings": timings,
                "docs_per_sec": {
                    k: round(n_docs / v, 0) for k, v in timings.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
