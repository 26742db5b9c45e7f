#!/usr/bin/env python
"""A/B microbench: interpreted-HOF vote vs codegen explode+sum vote for
simhash64, and HOF-transform vs codegen explode+min for minhash
signatures. Replicates sf0.01 documents to ~200k rows on local[32].

Measured 2026-08-16 (quiet host, min-of-3):
  simhash64 codegen (explode + 64 sum aggs): 8.006 s  (25.0k docs/s)
  simhash64 HOF (shipped):                   3.650 s  (54.8k docs/s)
  minhash sigs HOF (shipped):                1.893 s  (105.6k docs/s)
  minhash sigs agg (explode + 32 min aggs):  1.332 s  (150.1k docs/s)

Conclusions baked into operators/dedup.py: the 65-buffer hash aggregate
loses (method-size codegen fallback + a per-doc exchange), so simhash64
keeps the per-row HOF vote. The 32-min-agg minhash form wins 1.4x
locally but converts a ZERO-shuffle projection into a per-doc exchange —
at 10^12 docs the map-only shape wins, so minhash_signatures also stays
HOF; this script preserves both shapes so the trade can be re-measured
on real cluster hardware.

Run standalone (never concurrently with another Spark job):
    python scripts/microbench_votes.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataqualitykit_spark import get_spark
from dataqualitykit_spark.operators import dedup
from dataqualitykit_spark.operators.dedup import _bit_mask, with_shingle_hashes


def simhash64_hof(df, text_col, id_col, shingle_k=2):
    """Round-2 shape: interpreted F.aggregate + zip_with vote (for A/B)."""
    hashed = with_shingle_hashes(df.select(id_col, text_col), text_col, id_col, shingle_k)
    masks = F.array(*[_bit_mask(b) for b in range(64)])
    counts = F.aggregate(
        F.col("hashes"),
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc, masks, lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)
        ),
    )
    sim = F.aggregate(
        F.zip_with(counts, masks, lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )
    return hashed.select("id", sim.alias("simhash"))


def minhash_signatures_agg(df, text_col, id_col, num_hashes=32, shingle_k=3):
    """Codegen candidate: explode distinct shingle hashes, 32 compiled
    min(xxhash64(i, h)) aggregates per doc."""
    sh = with_shingle_hashes(df, text_col, id_col, shingle_k)
    ex = sh.select("id", F.explode(F.array_distinct("hashes")).alias("_h"))
    mins = [F.min(F.xxhash64(F.lit(i), F.col("_h"))).alias(f"_m{i}") for i in range(num_hashes)]
    counted = ex.groupBy("id").agg(*mins)
    sig = F.array(*[F.col(f"_m{i}") for i in range(num_hashes)])
    return counted.select("id", sig.alias("sig"))


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="vote-microbench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n_base = docs.count()
    reps = max(1, 200_000 // n_base)
    corpus = (
        docs.repartition(64)
        .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("doc_id", F.col("doc_id") * reps + F.col("_r"))
        .withColumn("text", F.concat("text", F.lit(" rep "), F.col("_r")))
        .drop("_r")
    )
    n = n_base * reps

    def timed(name, fn, reps_t=3):
        best = None
        for _ in range(reps_t):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.3f}s  ({n / best:,.0f} docs/s)")
        return best

    # warm up workers/codegen
    dedup.simhash64(corpus.limit(2000), "text", "doc_id").agg(F.sum(F.col("simhash").bitwiseAND(F.lit(255)))).collect()

    timed("simhash64 codegen (new)", lambda: dedup.simhash64(corpus, "text", "doc_id")
          .agg(F.sum(F.col("simhash").bitwiseAND(F.lit(255)))).collect())
    timed("simhash64 HOF (old)", lambda: simhash64_hof(corpus, "text", "doc_id")
          .agg(F.sum(F.col("simhash").bitwiseAND(F.lit(255)))).collect())
    timed("minhash sigs HOF (current)", lambda: dedup.minhash_signatures(corpus, "text", "doc_id")
          .agg(F.sum(F.get("sig", 0).bitwiseAND(F.lit(255)))).collect())
    timed("minhash sigs agg (candidate)", lambda: minhash_signatures_agg(corpus, "text", "doc_id")
          .agg(F.sum(F.get("sig", 0).bitwiseAND(F.lit(255)))).collect())
    spark.stop()


if __name__ == "__main__":
    main()
