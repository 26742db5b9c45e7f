#!/usr/bin/env python
"""ANN family comparison at bench scale: brute / blocked-BLAS / LSH /
IVF / IVF-PQ top-5 for 10 queries over N deterministic synthetic
vectors (hash-derived, no RNG). Reports wall seconds + recall@5 vs the
brute-force truth. Run on a quiet host; one Spark job at a time.

    python scripts/microbench_ann.py [n_vectors]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dataqualitykit_spark import get_spark
from dataqualitykit_spark.operators import similarity as sim


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="ann-bench", master="local[32]")
    dim = 64
    # deterministic pseudo-random unit-ish vectors: sin over a 64-bit hash
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.sin(
            (F.xxhash64(F.col("id") * dim + i) % 100_000).cast("double")
        ),
    )
    corpus = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .persist()
    )
    corpus.count()  # materialize outside the timed region
    queries = corpus.filter(F.col("vec_id") < 10)

    def run(name, fn):
        t0 = time.time()
        rows = fn().collect()
        dt = time.time() - t0
        return name, dt, {(r["query_id"], r["neighbor_id"]) for r in rows}

    results = [
        run("brute_blocked", lambda: sim.cosine_topk_blocked(corpus, queries, k=5)),
        run("lsh", lambda: sim.lsh_bucketed_topk(corpus, queries, k=5)),
        run("ivf", lambda: sim.ivf_topk(corpus, queries, k=5, n_cells=64, n_probe=8)),
        run(
            "ivfpq",
            lambda: sim.ivfpq_topk(
                corpus, queries, k=5, n_cells=64, n_probe=8, rerank=50
            ),
        ),
    ]
    truth = results[0][2]
    print(f"n={n} dim={dim} queries=10 k=5")
    for name, dt, pairs in results:
        rec = len(pairs & truth) / len(truth) if truth else 0.0
        print(f"{name:14s} {dt:7.2f}s  recall@5={rec:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
