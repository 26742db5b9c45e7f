#!/usr/bin/env python
"""Phase profile of the near-dedup bench leg at a chosen corpus size:
splits the leg into (1) signatures + band join -> LSH candidate pairs and
(2) the connected-components label loop, plus the full pipeline+near leg
for the total. Shows how the CC phase's SHARE shrinks as the input grows
(per-round driver latency is fixed; pair volume grows with data) — the
trend that matters for the 10^12-doc regime.

Usage:
  SPARK_GRAFT_NEAR_DOCS=1280000 SPARK_GRAFT_CPUS=16 \
      python scripts/near_phase_profile.py

Prints one JSON line:
  {"near_docs": N, "cpus": C, "pairs": n_pairs,
   "phase_pairs_sec": ..., "phase_cc_sec": ..., "full_leg_sec": ...,
   "cc_share": ..., "loadavg_start": [...], "loadavg_end": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import build_near_corpus  # noqa: E402
from dataqualitykit_spark import get_spark, run_pipeline  # noqa: E402
from dataqualitykit_spark.config import PipelineConfig  # noqa: E402
from dataqualitykit_spark.operators import dedup  # noqa: E402
from dataqualitykit_spark.pipeline import adapt_documents  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    load_start = os.getloadavg()

    spark = get_spark(app_name="near-phase-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    near_docs = int(os.environ.get("SPARK_GRAFT_NEAR_DOCS", str(docs.count() * 8)))
    near = build_near_corpus(docs, cpus, near_docs).localCheckpoint()
    n = near.count()  # materialize the corpus OUTSIDE the timed phases

    # phase 1: minhash signatures + band self-join -> candidate pairs with
    # estimated jaccard (the same xxhash64 fast path the pipeline uses)
    t0 = time.perf_counter()
    pairs = (
        dedup.minhash_jaccard(near, "text", "doc_id")
        .filter(F.col("est_jaccard") >= 0.8)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0

    # phase 2: connected components over the materialized pair list
    t0 = time.perf_counter()
    comp = dedup.connected_components(pairs)
    n_comp = comp.select("component").distinct().count()
    t_cc = time.perf_counter() - t0

    # full leg (pipeline + near dedup end to end), same shape as bench q7
    cfg = PipelineConfig(salt_partitions=64, dedup_near=True)
    t0 = time.perf_counter()
    run_pipeline(adapt_documents(near), cfg).agg(
        F.sum(F.col("keep").cast("long"))
    ).collect()
    t_full = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "near_docs": n,
                "cpus": cpus,
                "pairs": n_pairs,
                "clusters": n_comp,
                "phase_pairs_sec": round(t_pairs, 2),
                "phase_cc_sec": round(t_cc, 2),
                "full_leg_sec": round(t_full, 2),
                "cc_share": round(t_cc / (t_pairs + t_cc), 3),
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
