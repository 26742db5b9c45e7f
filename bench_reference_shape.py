#!/usr/bin/env python
"""Single-node throughput: this engine vs the REFERENCE'S EXECUTION SHAPE.

The reference (karrabi/DataQualityKit) publishes no benchmark numbers, so
we measure its documented execution patterns on identical data and
hardware — NOT its code, its shape:

- scrub: row-at-a-time `F.udf` (QualityControl.py:3510 wraps the encoding
  fix in F.udf; :1353, :1427 likewise) vs this engine's Arrow-batched
  pandas UDF. Both call the SAME semantics.scrub_text, so the delta is
  pure execution strategy.
- missing check: 4 separate filter().count() jobs per column
  (QualityControl.py:138-143) vs ONE wide aggregation (missing_counts).

Appends results to BENCH/BASELINE.md. Usage: python bench_reference_shape.py
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.types import StringType

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataqualitykit_spark import get_spark
from dataqualitykit_spark.config import MISSING_TOKENS, WS_CHARS
from dataqualitykit_spark.operators.missing import missing_counts
from dataqualitykit_spark.semantics import scrub_text
from dataqualitykit_spark.udfs import scrub_udf


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_target = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
    spark = get_spark(app_name="dqx-ref-shape", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = max(1, n_target // docs.count())
    data = (
        docs.repartition(4 * int(cpus))
        .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("text", F.concat(F.col("text"), F.lit(" r"), F.col("_r")))
        .drop("_r")
        .cache()
    )
    n = data.count()

    def timed(fn) -> float:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    # --- scrub ---------------------------------------------------------
    ref_scrub_udf = F.udf(scrub_text, StringType())  # reference shape :3510

    def ref_scrub():
        data.select(F.sum(F.length(ref_scrub_udf(F.col("text"))))).collect()

    def our_scrub():
        data.select(F.sum(F.length(scrub_udf(F.col("text"))))).collect()

    t_ref_scrub = timed(ref_scrub)
    t_our_scrub = timed(our_scrub)

    # --- missing check ------------------------------------------------
    cols = ["text", "lang", "source"]

    def ref_missing():
        # reference shape :138-143 — one job per condition per column
        for c in cols:
            col = F.col(c)
            data.filter(col.isNull()).count()
            data.filter(col == "").count()
            data.filter(F.btrim(col, F.lit(WS_CHARS)) == "").count()
            data.filter(col.isin(*MISSING_TOKENS)).count()

    def our_missing():
        missing_counts(data, cols).collect()

    t_ref_missing = timed(ref_missing)
    t_our_missing = timed(our_missing)

    lines = (
        "\n## Reference-shape comparison (same data, same host, same "
        "semantics functions)\n\n"
        f"- input: {n} docs, local[{cpus}], min-of-2\n"
        f"- scrub: row-at-a-time F.udf (reference shape, QualityControl.py"
        f":3510) {t_ref_scrub:.2f} s vs Arrow-batched pandas UDF "
        f"{t_our_scrub:.2f} s -> **{t_ref_scrub / t_our_scrub:.1f}x**\n"
        f"- missing check: 4 filter+count jobs/column (reference shape, "
        f":138-143) {t_ref_missing:.2f} s vs one wide aggregation "
        f"{t_our_missing:.2f} s -> **{t_ref_missing / t_our_missing:.1f}x**\n"
    )
    print(lines)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(lines)
    spark.stop()


if __name__ == "__main__":
    main()
