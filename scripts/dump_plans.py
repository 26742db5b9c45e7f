#!/usr/bin/env python
"""Dump .explain('formatted') for named queries() entries to plans/<tag>/.

    python scripts/dump_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (all queries
when none named). Plan generation is driver-only — no job runs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    import __spark_entry__ as entry
    from dataqualitykit_spark import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    if not names:
        names = list(qs)
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — a failed plan is itself signal
            plan = f"PLAN FAILED: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"{name}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
