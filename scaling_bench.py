#!/usr/bin/env python
"""Two-parallelism scaling check (sandbox proxy for N vs 4N executors,
per BASELINE.md): run bench.py at local[8] and local[32] on the same
input, report throughput at both plus scaling efficiency
(= (docs/sec@32 / docs/sec@8) / 4, target >= 0.8).

Each run is a fresh subprocess (clean JVM, no warm caches shared).
Writes BENCH/BASELINE.md section + prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = run_at(8, sf_dir)
    hi = run_at(32, sf_dir)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    summary = {
        "sf": lo["sf"],
        "n_docs": lo["n_docs"],
        "docs_per_sec_local8": lo["docs_per_sec"],
        "docs_per_sec_local32": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "pipeline_sec_local8": lo["queries"]["pipeline_full"],
        "pipeline_sec_local32": hi["queries"]["pipeline_full"],
        "queries_local32": hi["queries"],
    }
    print(json.dumps(summary))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH baseline — two-parallelism scaling check\n\n"
            "Sandbox proxy for N vs 4N executors (task brief): same job, same\n"
            "input, local[8] vs local[32], fresh JVM per run.\n\n"
            f"- input: `{sf_dir}` ({lo['n_docs']} docs, sf{lo['sf']})\n"
            f"- pipeline wall-clock local[8]:  {lo['queries']['pipeline_full']} s "
            f"({lo['docs_per_sec']} docs/sec)\n"
            f"- pipeline wall-clock local[32]: {hi['queries']['pipeline_full']} s "
            f"({hi['docs_per_sec']} docs/sec)\n"
            f"- **scaling efficiency: {eff:.3f}** "
            f"(= ({hi['docs_per_sec']}/{lo['docs_per_sec']})/4, target >= 0.8)\n\n"
            "Per-query seconds at local[32]:\n\n"
            + "\n".join(f"- {k}: {v}" for k, v in hi["queries"].items())
            + "\n\nSpark conf: AQE on, shuffle.partitions=32, Arrow batch 10k, "
            "maxPartitionBytes=128m (see dataqualitykit_spark/session.py).\n"
        )


if __name__ == "__main__":
    main()
