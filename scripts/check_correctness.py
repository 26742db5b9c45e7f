#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet
tables, compare row count, schema (column names) and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified with
float rounding).

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    wanted = set(args)

    import __spark_entry__ as E
    from dataqualitykit_spark import get_spark

    spark = get_spark(master="local[16]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if wanted and name not in wanted:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK ERROR: {e}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE ERROR: {e}")
            fails.append(name)
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and _hash(srows, scols) == _hash(orows, ocols)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(
            f"{name:28s} {status}  rows {len(srows)}/{len(orows)}"
            f" schema={'Y' if schema_ok else 'N'} hash={'Y' if hash_ok else 'N'}"
        )
        if status == "FAIL":
            fails.append(name)
            if not schema_ok:
                print(f"  spark cols:  {sorted(scols)}")
                print(f"  oracle cols: {sorted(ocols)}")
            elif rows_ok and srows:
                # show first differing row pair for debugging
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(_norm(r[i]) for i in order) for r in srows)
                oset = sorted("|".join(_norm(r[i]) for i in order) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        print(f"  spark : {a[:200]}")
                        print(f"  oracle: {b[:200]}")
                        break
    spark.stop()
    if fails:
        print("FAILED:", ", ".join(fails))
        sys.exit(1)
    print("all checked queries green")


if __name__ == "__main__":
    main()
