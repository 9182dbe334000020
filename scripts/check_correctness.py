"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin at sf0.01, compare rows / schema / values.

Usage: python scripts/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> None:
    import __spark_entry__ as entry
    from bench import make_spark

    spark = make_spark(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in cols) for r in sdf.collect()
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols_raw = [d[0] for d in rel.description]
            orows_raw = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            failures += 1
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = sorted(
            tuple(norm(row[i]) for i in order) for row in orows_raw
        )
        ok_schema = cols == ocols
        ok_rows = len(srows) == len(orows)
        ok_vals = srows == orows
        status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(
                f"{name}: {status} schema={ok_schema} ({cols} vs {ocols}) "
                f"rows={len(srows)}/{len(orows)} vals={ok_vals}"
            )
            if ok_schema and ok_rows and not ok_vals:
                diff = [
                    (a, b) for a, b in zip(srows, orows) if a != b
                ][:3]
                print(f"   first diffs: {diff}")
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    print(f"failures={failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
