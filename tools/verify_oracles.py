"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column-name set,
and an order-insensitive value comparison (rows sorted after
normalizing).  Exit code 1 if anything mismatches.

Usage: python tools/verify_oracles.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # collapse -0.0 / 0.0 and format stably
            if v == 0:
                return "0"
            return repr(round(v, 12))
        if hasattr(v, "timestamp"):  # datetime
            return v.isoformat()
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return repr(float(v))
        except Exception:
            pass
        return repr(v)

    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from oteldb_spark.session import get_spark
    from oteldb_spark.tables import TABLES

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        # session-independence sweep: a bare session exactly like the
        # driver's — default shuffle partitions, no AQE/tz/ns configs
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("verify-oracles-plain")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify-oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        msgs = []
        if len(srows) != len(orows):
            msgs.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            msgs.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if not msgs:
            sn = normalize(srows, scols)
            on = normalize(orows, ocols)
            if sn != on:
                diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                msgs.append(f"values differ, e.g. {diff}")
        if msgs:
            failures.append((name, "; ".join(msgs)))
            print(f"FAIL  {name}: {'; '.join(msgs)}")
        elif not srows:
            # both sides empty: a hash match over nothing certifies
            # nothing — surface it so thresholds/fixtures get fixed
            print(f"ok    {name}: rows=0 VACUOUS [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
