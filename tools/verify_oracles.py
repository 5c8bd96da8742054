"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column-name set,
and an order-insensitive value comparison (rows sorted after
normalizing).  Exit code 1 if anything mismatches.

Usage: python tools/verify_oracles.py [--out=FILE] [--label=KEY] [sf_dir] [name_filter...]

``--out=FILE`` writes a machine-readable verification artifact
(VERIFY_rN.json): per-gate rows/ok/seconds plus run metadata — sf dir,
session mode, and whether a name filter was active, so a filtered log
can never pass for a full sweep.  ``--label=KEY`` merges this run
under KEY into an existing artifact (e.g. one file holding both the
sf0.01 and sf0.1 sweeps).
"""

from __future__ import annotations

import json
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
    args = sys.argv[1:]
    out_path = label = None
    rest = []
    for a in args:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--label="):
            label = a.split("=", 1)[1]
        else:
            rest.append(a)
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    name_filter = rest[1:]

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
    records: list[dict] = []
    # Periodic cache hygiene: pinned frames (DISK_ONLY / MEMORY_AND_DISK)
    # accumulate across a 300+-gate sweep and can exhaust the PLAIN
    # session's default 1g driver heap (observed at ~gate 190 in r8).
    # Release + clearCache every RELEASE_EVERY gates — session memos
    # revive through pin.repin(), same contract bench.py exercises
    # per-gate.
    RELEASE_EVERY = 20
    from oteldb_spark.operators.pin import release_pins

    for i, (name, fn) in enumerate(qs.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        if i % RELEASE_EVERY == 0:
            release_pins()
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
        t0 = time.time()
        rec = {"name": name, "ok": False, "rows": None, "seconds": None}
        records.append(rec)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            rec["error"] = f"spark: {e}"
            print(f"FAIL  {name}: spark error: {e}")
            continue
        rec["rows"] = len(srows)
        rec["seconds"] = round(time.time() - t0, 2)
        if name not in oracles:
            rec["ok"] = True
            rec["mode"] = "rows-only"
            print(f"weak  {name}: rows={len(srows)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            rec["error"] = f"oracle: {e}"
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
        rec["seconds"] = round(time.time() - t0, 2)
        if msgs:
            failures.append((name, "; ".join(msgs)))
            rec["error"] = "; ".join(msgs)
            print(f"FAIL  {name}: {'; '.join(msgs)}")
        elif not srows:
            # both sides empty: a hash match over nothing certifies
            # nothing — surface it so thresholds/fixtures get fixed
            rec["ok"] = True
            rec["vacuous"] = True
            print(f"ok    {name}: rows=0 VACUOUS [{time.time()-t0:.1f}s]")
        else:
            rec["ok"] = True
            print(f"ok    {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    # count only gates actually EXECUTED — a name-filtered run must be
    # visibly partial, never indistinguishable from a full sweep
    n_exec = len(records)
    scope = "FULL" if not name_filter else f"FILTERED({' '.join(name_filter)})"
    print(f"\n{n_exec - len(failures)}/{n_exec} executed gates passed "
          f"[{scope} sweep; registry has {len(qs)} gates]")
    if out_path:
        run = {
            "sf_dir": sf_dir,
            "session": "plain" if os.environ.get("SPARK_GRAFT_PLAIN") else "tuned",
            "name_filter": name_filter,
            "full_sweep": not name_filter,
            "registry_size": len(qs),
            "executed": n_exec,
            "passed": n_exec - len(failures),
            "gates": records,
        }
        doc: dict = {}
        if label and os.path.exists(out_path):
            try:
                with open(out_path) as f:
                    doc = json.load(f)
            except Exception:
                doc = {}
            if "gates" in doc:
                # existing artifact is an UNLABELED single-run schema:
                # wrap it under a default key instead of grafting the
                # label into the run dict (mixed-schema JSON)
                doc = {"unlabeled": doc}
        if label:
            doc[label] = run
        else:
            doc = run
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
