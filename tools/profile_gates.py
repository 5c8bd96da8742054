"""Warm per-gate profiler — best/median of N repeats in one session.

Usage: python tools/profile_gates.py gate1 gate2 ... [--n 3] [--sf DIR]
Mirrors bench.py's measurement discipline (warm JVM, repeat, best)
so numbers are comparable to BENCH_r*.json entries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oteldb_spark.queries import QUERIES  # noqa: E402
from oteldb_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark("oteldb-spark-profile")
    QUERIES["logql_selector"](spark, sf_dir).count()  # warm
    for name in args:
        ts = []
        for _ in range(n):
            t0 = time.time()
            cnt = QUERIES[name](spark, sf_dir).count()
            ts.append(time.time() - t0)
        ts.sort()
        print(
            f"{name}: best={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"worst={ts[-1]:.3f} rows={cnt}"
        )


if __name__ == "__main__":
    main()
