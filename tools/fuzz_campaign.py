"""Run EVERY differential fuzzer (PromQL, LogQL, TraceQL spansets,
TraceQL metrics, pprof) across a set of seeds and print one summary
line per run plus a final verdict — the one-command assurance sweep.

Usage:  python tools/fuzz_campaign.py [n_per_run] [seed...]
        (defaults: 80 cases per run, seeds 0 1 2)
Exit 1 if any run had a mismatch or one-sided error.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    seeds = [int(s) for s in sys.argv[2:]] or [0, 1, 2]

    from oteldb_spark.session import get_spark
    from tools.logql_fuzz import (
        run_logql_fuzz,
        run_pushdown_fuzz,
        run_sliding_fuzz,
    )
    from tools.pprof_fuzz import run_pprof_fuzz
    from tools.referee_fuzz import run_fuzz
    from tools.traceql_fuzz import run_traceql_fuzz, run_traceql_metrics_fuzz

    spark = get_spark("fuzz-campaign")
    runs = [
        ("promql", lambda s: run_fuzz(spark, SF_DIR, n, s)),
        ("logql", lambda s: run_logql_fuzz(spark, SF_DIR, n, s)),
        ("logql_pushdown", lambda s: run_pushdown_fuzz(spark, SF_DIR, n, s)),
        ("logql_sliding", lambda s: run_sliding_fuzz(spark, SF_DIR, n, s)),
        ("traceql", lambda s: run_traceql_fuzz(spark, n, s)),
        ("traceql_metrics", lambda s: run_traceql_metrics_fuzz(spark, n, s)),
        ("pprof", lambda s: run_pprof_fuzz(spark, max(10, n // 4), s)),
    ]
    total_fail = 0
    for name, fn in runs:
        for seed in seeds:
            stats, failures = fn(seed)
            bad = [f for f in failures]
            total_fail += len(bad)
            print(json.dumps({"fuzzer": name, "seed": seed, **stats}))
            for q, cls, detail in bad[:3]:
                print(f"  [{cls}] {q!r}\n    {str(detail)[:240]}")
    print(json.dumps({"campaign_failures": total_fail}))
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
