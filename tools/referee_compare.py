"""Run the PromQL compliance corpus through BOTH the Spark engine and
the pure-Python referee (oteldb_spark/referee.py); print a per-entry
classification and a final match rate.

Usage:  python tools/referee_compare.py [sf_dir] [-v]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from oteldb_spark.compliance import (  # noqa: E402
    END_US,
    PROMQL_CORPUS,
    START_US,
    STEP_US,
    expand,
    load_corpus,
    rewrite_promql,
)
from oteldb_spark.referee import build_referee, compare_corpus_entry  # noqa: E402

LOOKBACK_US = 12 * 3_600_000_000


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("-")
        else "/root/testdata/sf0.001"
    )
    verbose = "-v" in sys.argv
    from oteldb_spark.engine import PromQLEngine
    from oteldb_spark.promql import MetricSource
    from oteldb_spark.session import get_spark
    from oteldb_spark.signals import counter_points_frame

    spark = get_spark()
    peng = PromQLEngine(
        MetricSource(
            df=counter_points_frame(spark, sf_dir),
            metrics={
                "events_gauge": "gauge",
                "events_value_total": "counter_mod",
            },
            label_cols=["mtype", "instance"],
        ),
        lookback_us=LOOKBACK_US,
    )
    referee = build_referee(spark, sf_dir, LOOKBACK_US)

    entries = load_corpus(PROMQL_CORPUS)
    stats = {"match": 0, "mismatch": 0, "both_error": 0,
             "engine_only_error": 0, "referee_only_error": 0}
    records = []
    for i, e in enumerate(entries):
        q = rewrite_promql(expand(e.query))
        cls, detail = compare_corpus_entry(
            peng, referee, q, START_US, END_US, STEP_US
        )
        stats[cls] += 1
        records.append({"idx": i, "query": q, "class": cls, "detail": detail})
        if cls != "match" and (verbose or cls == "mismatch"):
            print(f"[{cls}] #{i} {q!r}\n    {detail}")
    total = len(entries)
    ok = stats["match"] + stats["both_error"]
    print(json.dumps({**stats, "total": total,
                      "match_rate": round(ok / total, 4)}))
    with open("/tmp/referee_compare.json", "w") as f:
        json.dump(records, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
