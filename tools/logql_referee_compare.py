"""Run the LogQL compliance corpus through BOTH the Spark engine and
the pure-Python LogQL referee; print per-entry classifications and a
final match rate.

Usage:  python tools/logql_referee_compare.py [sf_dir] [-v]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from oteldb_spark.compliance import (  # noqa: E402
    END_US,
    LOGQL_CORPUS,
    START_US,
    STEP_US,
    expand,
    load_corpus,
    rewrite_logql,
)
from oteldb_spark.logql_referee import (  # noqa: E402
    build_logql_referee,
    compare_logql_entry,
)


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("-")
        else "/root/testdata/sf0.001"
    )
    verbose = "-v" in sys.argv
    from oteldb_spark.engine import LogQLEngine
    from oteldb_spark.logql import LogSource
    from oteldb_spark.session import get_spark
    from oteldb_spark.signals import logs_frame

    spark = get_spark()
    logs = logs_frame(spark, sf_dir)
    leng = LogQLEngine(
        LogSource(
            df=logs,
            label_cols={"service": "service", "env": "env", "level": "level"},
        )
    )
    referee = build_logql_referee(spark, sf_dir)

    entries = load_corpus(LOGQL_CORPUS)
    stats = {"match": 0, "mismatch": 0, "both_error": 0,
             "engine_only_error": 0, "referee_only_error": 0}
    records = []
    for i, e in enumerate(entries):
        q = rewrite_logql(expand(e.query))
        cls, detail = compare_logql_entry(
            leng, referee, q, START_US, END_US, STEP_US
        )
        stats[cls] += 1
        records.append({"idx": i, "query": q, "class": cls, "detail": detail})
        if cls != "match" and (verbose or cls == "mismatch"):
            print(f"[{cls}] #{i} {q!r}\n    {detail[:400]}")
    total = len(entries)
    ok = stats["match"] + stats["both_error"]
    print(json.dumps({**stats, "total": total,
                      "match_rate": round(ok / total, 4)}))
    with open("/tmp/logql_referee_compare.json", "w") as f:
        json.dump(records, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
