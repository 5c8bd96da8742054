"""Generate golden snapshots for compact queries at sf0.001
(the reference's gold_test.go strategy).  Run once; tests compare
against the committed files."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from oteldb_spark.queries import QUERIES  # noqa: E402
from oteldb_spark.session import get_spark  # noqa: E402

GOLDEN_QUERIES = [
    "tpch_q1",
    "logql_distinct_labels",
    "profile_apps",
    "ann_cosine_top10",
    "traceql_tag_values",
    "logql_detected_labels",
    "logql_index_stats",
]

OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"


def snapshot(spark, name: str) -> dict:
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    cols = sorted(df.columns)
    rows = sorted(
        [str(r[c]) for c in cols] for r in df.collect()
    )
    return {"columns": cols, "rows": rows}


def main() -> None:
    spark = get_spark("gen-goldens")
    OUT.mkdir(parents=True, exist_ok=True)
    for name in GOLDEN_QUERIES:
        snap = snapshot(spark, name)
        (OUT / f"{name}.json").write_text(json.dumps(snap, indent=1))
        print(f"{name}: {len(snap['rows'])} rows")


if __name__ == "__main__":
    main()
