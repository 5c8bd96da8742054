"""Per-gate shuffle-volume audit: actual bytes shuffled / rows output.

Complements tools/plan_sweep.py (static anti-pattern scan) with
RUNTIME evidence for the scale story: a gate whose shuffle volume is a
small multiple of its output is reduction-shaped (safe to scale); one
that shuffles a large multiple of its input is redistribution-shaped
and needs a layout fix (bucketing, broadcast, pre-aggregation).

Usage::

    python tools/shuffle_audit.py [sf_dir] [gate ...]   # default: bench set

Prints one line per gate: shuffle-write bytes, peak single-stage
shuffle, input bytes read, output rows.  Metrics come from the Spark
status API (same numbers the UI shows), diffed around each gate run.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oteldb_spark.queries import QUERIES  # noqa: E402
from oteldb_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if not args:
        import bench

        args = bench.HEADLINE
    spark = get_spark("oteldb-spark-shuffle-audit")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    from oteldb_spark.operators.pin import release_pins

    rows = []
    for name in args:
        release_pins()
        spark.catalog.clearCache()
        before = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(name, name)
        n = QUERIES[name](spark, sf_dir).count()
        jids = [
            j
            for j in (tracker.getJobIdsForGroup(name) or [])
            if j not in before
        ]
        status = sc._jsc.sc().statusStore()
        sw = mx = rd = 0
        seen: set = set()
        for jid in jids:
            try:
                it = status.job(jid).stageIds().iterator()
            except Exception:
                continue  # job data evicted
            while it.hasNext():
                sid = it.next()
                if sid in seen:
                    continue
                seen.add(sid)
                try:
                    sd = status.lastStageAttempt(sid)
                except Exception:
                    continue  # stage skipped (reused exchange)
                w = sd.shuffleWriteBytes()
                sw += w
                mx = max(mx, w)
                rd += sd.inputBytes()
        rows.append(
            {
                "gate": name,
                "shuffle_mb": round(sw / 1e6, 3),
                "max_stage_shuffle_mb": round(mx / 1e6, 3),
                "input_mb": round(rd / 1e6, 3),
                "rows": n,
            }
        )
        print(
            f"{name}: shuffle={rows[-1]['shuffle_mb']}MB "
            f"(max stage {rows[-1]['max_stage_shuffle_mb']}MB) "
            f"input={rows[-1]['input_mb']}MB rows={n}",
            file=sys.stderr,
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
