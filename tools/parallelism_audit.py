"""Per-gate stage-parallelism audit: find heavy ONE-TASK stages.

Complements tools/shuffle_audit.py (shuffle volume) and
tools/plan_sweep.py (static anti-patterns) with the failure mode both
miss: a stage that is *correct* and *shuffle-light* but runs all of
its work in a single task — either because a one-file scan feeds
per-row-heavy compute, or because predicate pushdown dragged an
expensive expression below a repartition into the narrow scan stage
(the two pathologies fixed in round 9's expression-barrier work).  At
fixture scale that reads as "a bit slow"; at 100 TB a one-task stage
is a stalled job.

Usage::

    python tools/parallelism_audit.py [sf_dir] [gate ...]

Default gate set: the bench HEADLINE.  For each gate, prints every
stage whose total executor run time exceeds MIN_STAGE_MS but ran on
fewer than MIN_TASKS tasks, with the heaviest such stage flagged.
Exit code 1 if any flagged stage exceeds FLAG_MS (a genuinely heavy
serial stage), else 0.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oteldb_spark.queries import QUERIES  # noqa: E402
from oteldb_spark.session import get_spark  # noqa: E402

MIN_STAGE_MS = 300  # ignore trivial stages
MIN_TASKS = 2  # "serial" = fewer than this
FLAG_MS = 2000  # a serial stage this heavy fails the audit


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if not args:
        import bench

        args = bench.HEADLINE
    spark = get_spark("oteldb-spark-parallelism-audit")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    from oteldb_spark.operators.pin import release_pins

    out = []
    worst_ms = 0
    for name in args:
        if name not in QUERIES:
            continue
        release_pins()
        spark.catalog.clearCache()
        # snapshot prior job ids from the SAME group key the new jobs
        # will land in (a None-group snapshot subtracts nothing)
        before = set(tracker.getJobIdsForGroup(name) or [])
        sc.setJobGroup(name, name)
        # noop sink, not .count(): count lets column pruning eliminate
        # projection-only heavy expressions, under-reporting exactly
        # the serial stages this audit exists to find
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        jids = [
            j
            for j in (tracker.getJobIdsForGroup(name) or [])
            if j not in before
        ]
        status = sc._jsc.sc().statusStore()
        serial = []
        seen: set = set()
        for jid in jids:
            try:
                it = status.job(jid).stageIds().iterator()
            except Exception:
                continue
            while it.hasNext():
                sid = it.next()
                if sid in seen:
                    continue
                seen.add(sid)
                try:
                    sd = status.lastStageAttempt(sid)
                except Exception:
                    continue
                run_ms = sd.executorRunTime()
                tasks = sd.numCompleteTasks()
                if run_ms >= MIN_STAGE_MS and tasks < MIN_TASKS:
                    serial.append(
                        {"stage": sid, "ms": int(run_ms), "tasks": int(tasks)}
                    )
        if serial:
            heaviest = max(s["ms"] for s in serial)
            worst_ms = max(worst_ms, heaviest)
            out.append({"gate": name, "serial_stages": serial})
            print(
                f"SERIAL {name}: "
                + ", ".join(
                    f"stage {s['stage']} {s['ms']}ms/{s['tasks']}t"
                    for s in serial
                ),
                file=sys.stderr,
            )
        else:
            print(f"ok     {name}", file=sys.stderr)
    print(json.dumps({"flag_ms": FLAG_MS, "flagged": out}))
    return 1 if worst_ms >= FLAG_MS else 0


if __name__ == "__main__":
    raise SystemExit(main())
