"""Differential TraceQL fuzzing: seeded-random span TREES and queries
evaluated by BOTH the Spark compiler (oteldb_spark/traceql) and the
pure-Python referee (oteldb_spark/traceql_referee.py).

Random trees go deeper (up to ~8 levels) and bushier than the
testdata's 2-level order/lineitem forest, so the structural operators
(full 16-op table), by()/coalesce() grouping and scalar filters get
exercised on shapes the oracle gates cannot reach.

Usage:  python tools/traceql_fuzz.py [n_cases] [seed]
Imported by tests/test_referee_fuzz.py.
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

_SERVICES = ["frontend", "svc-0", "svc-1", "svc-2", "svc-3"]
_NAMES = [f"op-{i}" for i in range(6)]
_ATTR_MAP = {
    "service": "service",
    "service.name": "service",
    "retries": "retries",
}


def gen_spans(rng: random.Random, n_traces: int = 24) -> list[dict]:
    spans = []
    for t in range(1, n_traces + 1):
        next_id = 1
        nodes: list[int] = []
        for _ in range(1 if rng.random() < 0.85 else 2):
            spans.append(_mk(rng, t, next_id, None))
            nodes.append(next_id)
            next_id += 1
        # attaching each new span to a uniformly random existing node
        # yields random recursive trees (expected depth ~log n, tail
        # much deeper) — plus a biased "chain" mode for depth
        chain = rng.random() < 0.25
        for _ in range(rng.randint(4, 14)):
            parent = nodes[-1] if chain else rng.choice(nodes)
            spans.append(_mk(rng, t, next_id, parent))
            nodes.append(next_id)
            next_id += 1
    return spans


def _mk(rng: random.Random, trace: int, sid: int, parent) -> dict:
    start = 1_700_000_000_000_000 + rng.randint(0, 10_000_000)
    events = []
    for _ in range(rng.choice([0, 0, 1, 1, 2, 3])):
        attrs = {"mode": rng.choice(["A", "B", "C"])}
        if rng.random() < 0.4:
            attrs["disc"] = rng.choice(["x", "y"])
        events.append(
            {
                "name": rng.choice(["ship", "receipt", "retry", ""]),
                "ts_us": start + rng.choice([0, 1_000, 5_000, 20_000]),
                "attrs": attrs,
            }
        )
    links = []
    for _ in range(rng.choice([0, 0, 0, 1, 2])):
        links.append(
            {
                "trace_id": trace,
                "span_id": rng.randint(1, 6),
                "attrs": {"lkind": rng.choice(["parent", "peer"])},
            }
        )
    return {
        "trace_id": trace,
        "span_id": sid,
        "parent_span_id": parent,
        "service": rng.choice(_SERVICES),
        "name": rng.choice(_NAMES),
        "kind": rng.randint(1, 5),
        "status_code": rng.choice([0, 0, 1, 2]),
        "start_us": start,
        "duration_us": rng.randint(500, 200_000),
        "retries": rng.randint(0, 5),
        "events": events,
        "links": links,
    }


def gen_pred(rng: random.Random, depth: int = 2) -> str:
    roll = rng.random()
    if depth > 0 and roll < 0.25:
        a, b = gen_pred(rng, depth - 1), gen_pred(rng, depth - 1)
        op = rng.choice(["&&", "||"])
        return f"({a}) {op} ({b})"
    roll = rng.random()
    if roll < 0.18:
        op = rng.choice(["=", "!=", "=~", "!~"])
        if op in ("=~", "!~"):
            val = rng.choice(["svc-[0-2]", "svc.*", "front", "-1"])
        else:
            val = rng.choice(_SERVICES)
        scope = rng.choice(["", "span.", "resource."])
        attr = "service.name" if scope == "resource." else "service"
        return f'{scope}{attr} {op} "{val}"'
    if roll < 0.34:
        op = rng.choice(["=", "!=", "=~"])
        val = (
            rng.choice(["op-.*", "op-[0-3]"])
            if op == "=~"
            else rng.choice(_NAMES)
        )
        return f'name {op} "{val}"'
    if roll < 0.52:
        op = rng.choice([">", ">=", "<", "<="])
        if rng.random() < 0.5:
            return f"duration {op} {rng.choice(['1ms', '20ms', '100ms'])}"
        return f"duration {op} {rng.randint(1_000, 150_000)}"
    if roll < 0.64:
        return f"status {rng.choice(['=', '!='])} {rng.choice(['error', 'ok', 'unset'])}"
    if roll < 0.76:
        return f"kind = {rng.choice(['internal', 'server', 'client', 'producer', 'consumer'])}"
    if roll < 0.86:
        op = rng.choice(["=", "!=", ">", ">=", "<", "<="])
        return f"retries {op} {rng.randint(0, 4)}"
    if roll < 0.9:
        # trace-context intrinsics (compiled via per-trace enrichment)
        return rng.choice(
            [
                f'rootName {rng.choice(["=", "!=", "=~"])} "'
                + rng.choice(_NAMES + ["op-.*"]) + '"',
                f'rootServiceName = "{rng.choice(_SERVICES)}"',
                f"traceDuration > {rng.randint(50_000, 400_000)}",
                f"childCount {rng.choice(['=', '>', '>='])} {rng.randint(0, 4)}",
                # nested-set coords (reserved by the reference,
                # computed here — per-trace 1-based DFS numbering)
                "nestedSetParent = -1",
                f"nestedSetParent {rng.choice(['=', '>='])} {rng.randint(1, 6)}",
                f"nestedSetLeft {rng.choice(['=', '>', '<='])} {rng.randint(1, 10)}",
                f"nestedSetRight {rng.choice(['>=', '<'])} {rng.randint(1, 12)}",
                f"nestedSetRight - nestedSetLeft {rng.choice(['=', '>='])} "
                f"{rng.randint(0, 5)}",
            ]
        )
    if roll < 0.96:
        # event/link scopes: first-match over the span's arrays
        return rng.choice(
            [
                f'event.mode {rng.choice(["=", "!="])} "{rng.choice(["A", "B", "C"])}"',
                f'event.disc = "{rng.choice(["x", "y"])}"',
                f'event:name = "{rng.choice(["ship", "receipt", "retry"])}"',
                f"event:timeSinceStart {rng.choice(['>', '<='])} "
                f"{rng.choice(['1ms', '4ms', '10ms'])}",
                f'link.lkind = "{rng.choice(["parent", "peer"])}"',
                f"link:spanID {rng.choice(['=', '>='])} {rng.randint(1, 6)}",
                f"span:id {rng.choice(['=', '>'])} {rng.randint(1, 12)}",
                f"span:parentID = {rng.randint(1, 6)}",
                # parent scope: resolved via the pre-joined parent row
                f'parent.service = "{rng.choice(_SERVICES)}"',
                f'parent.name {rng.choice(["=", "!="])} "{rng.choice(_NAMES)}"',
                f"parent.duration > {rng.randint(10_000, 150_000)}",
                f"parent.retries >= {rng.randint(0, 4)}",
            ]
        )
    # arithmetic over numeric fields
    return f"duration * 2 + retries > {rng.randint(10_000, 250_000)}"


_REL_OPS = [">", ">>", "~", "<", "<<", "!>", "!>>", "!~",
            "&>", "&>>", "&<", "&<<", "&~"]


def gen_query(rng: random.Random) -> str:
    def spanset() -> str:
        if rng.random() < 0.08:
            return "{ }"
        return "{ " + gen_pred(rng) + " }"

    roll = rng.random()
    if roll < 0.5:
        q = spanset()
        if rng.random() < 0.55:
            q = f"{q} {rng.choice(_REL_OPS)} {spanset()}"
    else:
        # relation first (the engine requires the relation's lhs to be
        # a plain spanset), then &&/|| chain — matches left-assoc parse
        q = f"{spanset()} {rng.choice(_REL_OPS)} {spanset()}"
        for _ in range(rng.randint(1, 2)):
            q = f"{q} {rng.choice(['&&', '||'])} {spanset()}"
    # pipeline stages
    if rng.random() < 0.45:
        stages = []
        if rng.random() < 0.4:
            stages.append(f"| by({rng.choice(['service', 'name'])})")
        agg = rng.choice(
            ["count()", "avg(duration)", "max(duration)", "min(duration)",
             "sum(duration)", "max(retries)", "sum(retries)",
             "max(childCount)", "avg(childCount)"]
        )
        op = rng.choice([">", ">=", "<", "<=", "!="])
        if "duration" in agg and rng.random() < 0.5:
            val = rng.choice(["5ms", "50ms", "120ms"])
        elif "duration" in agg:
            val = str(rng.randint(5_000, 300_000))
        else:
            val = str(rng.randint(1, 12))
        stages.append(f"| {agg} {op} {val}")
        if rng.random() < 0.3:
            stages.append("| coalesce()")
            stages.append(f"| count() {rng.choice(['>', '<='])} {rng.randint(1, 8)}")
        q = f"{q} {' '.join(stages)}"
    if rng.random() < 0.12:
        # projection stage LAST (span identity unchanged — the
        # comparator reads trace_id/span_id either way)
        q = f"{q} | select({rng.choice(['service', 'name, duration', 'retries'])})"
    return q


# window for metrics queries: spans start in [BASE, BASE+10s]
_M_START = 1_700_000_000_000_000
_M_END = _M_START + 10_000_000
_M_STEP = 2_000_000
_M_RANGE = 4_000_000


def gen_metrics_query(rng: random.Random) -> str:
    base = "{ " + gen_pred(rng, 1) + " }" if rng.random() < 0.8 else "{ }"
    fn = rng.choice(
        ["rate()", "count_over_time()", "avg_over_time(duration)",
         "max_over_time(duration)", "min_over_time(duration)",
         "sum_over_time(retries)",
         f"quantile_over_time(duration, {rng.choice(['0.5', '0.9', '0.99'])})"]
    )
    q = f"{base} | {fn}"
    if rng.random() < 0.6:
        by = rng.choice(["service", "name", "service, name"])
        q = f"{q} by({by})"
    if rng.random() < 0.5:
        st = rng.random()
        if st < 0.4:
            q = f"{q} | {rng.choice(['topk', 'bottomk'])}({rng.randint(1, 3)})"
        elif st < 0.7:
            q = f"{q} | {rng.choice(['>', '>=', '<', '<='])} {rng.choice(['0.5', '2', '40000'])}"
        else:
            q = f"{q} | {rng.choice(['*', '+', '-'])} {rng.choice(['2', '0.5', '10'])}"
    return q


def _metrics_compare(engine_rows, by_n, ref_out, tol=1e-9):
    eng = {}
    for r in engine_rows:
        vals = tuple(r)[: by_n]
        step = r["step_us"]
        eng[vals + (step,)] = r["value"]
    if set(eng) != set(ref_out):
        return (
            f"keys differ: engine-only={sorted(set(eng) - set(ref_out))[:4]} "
            f"referee-only={sorted(set(ref_out) - set(eng))[:4]}"
        )
    for k, ev in eng.items():
        rv = ref_out[k]
        if ev is None and rv is None:
            continue
        if ev is None or rv is None:
            return f"null mismatch at {k}: engine={ev} referee={rv}"
        if abs(ev - rv) > tol * max(1.0, abs(ev), abs(rv)):
            return f"value mismatch at {k}: engine={ev} referee={rv}"
    return None


def run_traceql_metrics_fuzz(spark, n: int, seed: int, verbose: bool = False):
    from oteldb_spark.traceql import SpanSource
    from oteldb_spark.traceql.compiler import compile_traceql_metrics
    from oteldb_spark.traceql import parser as TP
    from oteldb_spark.traceql_referee import TraceQLReferee

    rng = random.Random(seed)
    spans = gen_spans(rng)
    df = _spans_df(spark, spans)
    source = SpanSource(
        df=df,
        attr_cols=dict(_ATTR_MAP),
        events_col="events",
        links_col="links",
    )
    referee = TraceQLReferee(spans, dict(_ATTR_MAP))
    kw = dict(start_us=_M_START, end_us=_M_END, step_us=_M_STEP,
              range_us=_M_RANGE)
    stats = {"match": 0, "mismatch": 0, "both_error": 0,
             "engine_only_error": 0, "referee_only_error": 0}
    failures = []
    for _ in range(n):
        q = gen_metrics_query(rng)
        by_n = 0
        eng_err = ref_err = detail = None
        try:
            ast = TP.parse(q)
            fn = next(
                s for s in ast.stages if isinstance(s, TP.MetricFn)
            )
            by_n = len(fn.by)
            rows = compile_traceql_metrics(q, source, spark=spark, **kw).collect()
        except Exception as e:  # noqa: BLE001
            eng_err = repr(e)
        try:
            ref_out = referee.query_metrics(q, **kw)
        except Exception as e:  # noqa: BLE001
            ref_err = repr(e)
        if eng_err and ref_err:
            stats["both_error"] += 1
            continue
        if eng_err:
            stats["engine_only_error"] += 1
            failures.append((q, "engine_only_error", eng_err))
        elif ref_err:
            stats["referee_only_error"] += 1
            failures.append((q, "referee_only_error", ref_err))
        else:
            detail = _metrics_compare(rows, by_n, ref_out)
            if detail is None:
                stats["match"] += 1
            else:
                stats["mismatch"] += 1
                failures.append((q, "mismatch", detail))
        if failures and verbose and failures[-1][0] == q:
            print(f"[{failures[-1][1]}] {q!r}\n    {failures[-1][2][:300]}")
    return stats, failures


def _spans_df(spark, spans):
    return spark.createDataFrame(
        [
            (
                s["trace_id"], s["span_id"], s["parent_span_id"],
                s["service"], s["name"], s["kind"], s["status_code"],
                s["start_us"], s["duration_us"], s["retries"],
                [
                    (e["name"], e["ts_us"], e["attrs"])
                    for e in s["events"]
                ],
                [
                    (ln["trace_id"], ln["span_id"], ln["attrs"])
                    for ln in s["links"]
                ],
            )
            for s in spans
        ],
        "trace_id long, span_id long, parent_span_id long, service string,"
        " name string, kind int, status_code int, start_us long,"
        " duration_us long, retries long,"
        " events array<struct<name:string,ts_us:bigint,"
        "attrs:map<string,string>>>,"
        " links array<struct<trace_id:bigint,span_id:bigint,"
        "attrs:map<string,string>>>",
    ).cache()


def run_traceql_fuzz(spark, n: int, seed: int, verbose: bool = False):
    from oteldb_spark.traceql import SpanSource, compile_traceql
    from oteldb_spark.traceql_referee import TraceQLReferee

    rng = random.Random(seed)
    spans = gen_spans(rng)
    df = _spans_df(spark, spans)
    df.count()
    source = SpanSource(
        df=df,
        attr_cols=dict(_ATTR_MAP),
        events_col="events",
        links_col="links",
    )
    referee = TraceQLReferee(spans, dict(_ATTR_MAP))

    stats = {"match": 0, "mismatch": 0, "both_error": 0,
             "engine_only_error": 0, "referee_only_error": 0}
    failures = []
    for _ in range(n):
        q = gen_query(rng)
        eng_err = ref_err = None
        eng_set = ref_set = None
        try:
            rows = (
                compile_traceql(q, source)
                .select("trace_id", "span_id")
                .collect()
            )
            eng_set = {(r.trace_id, r.span_id) for r in rows}
        except Exception as e:  # noqa: BLE001
            eng_err = repr(e)
        try:
            ref_set = referee.query(q)
        except Exception as e:  # noqa: BLE001
            ref_err = repr(e)
        if eng_err and ref_err:
            stats["both_error"] += 1
            continue
        if eng_err:
            stats["engine_only_error"] += 1
            failures.append((q, "engine_only_error", eng_err))
        elif ref_err:
            stats["referee_only_error"] += 1
            failures.append((q, "referee_only_error", ref_err))
        elif eng_set == ref_set:
            stats["match"] += 1
        else:
            stats["mismatch"] += 1
            detail = (
                f"engine-only={sorted(eng_set - ref_set)[:5]} "
                f"referee-only={sorted(ref_set - eng_set)[:5]}"
            )
            failures.append((q, "mismatch", detail))
        if failures and verbose and failures[-1][0] == q:
            cls, detail = failures[-1][1], failures[-1][2]
            print(f"[{cls}] {q!r}\n    {detail[:300]}")
    return stats, failures


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    mode = sys.argv[3] if len(sys.argv) > 3 else "spans"
    from oteldb_spark.session import get_spark

    spark = get_spark()
    runner = run_traceql_metrics_fuzz if mode == "metrics" else run_traceql_fuzz
    stats, failures = runner(spark, n, seed, verbose=True)
    import json

    total = sum(stats.values())
    ok = stats["match"] + stats["both_error"]
    print(json.dumps({**stats, "total": total,
                      "agree_rate": round(ok / total, 4)}))
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
