"""Differential fuzzing: seeded-random PromQL expressions evaluated by
BOTH the Spark engine and the pure-Python referee on the same sf0.001
points — coverage beyond the fixed compliance corpus (expression
shapes the corpus never combines: nested aggs over binops of rate
windows with offsets, …).

Usage:  python tools/referee_fuzz.py [n_cases] [seed] [-v]
The generator lives here and is imported by tests/test_referee_fuzz.py.
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

LOOKBACK_US = 12 * 3_600_000_000

_METRICS = ["events_gauge", "events_value_total"]
_LABELS = ["mtype", "instance"]
_LABEL_VALUES = {
    "mtype": ["click", "view", "purchase", "signup", "error"],
    "instance": [f"host-{i}" for i in range(10)],
}
_RANGES = ["30m", "1h", "2h", "6h", "12h"]
_OFFSETS = ["", " offset 30m", " offset 2h"]
_AGGS = ["sum", "avg", "min", "max", "count", "stddev", "stdvar"]
_OVER_TIME = [
    "avg_over_time", "min_over_time", "max_over_time", "sum_over_time",
    "count_over_time", "stddev_over_time", "stdvar_over_time",
    "last_over_time", "present_over_time",
    "ts_of_last_over_time", "ts_of_max_over_time", "ts_of_min_over_time",
    "absent_over_time",
]
_RATE = ["rate", "increase", "delta", "irate", "idelta", "resets",
         "changes", "deriv"]
_MATH = ["abs", "ceil", "floor", "exp", "ln", "sqrt", "sgn", "sin",
         "cos", "atan"]
_ARITH = ["+", "-", "*", "/", "%", "^"]
_CMP = ["==", "!=", ">", "<", ">=", "<="]


def gen_selector(rng: random.Random) -> str:
    metric = rng.choice(_METRICS)
    parts = []
    if rng.random() < 0.6:
        lbl = rng.choice(_LABELS)
        op = rng.choice(["=", "!=", "=~", "!~"])
        if op in ("=", "!="):
            val = rng.choice(_LABEL_VALUES[lbl])
        else:
            val = rng.choice(
                ["click|view", "host-[0-4]", ".*-1", "purch.*", "host"]
            )
        parts.append(f'{lbl}{op}"{val}"')
    sel = metric + ("{" + ",".join(parts) + "}" if parts else "")
    return sel + rng.choice(_OFFSETS)


def gen_range_call(rng: random.Random) -> str:
    sel = gen_selector(rng)
    # offset must follow the range bracket for range selectors
    off = ""
    for o in (" offset 30m", " offset 2h"):
        if sel.endswith(o):
            sel = sel[: -len(o)]
            off = o
    r = rng.choice(_RANGES)
    # @ pins the range window (evaluated once, replicated per step;
    # predict_linear extends the pinned regression line)
    if rng.random() < 0.12:
        off = off + " " + rng.choice(["@ start()", "@ end()"])
    kind = rng.random()
    if kind < 0.4:
        fn = rng.choice(_RATE)
        if fn in ("rate", "increase", "irate", "resets", "changes"):
            sel = sel.replace("events_gauge", "events_value_total")
        return f"{fn}({sel}[{r}]{off})"
    if kind < 0.5:
        q = rng.choice(["0.1", "0.5", "0.9", "0.99"])
        return f"quantile_over_time({q}, {sel}[{r}]{off})"
    if kind < 0.55:
        return f"predict_linear({sel}[{r}]{off}, 600)"
    return f"{rng.choice(_OVER_TIME)}({sel}[{r}]{off})"


def gen_vector(rng: random.Random, depth: int) -> str:
    roll = rng.random()
    if depth <= 0 or roll < 0.25:
        return gen_selector(rng)
    if roll < 0.55:
        return gen_range_call(rng)
    if roll < 0.7:
        inner = gen_vector(rng, depth - 1)
        agg = rng.choice(_AGGS)
        grp = rng.random()
        if grp < 0.35:
            return f"{agg} by({rng.choice(_LABELS)}) ({inner})"
        if grp < 0.5:
            return f"{agg} without({rng.choice(_LABELS)}) ({inner})"
        if grp < 0.6:
            k = rng.choice(["1", "2", "3"])
            return f"topk({k}, {inner})"
        return f"{agg}({inner})"
    if roll < 0.8:
        fn = rng.choice(_MATH)
        return f"{fn}({gen_vector(rng, depth - 1)})"
    if roll < 0.9:
        lhs = gen_vector(rng, depth - 1)
        scalar = rng.choice(["2", "0.5", "100", "1.5"])
        op = rng.choice(_ARITH)
        # `%` after an exponential blow-up amplifies the 1-ulp
        # difference between Java Math.pow and C libm pow into a
        # full-magnitude result change (mod of a huge value is
        # chaotic in the last bit) — a cross-runtime libm artifact,
        # not a semantics divergence; keep it out of the generator
        if op == "%" and ("^" in lhs or "exp(" in lhs):
            op = "-"
        return (
            f"({lhs}) {op} {scalar}"
            if rng.random() < 0.5
            else f"{scalar} {op} ({lhs})"
        )
    lhs = gen_vector(rng, depth - 1)
    op = rng.choice(_CMP)
    scalar = rng.choice(["10", "50", "90"])
    b = "bool " if rng.random() < 0.5 else ""
    return f"({lhs}) {op} {b}{scalar}"


def gen_vector_pair(rng: random.Random) -> str:
    """Vector-vector matching shapes: set ops, one-to-one on()/
    ignoring(), many-to-one group_left — including combinations whose
    match groups collide (both sides must then refuse identically)."""
    roll = rng.random()
    a = gen_range_call(rng) if rng.random() < 0.5 else gen_selector(rng)
    b = gen_range_call(rng) if rng.random() < 0.5 else gen_selector(rng)
    if roll < 0.3:
        op = rng.choice(["and", "or", "unless"])
        return f"({a}) {op} ({b})"
    if roll < 0.55:
        op = rng.choice(_ARITH[:4])
        match = rng.choice(
            ["", " on(mtype, instance)", " ignoring(nonexistent)"]
        )
        return f"({a}) {op}{match} ({b})"
    if roll < 0.75:
        # many-to-one: per-(mtype,instance) over per-mtype
        op = rng.choice(["/", "-", "*"])
        agg = rng.choice(["sum", "max", "avg"])
        return (
            f"({a}) {op} on(mtype) group_left "
            f"({agg} by(mtype) ({b}))"
        )
    op = rng.choice(_CMP)
    b_mode = "bool " if rng.random() < 0.5 else ""
    return f"({a}) {op} {b_mode}on(mtype, instance) ({b})"


def gen_exotic(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.25:
        inner = gen_vector(rng, 1)
        st = rng.choice(["10m", "30m", "1h"])
        r = rng.choice(["2h", "6h"])
        fn = rng.choice(["avg_over_time", "max_over_time", "min_over_time",
                         "count_over_time"])
        return f"{fn}(({inner})[{r}:{st}])"
    if roll < 0.45:
        sel = gen_selector(rng).split(" offset")[0]
        return (
            f'label_replace({sel}, "region", "r-$1", "instance",'
            f' "host-(.*)")'
        )
    if roll < 0.6:
        sel = gen_selector(rng).split(" offset")[0]
        return f'label_join({sel}, "combo", "-", "mtype", "instance")'
    if roll < 0.75:
        at = rng.choice(["", "", " @ start()", " @ end()"])
        return f"timestamp({gen_selector(rng)}{at})"
    if roll < 0.85:
        fn = rng.choice(["minute", "hour", "day_of_week", "day_of_month",
                         "month", "year"])
        return f"{fn}({gen_selector(rng)})"
    sel = gen_selector(rng)
    return rng.choice(
        [f"absent({sel})", f"scalar({sel}) * 2", f"vector(42)"]
    )


def gen_case(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.2:
        return gen_vector_pair(rng)
    if roll < 0.35:
        return gen_exotic(rng)
    q = gen_vector(rng, 2)
    if rng.random() < 0.15:
        q = f"clamp({q}, 0, 1000)"
    return q


def run_fuzz(spark, sf_dir: str, n: int, seed: int, verbose: bool = False):
    from oteldb_spark.compliance import END_US, START_US, STEP_US
    from oteldb_spark.engine import PromQLEngine
    from oteldb_spark.promql import MetricSource
    from oteldb_spark.referee import build_referee, compare_corpus_entry
    from oteldb_spark.signals import counter_points_frame

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
    rng = random.Random(seed)
    stats = {"match": 0, "mismatch": 0, "both_error": 0,
             "engine_only_error": 0, "referee_only_error": 0}
    failures = []
    for i in range(n):
        q = gen_case(rng)
        cls, detail = compare_corpus_entry(
            peng, referee, q, START_US, END_US, STEP_US
        )
        stats[cls] += 1
        if cls not in ("match", "both_error"):
            failures.append((q, cls, detail))
            if verbose:
                print(f"[{cls}] {q!r}\n    {detail[:300]}")
    return stats, failures


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from oteldb_spark.session import get_spark

    spark = get_spark()
    stats, failures = run_fuzz(
        spark, "/root/testdata/sf0.001", n, seed, verbose=True
    )
    import json

    total = sum(stats.values())
    ok = stats["match"] + stats["both_error"]
    print(json.dumps({**stats, "total": total,
                      "agree_rate": round(ok / total, 4)}))
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
