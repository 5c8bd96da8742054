"""Differential fuzzing for LogQL: seeded-random log pipelines and
metric expressions evaluated by BOTH the Spark engine and the
pure-Python LogQL referee on the same sf0.001 lines.

Usage:  python tools/logql_fuzz.py [n_cases] [seed] [-v]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

_SELECTORS = [
    '{env="prod"}',
    '{env="prod", level="INFO"}',
    '{service=~"svc-[0-3]"}',
    '{env="prod", service!="svc-1"}',
    '{level=~"INFO|ERROR"}',
    '{env!~"stag.*"}',
]
_LINE_FILTERS = [
    '|= "1"', '|= "9"', '!= "2"', '|~ "\\\\d\\\\d"', '!~ "9."',
    '|= "3" or "4"', "",
]
_PARSERS = ["| json", "| json k", "", "| json kv=\"k\""]
_LABEL_FILTERS = [
    "| k >= 40", "| k < 70", '| k =~ "1."', "| k >= 10 and k <= 90",
    '| k > 50 or k < 10', "",
]
_RANGES = ["30m", "1h", "6h", "12h"]
_RANGE_AGGS = ["count_over_time", "rate", "bytes_over_time", "bytes_rate"]
_UNWRAP_AGGS = [
    "sum_over_time", "avg_over_time", "min_over_time", "max_over_time",
    "last_over_time", "first_over_time", "stddev_over_time",
    "stdvar_over_time",
]
# post-parser label-manipulation stages (the divergences these shapes
# caught at adoption: label_format rename keeping src, line filters
# not seeing the line_format body, drop/keep ignoring bare-parser map
# keys)
_SHAPERS = [
    "| label_format lvl=level",
    "| label_format knew=k",
    '| label_format combo="{{.service}}-{{.level}}"',
    '| line_format "{{.k}}" |= "7"',
    '| line_format "v={{.k}} svc={{.service}}" |= "v="',
    "| drop k",
    "| drop level",
    "| keep service, k",
    "| keep service, level",
    "",
]
_ALT_PARSERS = [
    '| regexp "k.: (?P<num>\\\\d+)"',
    '| pattern "{\\"k\\": <num>}"',
]
_VEC_AGGS = ["sum", "avg", "min", "max", "count"]
_GROUPS = ["", " by (service)", " by (level)", " without (service)",
           " by (service, level)"]


def gen_pipeline(rng: random.Random, *, need_json: bool = False) -> str:
    sel = rng.choice(_SELECTORS)
    lf = rng.choice(_LINE_FILTERS)
    parser = rng.choice(_PARSERS[:2]) if need_json else rng.choice(_PARSERS)
    labelf = rng.choice(_LABEL_FILTERS) if "json" in parser else ""
    return " ".join(x for x in (sel, lf, parser, labelf) if x)


def gen_case(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.2:  # log listing
        return gen_pipeline(rng)
    if roll < 0.3:  # label-shaping pipeline (rename/format/drop/keep)
        agg = rng.choice(["count_over_time", "rate"])
        r = rng.choice(_RANGES)
        sel = rng.choice(_SELECTORS)
        parser = "| json" if rng.random() < 0.8 else rng.choice(_ALT_PARSERS)
        shaper = rng.choice(_SHAPERS)
        q = f"{agg}({sel} {parser} {shaper} [{r}])"
    elif roll < 0.38:  # vector-vector set/arith ops
        a = f"count_over_time({rng.choice(_SELECTORS)} [1h])"
        b = f"count_over_time({rng.choice(_SELECTORS)} [6h])"
        op = rng.choice(["and", "or", "unless", "/", "+", ">"])
        q = f"(sum by (service) ({a})) {op} (sum by (service) ({b}))"
        return q
    elif roll < 0.55:  # plain range agg
        agg = rng.choice(_RANGE_AGGS)
        r = rng.choice(_RANGES)
        off = rng.choice(["", "", " offset 30m", " offset 2h"])
        q = f"{agg}({gen_pipeline(rng)} [{r}]{off})"
    elif roll < 0.75:  # unwrap agg
        agg = rng.choice(_UNWRAP_AGGS)
        r = rng.choice(_RANGES)
        pipe = gen_pipeline(rng, need_json=True)
        q = f"{agg}({pipe} | unwrap k [{r}])"
    else:  # quantile
        qq = rng.choice(["0.5", "0.9", "0.99"])
        r = rng.choice(_RANGES)
        pipe = gen_pipeline(rng, need_json=True)
        q = f"quantile_over_time({qq}, {pipe} | unwrap k [{r}])"
    out = rng.random()
    if out < 0.4:
        return f"{rng.choice(_VEC_AGGS)}{rng.choice(_GROUPS)} ({q})"
    if out < 0.55:
        scalar = rng.choice(["2", "0.5", "10"])
        op = rng.choice(["*", "+", "/", "-"])
        return f"{q} {op} {scalar}"
    if out < 0.65:
        thr = rng.choice(["0", "1", "5"])
        return f"{q} > {thr}"
    if out < 0.72:
        return f"topk(2, {q})"
    return q


# the grouping-pushdown rewrite's exact trigger shape: a distributive
# vector agg with by() directly over a matching range agg, with parser
# pipelines / unwrap below (compiler._push_grouping_down +
# _DISTRIBUTIVE).  Generated separately from gen_case so a sweep can
# target the rewrite rather than hit it by chance.
_PUSHDOWN_PAIRS = [
    ("sum", "count_over_time"),
    ("sum", "rate"),
    ("sum", "bytes_over_time"),
    ("sum", "bytes_rate"),
    ("sum", "sum_over_time"),
    ("min", "min_over_time"),
    ("max", "max_over_time"),
]
_PUSH_GROUPS = [
    " by (service)", " by (level)", " by (service, level)", " by (env)",
    " by (k)",  # parser-extracted label
]


def gen_pushdown_case(rng: random.Random) -> str:
    vec, ragg = rng.choice(_PUSHDOWN_PAIRS)
    r = rng.choice(_RANGES)
    off = rng.choice(["", "", " offset 30m"])
    if ragg in ("sum_over_time", "min_over_time", "max_over_time"):
        pipe = gen_pipeline(rng, need_json=True)
        # grouping by the unwrap label itself must NOT rewrite (it
        # groups under "" on the unpushed path) — emit it sometimes so
        # the bail-out is fuzzed too
        grp = rng.choice(_PUSH_GROUPS + [" by (k)"])
        q = f"{ragg}({pipe} | unwrap k [{r}]{off})"
    else:
        pipe = gen_pipeline(rng)
        grp = rng.choice(_PUSH_GROUPS)
        if " (k)" in grp and "json" not in pipe:
            pipe = f"{pipe} | json"
        q = f"{ragg}({pipe} [{r}]{off})"
    return f"{vec}{grp} ({q})"


def pushdown_fires(q: str) -> bool:
    """Whether _push_grouping_down rewrites this expression — a plan-
    level witness that the sweep actually exercises the rewrite."""
    from oteldb_spark.logql.compiler import _push_grouping_down
    from oteldb_spark.logql.parser import parse

    node = parse(q)
    return _push_grouping_down(node) is not None


def run_pushdown_fuzz(spark, sf_dir: str, n: int, seed: int,
                      verbose: bool = False):
    from oteldb_spark.compliance import END_US, START_US, STEP_US
    from oteldb_spark.engine import LogQLEngine
    from oteldb_spark.logql import LogSource
    from oteldb_spark.logql_referee import (
        build_logql_referee,
        compare_logql_entry,
    )
    from oteldb_spark.signals import logs_frame

    leng = LogQLEngine(
        LogSource(
            df=logs_frame(spark, sf_dir),
            label_cols={"service": "service", "env": "env", "level": "level"},
        )
    )
    referee = build_logql_referee(spark, sf_dir)
    rng = random.Random(seed)
    stats = {"match": 0, "mismatch": 0, "both_error": 0,
             "engine_only_error": 0, "referee_only_error": 0,
             "rewrite_fired": 0}
    failures = []
    for _ in range(n):
        q = gen_pushdown_case(rng)
        if pushdown_fires(q):
            stats["rewrite_fired"] += 1
        cls, detail = compare_logql_entry(
            leng, referee, q, START_US, END_US, STEP_US
        )
        stats[cls] += 1
        if cls not in ("match", "both_error"):
            failures.append((q, cls, detail))
            if verbose:
                print(f"[{cls}] {q!r}\n    {detail[:300]}")
    return stats, failures


# shapes that trigger range_aggregate's sliding bucket-merge
# auto-route (min(ratio, steps+1) >= 32): fine 60s step over a 1h
# eval window with ranges >= 32m.  The referee fan-outs naively per
# step, so agreement here is a true cross-check of the merge plan.
_SLIDING_RANGES = ["32m", "60m", "2h", "4h"]
_SLIDING_AGGS = ["count_over_time", "rate", "bytes_over_time", "bytes_rate"]
_SLIDING_UNWRAP_AGGS = ["sum_over_time", "min_over_time", "max_over_time"]


def gen_sliding_case(rng: random.Random) -> str:
    r = rng.choice(_SLIDING_RANGES)
    if rng.random() < 0.6:
        agg = rng.choice(_SLIDING_AGGS)
        q = f"{agg}({gen_pipeline(rng)} [{r}])"
    else:
        agg = rng.choice(_SLIDING_UNWRAP_AGGS)
        q = f"{agg}({gen_pipeline(rng, need_json=True)} | unwrap k [{r}])"
    out = rng.random()
    if out < 0.35:
        return f"{rng.choice(_VEC_AGGS)}{rng.choice(_GROUPS)} ({q})"
    if out < 0.5:
        return f"{q} * 2"
    return q


def run_sliding_fuzz(spark, sf_dir: str, n: int, seed: int,
                     verbose: bool = False):
    from oteldb_spark.compliance import START_US
    from oteldb_spark.engine import LogQLEngine
    from oteldb_spark.logql import LogSource
    from oteldb_spark.logql_referee import (
        build_logql_referee,
        compare_logql_entry,
    )
    from oteldb_spark.signals import logs_frame

    leng = LogQLEngine(
        LogSource(
            df=logs_frame(spark, sf_dir),
            label_cols={"service": "service", "env": "env", "level": "level"},
        )
    )
    referee = build_logql_referee(spark, sf_dir)
    rng = random.Random(seed)
    start = START_US + 6 * 3_600_000_000
    end = start + 3_600_000_000  # 1h of steps
    step = 60_000_000  # 60s → ratio 32..240 on the ranges above
    stats = {"match": 0, "mismatch": 0, "both_error": 0,
             "engine_only_error": 0, "referee_only_error": 0}
    failures = []
    for _ in range(n):
        q = gen_sliding_case(rng)
        cls, detail = compare_logql_entry(leng, referee, q, start, end, step)
        stats[cls] += 1
        if cls not in ("match", "both_error"):
            failures.append((q, cls, detail))
            if verbose:
                print(f"[{cls}] {q!r}\n    {detail[:300]}")
    return stats, failures


def run_logql_fuzz(spark, sf_dir: str, n: int, seed: int,
                   verbose: bool = False):
    from oteldb_spark.compliance import END_US, START_US, STEP_US
    from oteldb_spark.engine import LogQLEngine
    from oteldb_spark.logql import LogSource
    from oteldb_spark.logql_referee import (
        build_logql_referee,
        compare_logql_entry,
    )
    from oteldb_spark.signals import logs_frame

    leng = LogQLEngine(
        LogSource(
            df=logs_frame(spark, sf_dir),
            label_cols={"service": "service", "env": "env", "level": "level"},
        )
    )
    referee = build_logql_referee(spark, sf_dir)
    rng = random.Random(seed)
    stats = {"match": 0, "mismatch": 0, "both_error": 0,
             "engine_only_error": 0, "referee_only_error": 0}
    failures = []
    for _ in range(n):
        q = gen_case(rng)
        cls, detail = compare_logql_entry(
            leng, referee, q, START_US, END_US, STEP_US
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
    stats, failures = run_logql_fuzz(
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
