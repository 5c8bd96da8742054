"""Expression-barrier regression tests.

`functions.parsers.barrier_cols` and the LogQL compiler's
`_materialize_parsed` exist to kill two plan pathologies:

1. mention amplification — Catalyst inlines a Column expression at
   every mention, so a parsed label referenced by a filter AND the
   output projection re-parses the line twice per row;
2. pushdown single-threading — predicate pushdown drags the inlined
   parse below a repartition into a one-file scan stage, so the whole
   tokenizer runs on one core at small file layouts.

These tests pin both properties structurally (plan text), plus value
equivalence with the un-barriered form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.functions.parsers import barrier_cols, logfmt_map, parse_bytes


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def _lines(spark, n=200):
    return spark.range(n).select(
        F.col("id"),
        F.concat(
            F.lit("evt=x sz="), (F.col("id") % 90 + 10).cast("string"), F.lit("KB")
        ).alias("body"),
    )


def test_barrier_cols_value_equivalence(spark):
    df = _lines(spark)
    direct = (
        df.withColumn("sz", parse_bytes(logfmt_map("body")["sz"]))
        .filter(F.col("sz") >= 50000)
        .select("id", "sz")
    )
    barriered = (
        barrier_cols(df, {"sz": parse_bytes(logfmt_map("body")["sz"])})
        .filter(F.col("sz") >= 50000)
        .select("id", "sz")
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, barriered.collect())
    )


def test_barrier_single_parse_in_plan(spark):
    """The un-barriered form inlines the tokenizer at every mention
    (filter + projection), doubling it; in the barriered plan the
    tokenizer lives ONLY inside the Generate — the filter and the
    projection above it reference plain struct fields."""
    df = _lines(spark)
    expr = {"sz": parse_bytes(logfmt_map("body")["sz"])}
    direct = (
        df.withColumn("sz", parse_bytes(logfmt_map("body")["sz"]))
        .filter(F.col("sz") >= 50000)
        .select("id", "sz")
    )
    barriered = (
        barrier_cols(df, expr).filter(F.col("sz") >= 50000).select("id", "sz")
    )
    token = "regexp_extract_all"
    bp = _physical(barriered)
    above = bp.split("Generate", 1)[0]  # Project + Filter above it
    assert token not in above
    # mention amplification: the direct plan carries strictly more
    # copies of the tokenizer than the single Generate does
    assert _physical(direct).count(token) > bp.count(token)


def test_barrier_keeps_parse_above_repartition(spark):
    """Pushdown must not sink the parse below the spread repartition:
    in the barriered plan the scan-side stage (below the Exchange)
    contains no tokenizer expression."""
    df = _lines(spark).repartition(8)
    barriered = barrier_cols(
        df, {"sz": parse_bytes(logfmt_map("body")["sz"])}
    ).filter(F.col("sz") >= 50000)
    plan = _physical(barriered)
    below = plan.split("Exchange", 1)[-1]
    assert "regexp_extract_all" not in below


def test_compiler_materializes_parser_stage_once(spark):
    """`| logfmt | took > 200ms` through the real compiler: the label
    filter and the listing projection share ONE parse (the plan has a
    single Generate carrying the tokenizer)."""
    from oteldb_spark.logql.compiler import EvalParams, LogSource, compile_logql

    src = LogSource(
        df=spark.range(100).select(
            F.lit(1).cast("long").alias("ts_us"),
            F.concat(F.lit("took="), (F.col("id") % 400).cast("string"), F.lit("ms"))
            .alias("body"),
            F.lit("svc").alias("service"),
        ),
        ts_col="ts_us",
        body_col="body",
        label_cols={"service": "service"},
    )
    out = compile_logql(
        '{service="svc"} | logfmt | took > 200ms',
        src,
        EvalParams(start_us=0, end_us=10, step_us=1),
    )
    plan = _physical(out)
    assert "Generate" in plan
    # no LOGFMT tokenizer above the Generate: the label filter and the
    # projection read struct fields, not re-inlined parses (the cheap
    # duration-unit regex running on the barriered attribute is fine)
    logfmt_token = '([^\\s="]+)='
    assert logfmt_token not in plan.split("Generate", 1)[0]
    assert logfmt_token in plan  # ...and it does live in the Generate
    rows = out.collect()
    assert all("took=" in r["body"] for r in rows)


def _json_source(spark, n=100):
    from oteldb_spark.logql.compiler import LogSource

    return LogSource(
        df=spark.range(n).select(
            F.lit(1).cast("long").alias("ts_us"),
            F.concat(
                F.lit('{"a":"'),
                (F.col("id") % 7).cast("string"),
                F.lit('","b":"'),
                (F.col("id") % 3).cast("string"),
                F.lit('","c":"x"}'),
            ).alias("body"),
            F.lit("svc").alias("service"),
        ),
        ts_col="ts_us",
        body_col="body",
        label_cols={"service": "service"},
    )


def test_barrier_prunes_statically_dead_labels(spark):
    """`| json a, b, c | a > 1 | keep a` — c is never referenced after
    the parser, so its extraction must stay OUT of the Generate struct
    (nested-field pruning through a Generate is not guaranteed, so a
    packed-but-unused field would be computed per row).  a (kept) and
    the filter's mention of a stay packed."""
    from oteldb_spark.logql.compiler import (
        EvalParams,
        LogSource,  # noqa: F401  (re-exported for _json_source)
        compile_logql,
    )

    out = compile_logql(
        '{service="svc"} | json a="a", b="b", c="c" | a > 1 | keep a',
        _json_source(spark),
        EvalParams(start_us=0, end_us=10, step_us=1),
    )
    plan = _physical(out)
    assert "Generate" in plan
    # the struct carries only the live label's path
    assert plan.count("$.c") == 0 and plan.count("$.b") == 0
    assert "$.a" in plan
    rows = out.collect()
    assert rows and all(int(r["a"]) > 1 for r in rows)
    # value parity with the unpruned pipeline (no keep)
    full = compile_logql(
        '{service="svc"} | json a="a", b="b", c="c" | a > 1',
        _json_source(spark),
        EvalParams(start_us=0, end_us=10, step_us=1),
    )
    assert sorted(r["a"] for r in rows) == sorted(
        r["a"] for r in full.collect()
    )


def test_no_parsed_struct_column_leaks(spark):
    """Parser stages append internal __parsed_N struct columns to the
    working frame; every terminal projection must exclude them — a
    future select('*') output path would leak them into driver-hashed
    output (ADVICE r9)."""
    from oteldb_spark.logql.compiler import EvalParams, compile_logql

    for q in (
        '{service="svc"} | json a="a" | a > 1',
        '{service="svc"} | logfmt | keep a',
        'sum by (a) (count_over_time({service="svc"} | json a="a" [10us]))',
    ):
        out = compile_logql(
            q,
            _json_source(spark),
            EvalParams(start_us=0, end_us=10, step_us=1),
            spark=spark,
        )
        leaked = [c for c in out.columns if c.startswith("__parsed_")]
        assert not leaked, (q, leaked)
