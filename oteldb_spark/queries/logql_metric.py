"""LogQL metric queries (SURVEY §2.3) — range aggs, vector aggs,
binops, label_replace — bound to the testdata logs view.

Spark plan shape for every entry: sample extraction (narrow) →
step fan-out (narrow generate) → one shuffle for groupBy(step, labels)
→ optional second aggregation/join.  The DuckDB oracle re-states the
same semantics with a spine range-join.

Rounding policy (driver hash-matching): aggregates whose float result
depends on accumulation order (sum/avg/stddev/stdvar/quantile of
doubles) are rounded to 6 decimals on BOTH sides; counts, rates
(count/range), min/max, first/last are order-independent and left
exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.range_agg import ORACLE_AGG_SQL, range_aggregate
from ..operators.stepfanout import fanout_join_sql
from ..operators.vector_agg import vector_aggregate
from ..operators.binop import vector_binop
from ..signals import LOGS_CTE, logs_frame, with_ctes
from .registry import END_US, RANGE_S, RANGE_US, START_US, STEP_US, register


def _samples_cte(sample_expr: str, where: str | None, by: list[str]) -> str:
    cols = ", ".join(by)
    w = f" WHERE {where}" if where else ""
    return (
        f"samples AS (SELECT {cols}, ts_us, {sample_expr} AS sample FROM logs{w})"
    )


def _range_oracle(
    op: str,
    *,
    by: list[str],
    sample_expr: str = "1.0",
    where: str | None = None,
    round_digits: int | None = None,
    q: float | None = None,
) -> str:
    fan = fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)
    agg = ORACLE_AGG_SQL[op].format(v="sample", range_s=repr(RANGE_S), q=q, ord="ts_us")
    if round_digits is not None:
        agg = f"round({agg}, {round_digits})"
    cols = ", ".join(by)
    body = f"SELECT {cols}, step_us, {agg} AS value FROM {fan} s GROUP BY {cols}, step_us"
    return with_ctes(LOGS_CTE, _samples_cte(sample_expr, where, by), body=body)


def _range_query(
    op: str,
    *,
    by: list[str],
    sample_col=None,
    where=None,
    round_digits: int | None = None,
    q: float | None = None,
):
    """Build the Spark side of a range aggregation query."""

    def fn(spark, sf_dir):
        logs = logs_frame(spark, sf_dir)
        if where is not None:
            logs = logs.filter(where())
        sample = sample_col() if sample_col is not None else F.lit(1.0)
        samples = logs.select(*by, "ts_us", sample.alias("sample"))
        out = range_aggregate(
            samples,
            op,
            start_us=START_US,
            end_us=END_US,
            step_us=STEP_US,
            range_us=RANGE_US,
            by=by,
            q=q,
            spark=spark,
        )
        if round_digits is not None:
            out = out.withColumn("value", F.round("value", round_digits))
        return out

    return fn


# --- range aggregations ------------------------------------------------------

# count_over_time({env="prod"}[12h]) by (service, level)
register(
    "logql_count_over_time",
    _range_oracle("count_over_time", by=["service", "level"], where="env = 'prod'"),
)(
    _range_query(
        "count_over_time",
        by=["service", "level"],
        where=lambda: F.col("env") == "prod",
    )
)

# rate({env="prod"}[12h]) by (service) — count/range_s (aggregator.go:70-78)
register(
    "logql_rate", _range_oracle("rate", by=["service"], where="env = 'prod'")
)(_range_query("rate", by=["service"], where=lambda: F.col("env") == "prod"))

# bytes_over_time — sum of line lengths (integer-valued ⇒ exact)
register(
    "logql_bytes_over_time",
    _range_oracle(
        "bytes_over_time",
        by=["service"],
        sample_expr="CAST(length(body) AS DOUBLE)",
    ),
)(
    _range_query(
        "bytes_over_time",
        by=["service"],
        sample_col=lambda: F.length("body").cast("double"),
    )
)

# bytes_rate
register(
    "logql_bytes_rate",
    _range_oracle(
        "bytes_rate", by=["service"], sample_expr="CAST(length(body) AS DOUBLE)"
    ),
)(
    _range_query(
        "bytes_rate",
        by=["service"],
        sample_col=lambda: F.length("body").cast("double"),
    )
)

# unwrap-style aggs over the numeric `value` label
for _op, _digits in [
    ("sum_over_time", 6),
    ("avg_over_time", 6),
    ("min_over_time", None),
    ("max_over_time", None),
    ("stddev_over_time", 6),
    ("stdvar_over_time", 6),
    ("first_over_time", None),
    ("last_over_time", None),
]:
    register(
        f"logql_{_op}",
        _range_oracle(
            _op,
            by=["service"],
            sample_expr="value",
            where="env = 'prod'",
            round_digits=_digits,
        ),
    )(
        _range_query(
            _op,
            by=["service"],
            sample_col=lambda: F.col("value"),
            where=lambda: F.col("env") == "prod",
            round_digits=_digits,
        )
    )

# quantile_over_time(0.9, {env="prod"} | unwrap value [12h]) by (service)
register(
    "logql_quantile_over_time",
    _range_oracle(
        "quantile_over_time",
        by=["service"],
        sample_expr="value",
        where="env = 'prod'",
        round_digits=6,
        q=0.9,
    ),
)(
    _range_query(
        "quantile_over_time",
        by=["service"],
        sample_col=lambda: F.col("value"),
        where=lambda: F.col("env") == "prod",
        round_digits=6,
        q=0.9,
    )
)

# absent_over_time on a sparse selector (spine anti-join); the
# selector is sparse enough that some-but-not-all windows are empty
register(
    "logql_absent_over_time",
    with_ctes(
        LOGS_CTE,
        _samples_cte("1.0", "user_id = 13 AND level = 'ERROR'", ["user_id"]),
        body="""SELECT t.step_us, 1.0 AS value
FROM (SELECT range AS step_us FROM range({start}, {end} + 1, {step})) t
LEFT JOIN (SELECT DISTINCT step_us FROM {fan} f) p USING (step_us)
WHERE p.step_us IS NULL""".format(
            start=START_US,
            end=END_US,
            step=STEP_US,
            fan=fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US),
        ),
    ),
)(
    _range_query(
        "absent_over_time",
        by=[],
        where=lambda: (F.col("user_id") == 13) & (F.col("level") == "ERROR"),
    )
)


# --- vector aggregations -----------------------------------------------------

_COUNT_FAN = fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)
_PER_SERIES = (
    "per_series AS (SELECT service, level, step_us, CAST(count(*) AS DOUBLE) AS value"
    f" FROM {_COUNT_FAN} s GROUP BY service, level, step_us)"
)


def _count_by_service_level(spark, sf_dir):
    logs = logs_frame(spark, sf_dir).filter(F.col("env") == "prod")
    samples = logs.select("service", "level", "ts_us", F.lit(1.0).alias("sample"))
    return range_aggregate(
        samples,
        "count_over_time",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
        by=["service", "level"],
    )


# sum by (level) (count_over_time({env="prod"}[12h] by service,level))
@register(
    "logql_vector_sum",
    with_ctes(
        LOGS_CTE,
        _samples_cte("1.0", "env = 'prod'", ["service", "level"]),
        _PER_SERIES,
        body="SELECT level, step_us, CAST(sum(value) AS DOUBLE) AS value"
        " FROM per_series GROUP BY level, step_us",
    ),
)
def logql_vector_sum(spark, sf_dir):
    return vector_aggregate(_count_by_service_level(spark, sf_dir), "sum", by=["level"])


# max by (level) (...)
@register(
    "logql_vector_max",
    with_ctes(
        LOGS_CTE,
        _samples_cte("1.0", "env = 'prod'", ["service", "level"]),
        _PER_SERIES,
        body="SELECT level, step_us, CAST(max(value) AS DOUBLE) AS value"
        " FROM per_series GROUP BY level, step_us",
    ),
)
def logql_vector_max(spark, sf_dir):
    return vector_aggregate(_count_by_service_level(spark, sf_dir), "max", by=["level"])


# topk(3, count_over_time(...)) per step — rank window, deterministic
# tie-break on (value desc, service, level)
@register(
    "logql_topk",
    with_ctes(
        LOGS_CTE,
        _samples_cte("1.0", "env = 'prod'", ["service", "level"]),
        _PER_SERIES,
        body="""SELECT service, level, step_us, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY step_us ORDER BY value DESC, level, service) AS rn
  FROM per_series) WHERE rn <= 3""",
    ),
)
def logql_topk(spark, sf_dir):
    return vector_aggregate(
        _count_by_service_level(spark, sf_dir),
        "topk",
        by=[],
        k=3,
        keep_labels=["service", "level"],
    )


# bottomk(2, ...)
@register(
    "logql_bottomk",
    with_ctes(
        LOGS_CTE,
        _samples_cte("1.0", "env = 'prod'", ["service", "level"]),
        _PER_SERIES,
        body="""SELECT service, level, step_us, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY step_us ORDER BY value ASC, level, service) AS rn
  FROM per_series) WHERE rn <= 2""",
    ),
)
def logql_bottomk(spark, sf_dir):
    return vector_aggregate(
        _count_by_service_level(spark, sf_dir),
        "bottomk",
        by=[],
        k=2,
        keep_labels=["service", "level"],
    )


# --- binary ops --------------------------------------------------------------

_ERR_SAMPLES = (
    "err_samples AS (SELECT service, ts_us, 1.0 AS sample FROM logs"
    " WHERE level = 'ERROR')"
)
_ALL_SAMPLES = "all_samples AS (SELECT service, ts_us, 1.0 AS sample FROM logs)"
_ERR_FAN = fanout_join_sql("err_samples", START_US, END_US, STEP_US, RANGE_US)
_ALL_FAN = fanout_join_sql("all_samples", START_US, END_US, STEP_US, RANGE_US)


def _counts_by_service(spark, sf_dir, where=None):
    logs = logs_frame(spark, sf_dir)
    if where is not None:
        logs = logs.filter(where)
    samples = logs.select("service", "ts_us", F.lit(1.0).alias("sample"))
    return range_aggregate(
        samples,
        "count_over_time",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
        by=["service"],
    )


# error-count / total-count per (service, step): arithmetic binop with
# per-step hash join on the label set (bin_op.go:61-80)
@register(
    "logql_binop_ratio",
    with_ctes(
        LOGS_CTE,
        _ERR_SAMPLES,
        _ALL_SAMPLES,
        f"errs AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_ERR_FAN} s GROUP BY service, step_us)",
        f"alls AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_ALL_FAN} s GROUP BY service, step_us)",
        body="""SELECT e.service, e.step_us, e.value / a.value AS value
FROM errs e JOIN alls a ON e.service = a.service AND e.step_us = a.step_us""",
    ),
)
def logql_binop_ratio(spark, sf_dir):
    errs = _counts_by_service(spark, sf_dir, F.col("level") == "ERROR")
    alls = _counts_by_service(spark, sf_dir)
    return vector_binop(errs, alls, "/", on=["service"])


# set op: steps where a service has errors but no FATAL-severity rows →
# `unless` (anti-join, bin_op.go:22-32)
@register(
    "logql_binop_unless",
    with_ctes(
        LOGS_CTE,
        _ERR_SAMPLES,
        "dbg_samples AS (SELECT service, ts_us, 1.0 AS sample FROM logs"
        " WHERE level = 'DEBUG' AND env = 'staging')",
        f"errs AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_ERR_FAN} s GROUP BY service, step_us)",
        "dbgs AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value FROM "
        + fanout_join_sql("dbg_samples", START_US, END_US, STEP_US, RANGE_US)
        + " s GROUP BY service, step_us)",
        body="""SELECT e.service, e.step_us, e.value
FROM errs e LEFT JOIN dbgs d ON e.service = d.service AND e.step_us = d.step_us
WHERE d.service IS NULL""",
    ),
)
def logql_binop_unless(spark, sf_dir):
    errs = _counts_by_service(spark, sf_dir, F.col("level") == "ERROR")
    dbgs = _counts_by_service(
        spark, sf_dir, (F.col("level") == "DEBUG") & (F.col("env") == "staging")
    )
    return vector_binop(errs, dbgs, "unless", on=["service"])


# label_replace(rate(...), "node", "$1", "service", "svc-(.*)")
@register(
    "logql_label_replace",
    with_ctes(
        LOGS_CTE,
        _ALL_SAMPLES,
        f"alls AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) / {RANGE_S!r}"
        f" AS value FROM {_ALL_FAN} s GROUP BY service, step_us)",
        body="""SELECT regexp_replace(service, 'svc-(.*)', 'node-\\1') AS node,
       step_us, value FROM alls""",
    ),
)
def logql_label_replace(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    samples = logs.select("service", "ts_us", F.lit(1.0).alias("sample"))
    rates = range_aggregate(
        samples,
        "rate",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
        by=["service"],
    )
    return rates.select(
        F.regexp_replace("service", "svc-(.*)", "node-$1").alias("node"),
        "step_us",
        "value",
    )
