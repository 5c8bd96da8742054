"""PromQL queries (SURVEY §2.4) over synthesized counter series.

The counters view (signals.counter_points_frame) gives per-(mtype,
instance) monotone counters plus a wrapped variant with deterministic
resets — so rate/increase exercise the full counter-reset +
extrapolation path of ``querier_metrics_rate.go``.

All rate-family values are rounded to 9 decimals on both sides: the
Spark and DuckDB expressions are written with identical operation
order, so agreement is at the ulp level and 9 digits is conservative.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.range_agg import range_aggregate
from ..operators.rate import rate_family, rate_family_oracle_sql
from ..operators.stepfanout import fanout_join_sql
from ..operators.vector_agg import vector_aggregate
from ..signals import COUNTERS_CTE, counter_points_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register

SERIES = ["mtype", "instance"]
_RD = 9


def _rate_query(op: str, value_col: str):
    def fn(spark, sf_dir):
        pts = counter_points_frame(spark, sf_dir)
        out = rate_family(
            pts,
            op,
            series=SERIES,
            value_col=value_col,
            start_us=START_US,
            end_us=END_US,
            step_us=STEP_US,
            range_us=RANGE_US,
        )
        return out.withColumn("value", F.round("value", _RD))

    return fn


def _split_ctes(sql: str) -> tuple[str, str]:
    """Split 'cte1 AS (...),\n...\nSELECT ...' into (ctes, final select)."""
    idx = sql.rfind("\nSELECT ")
    return sql[:idx].rstrip().rstrip(","), sql[idx + 1 :]


def _rate_oracle(op: str, value_col: str) -> str:
    inner = rate_family_oracle_sql(
        op,
        source=f"(SELECT mtype, instance, ts_us, {value_col} AS v FROM counters)",
        series_sql=SERIES,
        value_col="v",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
    )
    ctes, final_select = _split_ctes(inner)
    return (
        f"WITH {COUNTERS_CTE},\n{ctes},\nfinal AS (\n{final_select}\n)\n"
        f"SELECT mtype, instance, step_us, round(value, {_RD}) AS value FROM final"
    )


def _register_rate(op: str, value_col: str, name: str) -> None:
    register(name, _rate_oracle(op, value_col))(_rate_query(op, value_col))


# rate/increase/irate on the wrapped counter (has resets); delta/idelta
# on the gauge
_register_rate("rate", "counter_mod", "promql_rate")
_register_rate("increase", "counter_mod", "promql_increase")
_register_rate("delta", "gauge", "promql_delta")
_register_rate("irate", "counter_mod", "promql_irate")
_register_rate("idelta", "gauge", "promql_idelta")


# sum by (mtype) (avg_over_time(gauge[12h])) — PromQL range function
# feeding a vector aggregation, via the shared step machinery
_GAUGE_CTE = "samples AS (SELECT mtype, instance, ts_us, gauge AS sample FROM counters)"
_G_FAN = fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)

@register(
    "promql_sum_avg_over_time",
    with_ctes(
        COUNTERS_CTE,
        _GAUGE_CTE,
        f"per_series AS (SELECT mtype, instance, step_us, avg(sample) AS value"
        f" FROM {_G_FAN} s GROUP BY mtype, instance, step_us)",
        body="SELECT mtype, step_us, round(CAST(sum(value) AS DOUBLE), 6) AS value"
        " FROM per_series GROUP BY mtype, step_us",
    ),
)
def promql_sum_avg_over_time(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    samples = pts.select("mtype", "instance", "ts_us", F.col("gauge").alias("sample"))
    per_series = range_aggregate(
        samples,
        "avg_over_time",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
        by=SERIES,
    )
    out = vector_aggregate(per_series, "sum", by=["mtype"])
    return out.withColumn("value", F.round("value", 6))

