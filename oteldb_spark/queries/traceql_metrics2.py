"""TraceQL second-stage metrics gates: ``topk``/``bottomk``, point
filters / scalar arithmetic, and ``compare()`` — all parse-only in
the reference (``traceql/op.go:398-419``, ``metrics_expr.go:66-145``,
Tempo 501s them); here they execute on the first-stage step frames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.stepfanout import fanout_join_sql
from ..signals import SPANS_CTE, spans_frame, with_ctes
from ..traceql import SpanSource, compile_traceql_metrics
from .registry import register

_M_START_US = 820_454_400_000_000  # 1996-01-01
_M_END_US = _M_START_US + 364 * 86_400_000_000
_M_STEP_US = 7 * 86_400_000_000
_M_RANGE_US = 28 * 86_400_000_000
_RANGE_S = _M_RANGE_US / 1e6


def _run(q: str):
    def fn(spark, sf_dir):
        src = SpanSource(
            df=spans_frame(spark, sf_dir),
            attr_cols={"service": "service", "service.name": "service"},
        )
        return compile_traceql_metrics(
            q,
            src,
            start_us=_M_START_US,
            end_us=_M_END_US,
            step_us=_M_STEP_US,
            range_us=_M_RANGE_US,
            spark=spark,
        )

    return fn


_ALL_SAMPLES = "samples AS (SELECT service, start_us AS ts_us FROM spans)"
_FAN = fanout_join_sql("samples", _M_START_US, _M_END_US, _M_STEP_US, _M_RANGE_US)

_RATE_CTE = f"""r AS (
  SELECT service, step_us, CAST(count(*) AS DOUBLE) / {_RANGE_S!r} AS value
  FROM {_FAN} s GROUP BY service, step_us
)"""


# { } | rate() by (span.service) | topk(2) — per-step top-2 series,
# ties broken by the label for determinism
register(
    "tql_parsed_metrics_topk",
    with_ctes(
        SPANS_CTE,
        _ALL_SAMPLES,
        _RATE_CTE,
        """k AS (
  SELECT service, step_us, value,
         row_number() OVER (PARTITION BY step_us
                            ORDER BY value DESC, service) AS rk
  FROM r
)""",
        body="SELECT service, step_us, value FROM k WHERE rk <= 2",
    ),
)(_run("{ } | rate() by (span.service) | topk(2)"))


# { } | rate() by (span.service) | bottomk(1)
register(
    "tql_parsed_metrics_bottomk",
    with_ctes(
        SPANS_CTE,
        _ALL_SAMPLES,
        _RATE_CTE,
        """k AS (
  SELECT service, step_us, value,
         row_number() OVER (PARTITION BY step_us
                            ORDER BY value ASC, service) AS rk
  FROM r
)""",
        body="SELECT service, step_us, value FROM k WHERE rk <= 1",
    ),
)(_run("{ } | rate() by (span.service) | bottomk(1)"))


# { } | rate() by (span.service) | * 60 | > 0.004 — scalar arithmetic
# then point filter (MetricsScalarOp + MetricsFilter)
register(
    "tql_parsed_metrics_scalar_filter",
    with_ctes(
        SPANS_CTE,
        _ALL_SAMPLES,
        _RATE_CTE,
        body="""SELECT service, step_us, value * 60 AS value
FROM r WHERE value * 60 > 0.004""",
    ),
)(_run("{ } | rate() by (span.service) | * 60 | > 0.004"))


# { } | compare({ status = error }, 2) — selection vs baseline count
# series per declared attribute, top-2 values per (group, attr)
@register(
    "tql_parsed_compare",
    with_ctes(
        SPANS_CTE,
        """gsamples AS (
  SELECT CASE WHEN status_code = 2 THEN 'selection' ELSE 'baseline' END
           AS meta_type,
         'service' AS key, service AS val, start_us AS ts_us
  FROM spans
)""",
        f"""c AS (
  SELECT meta_type, key, val, step_us, CAST(count(*) AS DOUBLE) AS value
  FROM {fanout_join_sql("gsamples", _M_START_US, _M_END_US, _M_STEP_US, _M_RANGE_US)} s
  GROUP BY meta_type, key, val, step_us
)""",
        """t AS (
  SELECT meta_type, key, val, sum(value) AS tot FROM c
  GROUP BY meta_type, key, val
), keep AS (
  SELECT meta_type, key, val FROM (
    SELECT meta_type, key, val,
           row_number() OVER (PARTITION BY meta_type, key
                              ORDER BY tot DESC, val) AS rk
    FROM t
  ) WHERE rk <= 2
)""",
        body="""SELECT c.meta_type, c.key, c.val, c.step_us, c.value
FROM c JOIN keep USING (meta_type, key, val)""",
    ),
)
def tql_parsed_compare(spark, sf_dir):
    return _run("{ } | compare({ status = error }, 2)")(spark, sf_dir)
