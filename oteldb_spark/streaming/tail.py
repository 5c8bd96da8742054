"""Loki ``tail`` analog — live log following as Structured Streaming.

The reference serves ``/loki/api/v1/tail`` over a websocket
(``lokihandler``); the Spark-native equivalent runs the SAME compiled
LogQL pipeline over a file stream of the log store: every stage of a
log query (selector, line filters, parsers, label filters, formats)
is a narrow filter/projection, so the batch compile path applies to a
streaming DataFrame unchanged.  New files appended to the store by
the ingest stream (``streaming/ingest.py``) flow out as matching
lines; the caller attaches its own sink (websocket push, console,
memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..logql import EvalParams, LogSource, compile_logql

_FAR_FUTURE_US = 4_102_444_800_000_000  # 2100-01-01


def tail_logs(
    spark: SparkSession,
    table_dir: str,
    query: str,
    label_cols: dict[str, str],
    schema: str,
    start_us: int = 0,
    ts_col: str = "ts_us",
    body_col: str = "body",
) -> DataFrame:
    """Streaming DataFrame of log lines matching ``query`` from
    ``start_us`` onward.  Metric queries are rejected — tail is a
    log-line follow (the reference's tailer has the same split)."""
    from ..logql import ast
    from ..logql.parser import parse

    expr = parse(query)
    if not isinstance(expr, ast.LogQuery):
        raise SyntaxError("tail: only log (non-metric) queries can be tailed")
    raw = spark.readStream.schema(schema).parquet(table_dir)
    src = LogSource(df=raw, label_cols=label_cols, ts_col=ts_col, body_col=body_col)
    params = EvalParams(start_us, _FAR_FUTURE_US, 3_600_000_000)
    return compile_logql(expr, src, params, spark)
