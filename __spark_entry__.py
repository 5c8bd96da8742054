"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the operator inventory from
SURVEY.md §2 plus the training-data-pipeline operators, each bound to
the driver's testdata with a DuckDB oracle (see
``oteldb_spark/queries/``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: topk(3, count_over_time({env="prod"}[12h])) by
    (service, level) — exercises the step-fanout spine, range
    aggregation and the rank-window top-k on sf0.001."""
    from oteldb_spark.queries import QUERIES

    return QUERIES["logql_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from oteldb_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from oteldb_spark.queries import ORACLES

    return dict(ORACLES)
