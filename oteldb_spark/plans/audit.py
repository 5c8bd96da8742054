"""Physical-plan audit helpers.

``audit(df)`` extracts the scale-relevant facts from the formatted
plan: parquet pushed filters, scanned schema width, exchange
(shuffle) count, broadcast joins, whole-stage-codegen coverage.  Used
by tools/explain_audit.py and tests to assert plans stay sane —
"would this survive a 100× scale-up" as a regression check.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanFacts:
    pushed_filters: list[str]
    read_schemas: list[str]
    n_exchanges: int
    n_broadcasts: int
    n_codegen_spans: int
    text: str


def audit(df: DataFrame) -> PlanFacts:
    text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", text)
    return PlanFacts(
        pushed_filters=[p for p in pushed if p],
        read_schemas=schemas,
        n_exchanges=len(re.findall(r"\bExchange\b", text)),
        n_broadcasts=len(re.findall(r"BroadcastHashJoin|BroadcastExchange", text)),
        n_codegen_spans=len(set(re.findall(r"\[codegen id : (\d+)\]", text))),
        text=text,
    )
