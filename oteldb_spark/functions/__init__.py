"""Shared column helpers used across the query compilers."""

from __future__ import annotations

from pyspark.sql import Column


def anchored_rlike(c: Column, pattern: str) -> Column:
    """Label-matcher regex semantics: the pattern must match the ENTIRE
    value (Prometheus pkg/labels anchors matchers as ``^(?:re)$``; the
    reference does the same for LogQL label matchers,
    ``logql/parser_test.go:107`` and PromQL label matchers,
    ``chstorage/querier_metrics.go:189``).  Line filters and TraceQL
    ``=~`` stay unanchored substring matches and must NOT use this."""
    return c.rlike(f"^(?:{pattern})$")
