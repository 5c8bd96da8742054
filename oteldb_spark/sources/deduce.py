"""Log-line deduction — the reference's ingest-time enrichment
(``logparser/deduce.go``) as Column expressions.

Raw collector lines rarely carry typed fields: severity arrives as
free text ("WARN", "w", "critical"), timestamps as integers of
unknown resolution, trace ids as hex strings inside a JSON body.
The reference deduces all three while consuming; here the same rules
run as codegen'd CASE/threshold expressions so enrichment stays
inside the scan stage:

* ``deduce_severity`` — text → OTel severity number
  (deduce.go:97-145: single-letter forms, the word table, one
  trim+lower normalization retry).
* ``deduce_nanos`` — integer timestamp → ns by magnitude thresholds
  against 2000-01-01 in each resolution (deduce.go:27-58).
* ``enrich_json_lines`` — lift level/ts/trace_id/span_id out of JSON
  bodies into typed columns when present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2000-01-01T00:00:00Z in each resolution (deduce.go deduceStart)
_START_S = 946_684_800
_START_MS = _START_S * 1_000
_START_US = _START_S * 1_000_000
_START_NS = _START_S * 1_000_000_000

_SEVERITY_WORDS = {
    "trace": 1,
    "debug": 5,
    "info": 9,
    "warn": 13,
    "warning": 13,
    "error": 17,
    "fatal": 21,
    "crit": 21,
    "critical": 21,
}
_SEVERITY_LETTERS = {"t": 1, "d": 5, "i": 9, "w": 13, "e": 17, "f": 21}


def deduce_severity(col: Column | str) -> Column:
    """OTel severity number from free-text level (0 = unspecified)."""
    raw = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.trim(raw))
    out = F.lit(0)
    for word, num in _SEVERITY_WORDS.items():
        out = F.when(norm == word, F.lit(num)).otherwise(out)
    letter = F.when(F.length(norm) == 1, norm).otherwise(F.lit(None))
    for ch, num in _SEVERITY_LETTERS.items():
        out = F.when(letter == ch, F.lit(num)).otherwise(out)
    return out.cast("int")


def deduce_nanos(col: Column | str) -> Column:
    """ns-epoch from an integer timestamp of unknown resolution; null
    when the magnitude is below every threshold (pre-2000 second
    counts are indistinguishable from garbage, like the reference)."""
    n = (F.col(col) if isinstance(col, str) else col).cast("long")
    return (
        F.when(n > _START_NS, n)
        .when(n > _START_US, n * 1_000)
        .when(n > _START_MS, n * 1_000_000)
        .when(n > _START_S, n * 1_000_000_000)
        .otherwise(F.lit(None))
    )


def enrich_json_lines(
    df: DataFrame, body_col: str = "body"
) -> DataFrame:
    """Lift level/ts/trace_id/span_id from JSON bodies into typed
    columns (null when the body lacks the field)."""
    b = F.col(body_col)
    return df.withColumns(
        {
            "deduced_severity": deduce_severity(
                F.coalesce(F.get_json_object(b, "$.level"), F.lit(""))
            ),
            "deduced_ts_ns": deduce_nanos(
                F.get_json_object(b, "$.ts").cast("long")
            ),
            "deduced_trace_id": F.lower(
                F.get_json_object(b, "$.trace_id")
            ),
            "deduced_span_id": F.lower(F.get_json_object(b, "$.span_id")),
        }
    )
