"""Collector line-format parsers — klog and zap-development — as
Column expressions (reference ``logparser/klog.go`` /
``zap_development.go``; json and logfmt live in the LogQL stages).

Both parse entirely with regexp_extract / split (codegen'd); the
output struct mirrors the reference's Record fields (ns timestamp,
severity number, body, source attrs).

klog:  ``I0513 12:34:56.789012 3492 file.go:123] message``
       (severity letter, month-day time without year — the caller
       supplies the year like the reference does with observed time)
zapdev: ``2021-05-13T12:34:56.789Z<TAB>INFO<TAB>logger<TAB>message``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .deduce import deduce_severity

_KLOG_RE = (
    r"^([IWEFD])(\d{2})(\d{2}) (\d{2}:\d{2}:\d{2}\.\d{1,6})"
    r"\s+(\d+)\s+([^\]\s]+)\]\s?(.*)$"
)

_KLOG_SEV = {"D": 5, "I": 9, "W": 13, "E": 17, "F": 21}


def parse_klog(col: Column | str, year: int) -> Column:
    """Struct(ts_ns, severity_number, thread_id, source, body) from a
    klog line; null when the line is not klog-shaped."""
    s = F.col(col) if isinstance(col, str) else col

    def grp(i: int) -> Column:
        return F.regexp_extract(s, _KLOG_RE, i)

    level = grp(1)
    sev = F.lit(0)
    for ch, num in _KLOG_SEV.items():
        sev = F.when(level == ch, F.lit(num)).otherwise(sev)
    ts = F.to_timestamp(
        F.concat(
            F.lit(f"{year}-"), grp(2), F.lit("-"), grp(3), F.lit(" "), grp(4)
        ),
        "yyyy-MM-dd HH:mm:ss.SSSSSS",
    )
    out = F.struct(
        F.unix_micros(ts).alias("ts_us"),
        sev.cast("int").alias("severity_number"),
        grp(5).cast("long").alias("thread_id"),
        grp(6).alias("source"),
        grp(7).alias("body"),
    )
    return F.when(level != "", out)


_ZAP_SEV_WORDS = {"dpanic": 21, "panic": 21}


def parse_zapdev(col: Column | str) -> Column:
    """Struct(ts_us, severity_number, logger, body) from a zap
    development-mode line; null when not tab-separated as expected."""
    s = F.col(col) if isinstance(col, str) else col
    parts = F.split(s, "\t")
    ts = F.to_timestamp(
        F.element_at(parts, 1), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
    )
    lvl = F.lower(F.element_at(parts, 2))
    sev = deduce_severity(lvl)
    for word, num in _ZAP_SEV_WORDS.items():
        sev = F.when(lvl == word, F.lit(num)).otherwise(sev)
    out = F.struct(
        F.unix_micros(ts).alias("ts_us"),
        sev.cast("int").alias("severity_number"),
        F.element_at(parts, 3).alias("logger"),
        F.element_at(parts, 4).alias("body"),
    )
    return F.when(
        (F.size(parts) >= 4) & ts.isNotNull() & (sev > 0), out
    )


def parse_lines(
    df: DataFrame, body_col: str = "body", year: int = 2024,
    barrier: bool = False,
) -> DataFrame:
    """Format auto-detection like the reference's registry: try klog,
    then zapdev, normalized to a common struct (ts_us,
    severity_number, origin, body); unmatched lines stay null.

    ``barrier=True`` routes the struct through an expression barrier
    so each downstream field mention reads a plain attribute instead
    of re-running the whole two-format parse.  The r9 A/B that graded
    the barrier a net loss (0.76 -> 2.40 s) was measured through a
    ``.count()`` consumer, which never evaluates the projection AT
    ALL; under a value-materializing consumer (the driver collects,
    the noop-sink audit writes) the unbarriered form pays one full
    auto-detect parse PER FIELD MENTION and project-collapse drags
    all of them below any repartition into the one-file scan stage
    (re-measured r10: 9.1 s unbarriered vs 2.8 s barriered+spread for
    the three-field gate projection, best-of-2 noop sink at sf0.1)."""
    klog = parse_klog(body_col, year)
    zap = parse_zapdev(body_col)

    def norm(st: Column, origin: str) -> Column:
        return F.when(
            st.isNotNull(),
            F.struct(
                st["ts_us"].alias("ts_us"),
                st["severity_number"].alias("severity_number"),
                st[origin].alias("origin"),
                st["body"].alias("body"),
            ),
        )

    parsed = F.coalesce(norm(klog, "source"), norm(zap, "logger"))
    if barrier:
        from ..functions.parsers import barrier_cols

        return barrier_cols(df, {"parsed": parsed})
    return df.withColumn("parsed", parsed)
