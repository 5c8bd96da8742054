"""HyperLogLog distinct-count sketch (Flajolet et al. 2007), the
Spark-native analog of ClickHouse ``uniq``/``uniqHLL12`` the reference
leans on for series-count estimates.

Deterministic md5-derived 60-bit hashes (same construction as the
count-min gate) so a DuckDB oracle replays the EXACT register state
and estimate — the point of the gate is that the sketch math is
reproducible, not approximately close.

Scale shape: registers build map-side — groupBy(by..., bucket) is a
single shuffle of at most |by-groups|·m rows regardless of input
size; merging shards/partials is a max() per register, which is why
HLL is THE 100 TB distinct-count structure.  The estimate folds
registers with an EXACT integer sum (terms 2^(53-rank) ≤ 2^52, m=256
of them fit bigint), so reassociation across partitions cannot wobble
the float result; the only float ops are the final constant divide
and the small-range ln() correction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 256  # 2^8 buckets
_HASH_BITS = 52  # 60-bit md5 prefix minus 8 bucket bits
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _h60(key_sql: str) -> str:
    """60-bit integer from the md5 hex prefix (15 nibbles)."""
    return f"cast(conv(substr(md5(cast({key_sql} as string)), 1, 15), 16, 10) as bigint)"


def hll_registers(df: DataFrame, key: str, by: list[str]) -> DataFrame:
    """(by..., bucket, rank): max leading-rank per bucket.

    rank = position of the leftmost 1-bit of the 52-bit remainder,
    counted from the left (1-based); an all-zero remainder ranks 53.
    ``length(bin(w))`` is the bit length of w — integer-exact on both
    engines (no float log2 edge cases).
    """
    h = F.expr(_h60(key))
    bucket = (h % M).alias("bucket")
    w = F.expr(f"{_h60(key)} div {M}")  # 52-bit remainder (integer div)
    rank = (
        F.when(w == 0, F.lit(_HASH_BITS + 1))
        .otherwise(F.lit(_HASH_BITS + 1) - F.length(F.expr(f"bin({_h60(key)} div {M})")))
        .cast("int")
        .alias("rank")
    )
    return (
        df.select(*by, bucket, rank)
        .groupBy(*by, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(registers: DataFrame, by: list[str]) -> DataFrame:
    """Fold registers → (by..., est).

    Exact-integer harmonic sum: S = Σ_j 2^(53 - r_j) over all m
    buckets (absent buckets rank 0 → term 2^53 each), so
    Σ 2^-r = S / 2^53.  Small-range correction (E ≤ 2.5m with empty
    buckets → linear counting m·ln(m/V)) per the HLL paper.
    """
    two53 = float(2 ** (_HASH_BITS + 1))
    g = registers.groupBy(*by).agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(_HASH_BITS + 1) - F.col("rank")).cast("long")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    # absent buckets contribute 2^53 each and count as empty registers
    s = F.col("s_present") + (F.lit(M) - F.col("n_present")) * F.lit(
        2 ** (_HASH_BITS + 1)
    )
    v = F.lit(M) - F.col("n_present")  # rank-0 (empty) registers
    raw = F.lit(_ALPHA * M * M) / (s.cast("double") / F.lit(two53))
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (v > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / v.cast("double")),
    ).otherwise(raw)
    return g.select(*by, F.round(est, 6).alias("est"))


def hll_oracle_sql(source: str, key_sql: str, by_sql: list[str]) -> tuple[str, str]:
    """(registers_sql, estimate_sql) replaying the same math in DuckDB."""
    by = ", ".join(by_sql)
    h = f"CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15) AS BIGINT)"
    regs = f"""SELECT {by}, {h} % {M} AS bucket,
       CAST(max(CASE WHEN {h} // {M} = 0 THEN {_HASH_BITS + 1}
                ELSE {_HASH_BITS + 1} - length(bin({h} // {M})) END) AS INT) AS rank
FROM {source} GROUP BY {by}, {h} % {M}"""
    est = f"""WITH regs AS ({regs}),
folded AS (
  SELECT {by},
         sum(CAST(2 ** ({_HASH_BITS + 1} - rank) AS BIGINT)) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY {by}
)
SELECT {by},
       round(CASE WHEN {_ALPHA * M * M!r} / ((s_present + ({M} - n_present) * {2 ** (_HASH_BITS + 1)}) / {float(2 ** (_HASH_BITS + 1))!r}) <= {2.5 * M!r}
                   AND ({M} - n_present) > 0
             THEN {float(M)!r} * ln({float(M)!r} / ({M} - n_present))
             ELSE {_ALPHA * M * M!r} / ((s_present + ({M} - n_present) * {2 ** (_HASH_BITS + 1)}) / {float(2 ** (_HASH_BITS + 1))!r})
             END, 6) AS est
FROM folded"""
    return regs, est
