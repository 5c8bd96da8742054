"""Deterministic Bloom filter for membership pre-filtering (Bloom
1970; the production shape of Spark's own runtime bloom-filter join
pruning, expressed portably so a DuckDB oracle replays the EXACT
bitmap and therefore the exact false-positive set).

Why this exists next to the exact broadcast-join decontamination
(queries/pipeline2.py): at 100 TB the eval-gram set may itself be
millions of rows — too big to broadcast as a join hash table but
trivially representable as a FIXED-SIZE bitmap (2^16 bits = 8 KB
here; 2^30 bits = 128 MB covers billions of grams at ~1% FP).  The
filter side then tests k bit positions per gram in pure codegen —
no join, no shuffle, no per-row Python.

Portability: position i of key g is
``int64(md5(g || '#' || i)[:15 hex]) % M_BITS`` — the same
md5-prefix construction every other sketch in this repo uses.  The
bitmap packs positions into 32-bit words (``pos // 32``,
``1 << (pos % 32)``) because DuckDB raises on ``1 << 63`` while
32-bit masks stay comfortably inside BIGINT on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 16  # bitmap size in bits (8 KB)
K_HASH = 2  # hash functions
WORD = 32  # bits per packed word
N_WORDS = M_BITS // WORD


def _pos_sql(key_sql: str, i: int) -> str:
    """Position of hash ``i`` — identical text works in Spark/DuckDB
    apart from the hex-to-int idiom, so each engine gets its own."""
    return (
        f"cast(conv(substr(md5(concat({key_sql}, '#', '{i}')), 1, 15),"
        f" 16, 10) as bigint) % {M_BITS}"
    )


def _pos_duck(key_sql: str, i: int) -> str:
    return (
        f"CAST('0x' || substr(md5({key_sql} || '#' || '{i}'), 1, 15)"
        f" AS BIGINT) % {M_BITS}"
    )


def bloom_build(keys: DataFrame, key_col: str) -> list[int]:
    """Fold a key DataFrame into the bitmap's packed words.

    Returns a dense list of N_WORDS ints (driver-side).  The
    aggregation is distributed — per-partition partial ``bit_or`` per
    word, one shuffle of at most N_WORDS * parallelism rows — and the
    collect is BOUNDED at N_WORDS rows (2048 here) regardless of
    input size: this is sketch extraction, not data collection.
    """
    pos = keys.select(
        F.explode(
            F.array(
                *[F.expr(_pos_sql(key_col, i)) for i in range(K_HASH)]
            )
        ).alias("pos")
    ).filter(F.col("pos").isNotNull())  # NULL keys hash to NULL — skip
    words = (
        pos.withColumn("w", (F.col("pos") / WORD).cast("int"))
        .withColumn(
            "mask",
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {WORD} as int))"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    bitmap = [0] * N_WORDS
    for r in words:
        bitmap[r.w] = r.mask
    return bitmap


def bloom_contains(bitmap: list[int], key_sql: str) -> F.Column:
    """Codegen membership test against a plan-literal bitmap: all K
    bit positions set.  The bitmap rides the plan as a literal array
    (at cluster scale: a broadcast variable feeding the same
    expression) — the probe side never joins or shuffles."""
    arr = f"array({', '.join(f'{w}L' for w in bitmap)})"
    checks = []
    for i in range(K_HASH):
        p = _pos_sql(key_sql, i)
        checks.append(
            f"(element_at({arr}, cast(({p}) div {WORD} as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(({p}) % {WORD} as int))) != 0"
        )
    return F.expr(" AND ".join(checks))


def bloom_oracle_ctes(eval_keys_sql: str) -> str:
    """DuckDB CTEs: ``bloom(w, mask)`` replaying the exact bitmap from
    an eval-key relation (SELECT producing column ``gram``)."""
    pos_union = " UNION ALL ".join(
        f"SELECT {_pos_duck('gram', i)} AS pos FROM ek" for i in range(K_HASH)
    )
    return f"""ek AS ({eval_keys_sql}),
epos AS ({pos_union}),
bloom AS (
  SELECT pos // {WORD} AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {WORD} AS INT)) AS mask
  FROM epos GROUP BY pos // {WORD}
)"""


def bloom_oracle_member(key_sql: str) -> str:
    """DuckDB boolean expression: ``key_sql`` passes the bloom (all K
    positions set), via scalar subqueries against the bloom CTE."""
    tests = []
    for i in range(K_HASH):
        p = _pos_duck(key_sql, i)
        tests.append(
            f"coalesce((SELECT (b.mask & (CAST(1 AS BIGINT) <<"
            f" CAST(({p}) % {WORD} AS INT))) != 0 FROM bloom b"
            f" WHERE b.w = ({p}) // {WORD}), FALSE)"
        )
    return "(" + " AND ".join(tests) + ")"
