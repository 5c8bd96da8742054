"""Scale-adaptive SimHash near-dup pairs.

SCALING_r12 exposed the fixed 60-bit / 12-bit-band tier's ×64 point
(29s; earlier rounds' 5s cap had hidden it behind the slower sf0.1
point): with FIXED band width the random-collision candidate tail
grows ~5·N²/2^12 — the same fixed-precision physics adjudicated for
``ann_lsh_pairs`` in r11.  This gate certifies the production sizing
rule end-to-end: fingerprint width (and with it band width) steps
60→120 bits past 32k docs, chosen by the SAME count formula on the
Spark side and inside the DuckDB oracle (scalar-subquery CASE); the
60-bit tier's token hash is a PREFIX of the 120-bit tier's (md5 hex
chars 1-15, then 17-31), so both tiers replay exactly in SQL.  The
oracle is the BRUTE-FORCE pair join over the tier fingerprint —
banding is pigeonhole-exact, so banded Spark == brute SQL.

Registered in a tail module (imported last) so the driver registry's
static prefix is untouched.
"""

from __future__ import annotations

from ..operators.dedup import SIMHASH_TIER_ROWS, simhash_adaptive_pairs
from ..tables import load
from .registry import register

_ADAPTIVE_SIMHASH_ORACLE = f"""WITH nn AS (
  SELECT count(*) AS n FROM documents
),
toks AS (
  SELECT doc_id AS doc, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
hashed AS (
  SELECT doc,
         CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(tok), 17, 15) AS BIGINT) AS h2
  FROM toks
),
bits AS (
  SELECT doc, j,
         sum(CASE WHEN (h1 >> j) % 2 = 1 THEN 1 ELSE -1 END) AS v1,
         sum(CASE WHEN (h2 >> j) % 2 = 1 THEN 1 ELSE -1 END) AS v2
  FROM hashed CROSS JOIN (SELECT range AS j FROM range(0, 60, 1))
  GROUP BY doc, j
),
fps AS (
  SELECT doc,
         CAST(sum(CASE WHEN v1 > 0 THEN (CAST(1 AS BIGINT) << j)
                  ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN v2 > 0 THEN (CAST(1 AS BIGINT) << j)
                  ELSE 0 END) AS BIGINT) AS f2
  FROM bits GROUP BY doc
)
SELECT a.doc AS doc_a, b.doc AS doc_b,
       CAST(bit_count(xor(a.f1, b.f1))
            + CASE WHEN (SELECT n FROM nn) <= {SIMHASH_TIER_ROWS} THEN 0
                   ELSE bit_count(xor(a.f2, b.f2)) END AS BIGINT) AS hamming
FROM fps a JOIN fps b ON a.doc < b.doc
WHERE bit_count(xor(a.f1, b.f1))
      + CASE WHEN (SELECT n FROM nn) <= {SIMHASH_TIER_ROWS} THEN 0
             ELSE bit_count(xor(a.f2, b.f2)) END <= 4"""


@register("dedup_simhash_adaptive_pairs", _ADAPTIVE_SIMHASH_ORACLE)
def dedup_simhash_adaptive_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    return simhash_adaptive_pairs(docs, "doc_id", "text")
