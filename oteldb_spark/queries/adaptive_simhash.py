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

from ..operators.dedup import SIMHASH_ADAPTIVE_ORACLE, simhash_adaptive_pairs
from ..tables import load
from .registry import register


@register("dedup_simhash_adaptive_pairs", SIMHASH_ADAPTIVE_ORACLE)
def dedup_simhash_adaptive_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    return simhash_adaptive_pairs(docs, "doc_id", "text")
