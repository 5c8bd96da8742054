"""Driver-gated asymmetric containment dedup
(operators/dedup.py:containment_prefix_join).

Catches what symmetric Jaccard misses: a document (near-)contained in
a much larger one — quotes, boilerplate, doc-in-concatenation — where
J = |A∩B|/|A∪B| shrinks with the big side but C = |A∩B|/|A| does
not.  tau=0.9 on word 3-shingles; the DuckDB oracle is the
brute-force inverted join restated with the same containment ratio.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import containment_prefix_join
from ..tables import load
from .registry import register

_TAU = 0.9


@register(
    "dedup_containment_pairs",
    f"""WITH shingled AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]))) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(count(*) AS DOUBLE) / any_value(sa.n), 6) AS containment
FROM shingled a
JOIN shingled b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
JOIN sizes sa ON sa.doc_id = a.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING CAST(count(*) AS DOUBLE) / any_value(sa.n) >= {_TAU!r}""",
)
def dedup_containment_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    shingles = F.array_distinct(
        F.expr(
            "CASE WHEN size(split(text,' ')) >= 3 THEN"
            " transform(sequence(0, size(split(text,' ')) - 3),"
            " i -> concat_ws(' ', split(text,' ')[i],"
            " split(text,' ')[i+1], split(text,' ')[i+2]))"
            " ELSE array() END"
        )
    )
    sh = docs.select(
        F.col("doc_id").alias("doc"), F.explode(shingles).alias("gram")
    )
    out = containment_prefix_join(sh, _TAU)
    return out.select(
        "doc_a", "doc_b", F.round("containment", 6).alias("containment")
    )
