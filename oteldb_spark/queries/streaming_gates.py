"""Driver-gated STREAMING queries — run synchronously (availableNow
trigger over a staged file source) so the driver's DuckDB oracle can
value-match a Structured Streaming pipeline end-to-end, not just a
rows-only smoke check.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ..operators.dedup import MINHASH_ORACLE_CTES
from ..tables import load
from .registry import register


# Streaming MinHash-LSH near-dup candidates == the batch LSH pairs:
# the stream computes per-row signatures (bit-identical construction),
# routes through band-bucket state, and emits (earlier, later, agree)
# pairs; ordering matches doc_id because event times are doc_id-ordered.
@register(
    "stream_neardup_pairs",
    f"""WITH {MINHASH_ORACLE_CTES}
SELECT c.doc_a, c.doc_b,
       CAST(count(CASE WHEN sa.sig = sb.sig THEN 1 END) AS BIGINT) AS agree
FROM cand c
JOIN sigs sa ON sa.doc = c.doc_a
JOIN sigs sb ON sb.doc = c.doc_b AND sb.i = sa.i
GROUP BY c.doc_a, c.doc_b
HAVING count(CASE WHEN sa.sig = sb.sig THEN 1 END) >= 4""",
)
def stream_neardup_pairs(spark, sf_dir):
    from ..streaming.neardup import stream_near_dup_pairs

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (1_700_000_000_000 + F.col("doc_id") * 1000).alias("ts_ms"),
    )
    work = tempfile.mkdtemp(prefix="neardup_gate_")
    try:
        src = f"{work}/in"
        out_dir = f"{work}/out"
        ckpt = f"{work}/ckpt"
        docs.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            stream_near_dup_pairs(stream, threshold=4)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        pairs = (
            spark.read.parquet(out_dir)
            .select("doc_a", "doc_b", F.col("agree").cast("long").alias("agree"))
            .distinct()
        )
        # materialize before the temp dir disappears
        rows = pairs.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_a long, doc_b long, agree long")
