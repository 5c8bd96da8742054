"""pprof protobuf ingest gate.

Fixture Profile protos are built per event_type from the events table
(3-level stacks main > etype > leaf-(user_id%3), value = integer
cents), decoded by the REAL wire path
(``sources/pprof.py::pprof_samples`` — executor-side protobuf walk +
string-table/location/function resolution) and folded into flamegraph
nodes.  The DuckDB oracle recreates the per-prefix self/total sums
straight from events.

Reference: ``internal/profilestorage/flametree.go:8-26`` (merged
tree), ``profileqlengine/engine.go:75-127`` (merge fold).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources import pprof
from ..tables import load
from .registry import register

_LIMIT = 400


def _payloads(spark, sf_dir) -> list[bytes]:
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < _LIMIT)
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r.event_id):
        by_type.setdefault(r.event_type, []).append(r)
    payloads = []
    for etype, rs in sorted(by_type.items()):
        stacks = [
            (
                ["main", etype, f"leaf-{int(r.user_id) % 3}"],
                int(round(r.value * 100)),
            )
            for r in rs
        ]
        payloads.append(
            pprof.encode_profile(stacks, sample_type=("cpu", "nanoseconds"))
        )
    return payloads


_ORACLE = f"""WITH e AS (
  SELECT event_type AS etype, user_id % 3 AS k,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE event_id < {_LIMIT}
)
SELECT 'main' AS stack, CAST(0 AS BIGINT) AS self,
       CAST(sum(v) AS BIGINT) AS total, CAST(1 AS INTEGER) AS depth
FROM e
UNION ALL
SELECT 'main>' || etype, CAST(0 AS BIGINT), CAST(sum(v) AS BIGINT),
       CAST(2 AS INTEGER)
FROM e GROUP BY etype
UNION ALL
SELECT 'main>' || etype || '>leaf-' || k, CAST(sum(v) AS BIGINT),
       CAST(sum(v) AS BIGINT), CAST(3 AS INTEGER)
FROM e GROUP BY etype, k"""


@register("profile_pprof_ingest", _ORACLE)
def profile_pprof_ingest(spark, sf_dir):
    from ..sources.payloads import payload_frame

    # Arrow-built local frame: one JVM partition per payload, no
    # Python-pickle scan and no repartition Exchange (sources/payloads.py)
    df = payload_frame(spark, _payloads(spark, sf_dir))
    samples = pprof.pprof_samples(df)
    return pprof.flame_nodes(samples).select("stack", "self", "total", "depth")
