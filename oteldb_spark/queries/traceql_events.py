"""TraceQL event./link./parent. scopes and colon intrinsics — gated
through the full parse → compile path.

Semantics per the reference evaluator
(``traceql/traceqlengine/evaluater.go:562-669``): ``event.x`` /
``link.x`` read the attribute from the FIRST event/link that has it;
``event:name`` is the first non-empty event name;
``event:timeSinceStart`` the first non-zero offset from span start;
``link:traceID``/``link:spanID`` the first non-empty link ids.
``parent.x`` (a TODO/501 in the reference — this exceeds it) resolves
span properties on the parent via one per-trace self-join.

The synthetic events/links live on ``signals.spans_events_frame``;
oracles recompute from the base tables directly (child spans map 1:1
to lineitem rows), so a wrong first-match or join would hash-mismatch.
"""

from __future__ import annotations

from ..signals import spans_events_frame, with_ctes
from ..traceql import SpanSource, compile_traceql
from .registry import register

_ALL = "trace_id, span_id, parent_span_id, service, name, kind, start_us, duration_us, status_code"

# child spans with the lineitem columns the events/links derive from
_ESPANS_CTE = """espans AS (
  SELECT l_orderkey AS trace_id,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice,
                    l_quantity) AS span_id,
         0 AS parent_span_id,
         'svc-' || (l_suppkey % 4) AS service,
         'line-' || l_returnflag AS name,
         3 AS kind,
         epoch_us(l_shipdate) AS start_us,
         CAST(floor(l_extendedprice) AS BIGINT) AS duration_us,
         CASE WHEN l_returnflag = 'R' THEN 2 ELSE 0 END AS status_code,
         l_linestatus AS mode,
         CAST(floor(l_discount * 100) AS BIGINT) AS disc
  FROM lineitem
)"""


def _source(spark, sf_dir) -> SpanSource:
    return SpanSource(
        df=spans_events_frame(spark, sf_dir),
        attr_cols={"service": "service", "service.name": "service"},
        events_col="events",
        links_col="links",
    )


def _run(q: str):
    def fn(spark, sf_dir):
        out = compile_traceql(q, _source(spark, sf_dir))
        return out.select(*[c.strip() for c in _ALL.split(",")])

    return fn


# { event.mode = "F" && duration > 50ms } — first event carrying
# 'mode' is the ship event (linestatus); the receipt event's
# 'F-r' value must NOT win
register(
    "tql_parsed_event_attr",
    with_ctes(
        _ESPANS_CTE,
        body=f"""SELECT {_ALL} FROM espans
WHERE mode = 'F' AND duration_us > 50000""",
    ),
)(_run('{ event.mode = "F" && duration > 50ms }'))


# { event.disc = "8" && status = error } — only the second (receipt)
# event has 'disc': first-event-that-has-it must skip the ship event
register(
    "tql_parsed_event_attr_second",
    with_ctes(
        _ESPANS_CTE,
        body=f"""SELECT {_ALL} FROM espans
WHERE disc = 8 AND status_code = 2""",
    ),
)(_run('{ event.disc = "8" && status = error }'))


# { event:name = "ship" && event:timeSinceStart < 2ms && kind = client }
# — intrinsics: first non-empty name, first non-zero start offset
# (ship is +1ms on every child span)
register(
    "tql_parsed_event_intrinsic",
    with_ctes(
        _ESPANS_CTE,
        body=f"SELECT {_ALL} FROM espans",
    ),
)(_run('{ event:name = "ship" && event:timeSinceStart < 2ms && kind = client }'))


# { link.rel = "parent" && link:spanID = 0 && name = "line-R" } —
# link attribute + link intrinsic
register(
    "tql_parsed_link_scope",
    with_ctes(
        _ESPANS_CTE,
        body=f"""SELECT {_ALL} FROM espans WHERE name = 'line-R'""",
    ),
)(_run('{ link.rel = "parent" && link:spanID = 0 && name = "line-R" }'))


# { link:traceID = trace:id && status = error } — the synthetic link
# points at its own trace root, so the equality holds for all children
register(
    "tql_parsed_link_traceid",
    with_ctes(
        _ESPANS_CTE,
        body=f"""SELECT {_ALL} FROM espans WHERE status_code = 2""",
    ),
)(_run("{ link:traceID = trace:id && status = error }"))


# { parent.name = "order-1-URGENT" && duration > 50ms } — parent-span
# attribute via the per-trace self-join (reference 501s this)
register(
    "tql_parsed_parent_scope",
    with_ctes(
        _ESPANS_CTE,
        body=f"""SELECT {", ".join("c." + c.strip() for c in _ALL.split(","))}
FROM espans c JOIN orders o ON o.o_orderkey = c.trace_id
WHERE o.o_orderpriority = '1-URGENT' AND c.duration_us > 50000""",
    ),
)(_run('{ parent.name = "order-1-URGENT" && duration > 50ms }'))


# { parent.duration > 4s && status = error } — numeric parent
# intrinsic through the same join
register(
    "tql_parsed_parent_duration",
    with_ctes(
        _ESPANS_CTE,
        body=f"""SELECT {", ".join("c." + c.strip() for c in _ALL.split(","))}
FROM espans c JOIN orders o ON o.o_orderkey = c.trace_id
WHERE floor(o.o_totalprice * 10) > 4000000 AND c.status_code = 2""",
    ),
)(_run("{ parent.duration > 4s && status = error }"))


# | by(span.service) | count() >= 3 — group spansets per (trace,
# service) and keep groups with at least 3 spans.  The reference
# parses by() but 501s execution (traceqlengine/pipeline.go:78);
# this exceeds it, like TraceQL metrics.
register(
    "tql_parsed_by_group",
    with_ctes(
        _ESPANS_CTE,
        """big AS (
  SELECT trace_id, service FROM espans
  GROUP BY trace_id, service HAVING count(*) >= 3
)""",
        body=f"""SELECT {", ".join("s." + c.strip() for c in _ALL.split(","))}
FROM espans s JOIN big
  ON s.trace_id = big.trace_id AND s.service = big.service""",
    ),
)(_run("{ } | by(span.service) | count() >= 3"))


# by() groups feed the scalar filter, coalesce() merges the trace's
# surviving spansets back, and a second count() applies per trace
register(
    "tql_parsed_by_coalesce",
    with_ctes(
        _ESPANS_CTE,
        """grp AS (
  SELECT trace_id, service FROM espans
  WHERE duration_us > 20000
  GROUP BY trace_id, service HAVING count(*) >= 2
)""",
        """kept AS (
  SELECT s.* FROM espans s JOIN grp
    ON s.trace_id = grp.trace_id AND s.service = grp.service
  WHERE s.duration_us > 20000
)""",
        body=f"""SELECT {_ALL} FROM kept s
WHERE trace_id IN (
  SELECT trace_id FROM kept GROUP BY trace_id HAVING count(*) > 4)""",
    ),
)(
    _run(
        "{ duration > 20ms } | by(span.service) | count() >= 2"
        " | coalesce() | count() > 4"
    )
)


# event-scope autocomplete: distinct event names / attr keys / values
# with counts (SearchTagValues extended to the event scope, which the
# reference's autocomplete does not reach)
@register(
    "tql_event_tag_values",
    with_ctes(
        _ESPANS_CTE,
        body="""SELECT event_name, attr_key, attr_value,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT 'ship' AS event_name, 'mode' AS attr_key, mode AS attr_value
  FROM espans
  UNION ALL
  SELECT 'receipt', 'mode', mode || '-r' FROM espans
  UNION ALL
  SELECT 'receipt', 'disc', CAST(disc AS VARCHAR) FROM espans
)
GROUP BY event_name, attr_key, attr_value""",
    ),
)
def tql_event_tag_values(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..signals import spans_events_frame

    spans = spans_events_frame(spark, sf_dir)
    ev = spans.select(F.explode("events").alias("e")).select(
        F.col("e.name").alias("event_name"), F.explode("e.attrs")
    )
    return ev.groupBy(
        "event_name",
        F.col("key").alias("attr_key"),
        F.col("value").alias("attr_value"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
