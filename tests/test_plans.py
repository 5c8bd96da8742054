"""Physical-plan regression tests — scale properties asserted, not
eyeballed: pushdown reaches the scan, projection prunes columns,
small dimensions broadcast, fan-out aggregation is a single shuffle.
"""

from __future__ import annotations

from oteldb_spark.plans.audit import audit
from oteldb_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_tpch_q1_pushdown_and_pruning(spark):
    facts = audit(QUERIES["tpch_q1"](spark, SF))
    assert any("l_shipdate" in p for p in facts.pushed_filters)
    # projection pruned: no orderkey/suppkey etc in the scan
    assert all("l_orderkey" not in s for s in facts.read_schemas)


def test_revenue_by_nation_broadcasts(spark):
    facts = audit(QUERIES["tpch_revenue_by_nation"](spark, SF))
    assert facts.n_broadcasts >= 1
    # only the needed columns are read from orders
    assert any(s.startswith("struct<o_custkey") for s in facts.read_schemas)


def test_count_over_time_single_shuffle(spark):
    facts = audit(QUERIES["logql_count_over_time"](spark, SF))
    # fanout is a narrow generate; the groupBy is the only shuffle
    # (plan may show the AQE read twice; assert the cap, not exact)
    assert facts.n_exchanges <= 2
    # events scan pruned to the columns the labels derive from
    assert all("props" not in s for s in facts.read_schemas)


def test_selector_prunes_columns(spark):
    facts = audit(QUERIES["logql_selector"](spark, SF))
    assert all("value" not in s for s in facts.read_schemas)


def test_langid_broadcasts_profiles(spark):
    # the per-language trigram profiles are tiny (langs × top-N) and
    # must broadcast — a shuffle join on trigram would move the whole
    # exploded corpus twice
    facts = audit(QUERIES["text_langid_trigram"](spark, SF))
    assert facts.n_broadcasts >= 1


def test_balanced_sample_broadcasts_target(spark):
    # the single-row min-count target joins by broadcast, never a
    # shuffled cross join
    facts = audit(QUERIES["docs_balanced_sample"](spark, SF))
    assert facts.n_broadcasts >= 1


def test_weighted_sample_is_partial_topk(spark):
    # global top-K must compile to TakeOrderedAndProject (per-partition
    # heads merged on the driver), not a full sort materialization
    df = QUERIES["docs_weighted_sample"](spark, SF)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in text


def test_hll_registers_single_shuffle(spark):
    # register build = one groupBy(by, bucket) with map-side partials;
    # no extra exchange beyond the (possibly AQE-doubled) aggregation
    facts = audit(QUERIES["sketch_hll_registers"](spark, SF))
    assert facts.n_exchanges <= 2


def test_pii_redact_no_shuffle(spark):
    # pure per-row column work: zero exchanges, scan prunes to the
    # two columns used
    facts = audit(QUERIES["pii_redact"](spark, SF))
    assert facts.n_exchanges == 0
    assert all("lang" not in s for s in facts.read_schemas)


def test_sanitized_promql_matcher_stays_compile_time(spark):
    # a sanitized-spelling matcher resolves at COMPILE time to a plain
    # column predicate — the translation surface adds no runtime
    # machinery: same exchange count as the direct-spelling gate, and
    # the events scan stays pruned to the derivation columns
    facts = audit(
        QUERIES["otel_label_promql_sanitized_matcher"](spark, SF)
    )
    assert facts.n_exchanges <= 4
    assert all("props" not in s for s in facts.read_schemas)


def test_ratio2880_sliding_no_fanout(spark):
    """24h/30s (ratio 2880) must take the sliding bucket-merge: a
    Window merge over a dense bucket spine, NO explode fan-out (which
    would replicate input ×2880), spine side broadcast, and the events
    scan pruned to the derivation columns."""
    df = QUERIES["logql_count_over_time_ratio2880"](spark, SF)
    facts = audit(df)
    assert "Window" in facts.text
    assert "Generate" not in facts.text  # no explode fan-out anywhere
    assert facts.n_broadcasts >= 1  # dense spine join is broadcast
    assert all("props" not in s for s in facts.read_schemas)


def test_sliding_merge_matches_fanout(spark):
    """Property parity on a synthetic stream: the sliding bucket-merge
    equals the naive row fan-out for every decomposable op, including
    lookback samples before start and empty-window gaps."""
    import random

    from pyspark.sql import functions as F

    from oteldb_spark.operators.range_agg import (
        DECOMPOSABLE,
        range_aggregate,
        range_aggregate_sliding,
    )

    rng = random.Random(42)
    start, end, step, rng_us = 1_000_000_000, 1_060_000_000, 1_000_000, 12_000_000
    rows = [
        (
            rng.choice(["a", "b", "c"]),
            start - rng_us + rng.randrange((end - start) + rng_us + step),
            float(rng.randrange(100)),
        )
        for _ in range(300)
    ]
    # bursty: leave a hole so some windows are empty for one series
    rows = [r for r in rows if not (r[0] == "c" and r[1] > start + 20_000_000)]
    df = spark.createDataFrame(rows, "svc string, ts_us long, sample double")
    for op in DECOMPOSABLE:
        naive = {
            (r.svc, r.step_us): r.value
            for r in range_aggregate(
                df,
                op,
                start_us=start,
                end_us=end,
                step_us=step,
                range_us=rng_us,
                by=["svc"],
            ).collect()
        }
        sliding = {
            (r.svc, r.step_us): r.value
            for r in range_aggregate_sliding(
                df,
                op,
                start_us=start,
                end_us=end,
                step_us=step,
                range_us=rng_us,
                by=["svc"],
            ).collect()
        }
        assert sliding == naive, op


def test_sliding_max_spine_boundary(spark):
    """Route selection straddling SLIDING_MAX_SPINE: ratio + n_steps
    exactly AT the bound takes the sliding merge (Window, no explode);
    one step past it bails to the fan-out (Generate).  Both routes
    collected and compared against an independent Python evaluation of
    the same windows — route flip must not change values."""
    from pyspark.sql import functions as F  # noqa: F401 (plan imports)

    from oteldb_spark.operators.range_agg import (
        SLIDING_MAX_SPINE,
        SLIDING_MIN_RATIO,
        range_aggregate,
    )

    step = 1_000_000
    ratio = SLIDING_MIN_RATIO  # smallest frame the sliding route takes
    start = 1_000_000_000_000
    rng_us = ratio * step
    rows = [
        ("a", start + i * 700_000, float(i % 9)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "svc string, ts_us long, sample double")

    def run(n_steps):
        out = range_aggregate(
            df,
            "count_over_time",
            start_us=start,
            end_us=start + n_steps * step,
            step_us=step,
            range_us=rng_us,
            by=["svc"],
        )
        return out, {(r.svc, r.step_us): r.value for r in out.collect()}

    def expected(n_steps):
        exp = {}
        for k in range(n_steps + 1):
            t = start + k * step
            n = sum(1 for _, ts, _ in rows if t - rng_us < ts <= t)
            if n:
                exp[("a", t)] = float(n)
        return exp

    under_steps = SLIDING_MAX_SPINE - ratio  # ratio + n_steps == bound
    over_steps = under_steps + 1  # one past: fan-out
    under_df, under_vals = run(under_steps)
    over_df, over_vals = run(over_steps)
    under_plan = audit(under_df).text
    over_plan = audit(over_df).text
    assert "Window" in under_plan and "Generate" not in under_plan
    assert "Generate" in over_plan
    assert under_vals == expected(under_steps)
    assert over_vals == expected(over_steps)
    # the extra step at the end is empty, so the two routes evaluated
    # identical windows — values must agree exactly across the flip
    assert under_vals == over_vals


def test_traceql_descendant_nested_no_iteration(spark):
    """`>>`: the gate (coords_key) self-promotes to the bucketed
    coords store, so its query plan has ZERO Python stages — the DFS
    was paid once at promotion — and no per-depth frontier loop (whose
    checkpointed rounds would show up as ExistingRDD scans) or
    cartesian product.  The plain per-query nested route (no
    coords_key) still pays exactly ONE Arrow-batched DFS stage."""
    df = QUERIES["traceql_descendant"](spark, SF)
    facts = audit(df)
    assert "InPandas" not in facts.text  # store route: no query Python
    assert "ExistingRDD" not in facts.text  # no checkpointed loop state
    assert "CartesianProduct" not in facts.text
    assert "BroadcastNestedLoop" not in facts.text

    from pyspark.sql import functions as F

    from oteldb_spark.operators.structural import descendants
    from oteldb_spark.signals import spans_frame

    nested = descendants(
        spans_frame(spark, SF),
        (F.col("service") == "frontend") & (F.col("status_code") == 2),
        F.col("duration_us") > 100000,
    )
    nfacts = audit(nested)
    assert "FlatMapGroupsInPandas" in nfacts.text
    assert "ExistingRDD" not in nfacts.text
    assert "CartesianProduct" not in nfacts.text


def test_jaccard_prefix_no_cartesian(spark):
    """The prefix join must stay an equi-join on gram (plus residual
    filters) — no cartesian/nested-loop anywhere, scan pruned to
    doc_id+text."""
    df = QUERIES["dedup_jaccard_prefix"](spark, SF)
    facts = audit(df)
    assert "CartesianProduct" not in facts.text
    assert "BroadcastNestedLoop" not in facts.text
    assert all("lang" not in s for s in facts.read_schemas)


def test_semantic_dedup_broadcasts_centroids(spark):
    """SemDeDup: centroid assignment broadcasts the 8-row centroid
    side; the within-cell pair join is an equi-join on cid."""
    df = QUERIES["dedup_semantic_survivors"](spark, SF)
    facts = audit(df)
    assert facts.n_broadcasts >= 1
    assert "CartesianProduct" not in facts.text


def test_stored_descendant_zero_python_zero_exchange(spark):
    """`>>` over the ingest-time-coords bucketed table: the plan must
    contain NO Python stage (the DFS was paid at write time) and, with
    the broadcast path disabled to make the assertion about layout,
    NO Exchange — both semi-join sides read the table already
    co-partitioned by trace_id."""
    from pyspark.sql import functions as F

    from oteldb_spark.operators.structural import descendants_stored
    from oteldb_spark.queries.structural_stored import stored_spans

    t = stored_spans(spark, SF)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = descendants_stored(
            t,
            (F.col("service") == "frontend") & (F.col("status_code") == 2),
            F.col("duration_us") > 100000,
        )
        facts = audit(out)
        assert "FlatMapGroupsInPandas" not in facts.text
        assert "InPandas" not in facts.text  # no Python stage of any kind
        assert facts.n_exchanges == 0, facts.text
        assert out.count() > 0
        # the full front-end over the same table routes identically
        full = QUERIES["tql_parsed_stored_descendant"](spark, SF)
        ffacts = audit(full)
        assert "InPandas" not in ffacts.text
        assert ffacts.n_exchanges == 0, ffacts.text
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_search_facade_stored_plan(spark):
    """The FULL HTTP-shaped path — TraceQLEngine.search_frame over the
    materialized coords store — plans zero-Python / zero-Exchange:
    the compile routes `>>` to the stored range semi-join, and the
    trace-assembly semi-join + groupBy both key on trace_id, the
    bucketing key.  This is the production-deployment plan a 100 TB
    span store serves /api/search from."""
    from oteldb_spark.engine import TraceQLEngine
    from oteldb_spark.queries.structural_stored import stored_spans
    from oteldb_spark.traceql import SpanSource

    src = SpanSource(
        df=stored_spans(spark, SF),
        attr_cols={"service": "service", "service.name": "service"},
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        frame = TraceQLEngine(source=src).search_frame(
            '{ resource.service.name = "frontend" && status = error }'
            " >> { duration > 100ms }",
            limit=None,
        )
        facts = audit(frame)
        assert "InPandas" not in facts.text
        assert facts.n_exchanges == 0, facts.text
        assert frame.count() > 0
        # the serializer half of the facade: bounded search() returns
        # Tempo TraceSearchMetadata over the same store
        resp = TraceQLEngine(source=src).search(
            '{ resource.service.name = "frontend" && status = error }'
            " >> { duration > 100ms }",
            limit=5,
        )
        assert len(resp["traces"]) == 5
        for t in resp["traces"]:
            assert set(t) == {
                "traceID", "rootServiceName", "rootTraceName",
                "startTimeUnixNano", "durationMs",
            }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_stream_store_query_plan(spark):
    """The query half of the streaming→store loop: joining the span
    table to a (fixture) coords store and routing `>>` through
    descendants() must NOT introduce a Python stage — the coords come
    from storage, the range semi-join runs on columns."""
    from pyspark.sql import functions as F

    from oteldb_spark.operators.structural import descendants, trace_coords
    from oteldb_spark.signals import spans_frame

    spans = spans_frame(spark, SF).filter(F.col("trace_id") < 100)
    # stand-in for the stream-populated table: materialized coords rows
    coords = trace_coords(spans, with_parent=True)
    coords = spark.createDataFrame(
        coords.collect(), schema=coords.schema
    )  # severs the Python lineage, like reading the store back
    stored = spans.join(
        coords.select("trace_id", "span_id", "ns_left", "ns_right"),
        ["trace_id", "span_id"],
    )
    out = descendants(
        stored,
        (F.col("service") == "frontend") & (F.col("status_code") == 2),
        F.col("duration_us") > 100000,
    )
    facts = audit(out)
    assert "FlatMapGroupsInPandas" not in facts.text
    assert out.count() >= 0


def test_prw_store_roundtrip_plan(spark):
    """The ingest→store→query loop's QUERY side: the metric-name
    filter reaches the parquet scan of the materialized store, no
    Python stage survives into the read path (decode ran once at
    store-build time), and the aggregate is the only shuffle work."""
    facts = audit(QUERIES["prw_store_roundtrip"](spark, SF))
    assert any("app_latency_seconds" in p for p in facts.pushed_filters)
    assert "Python" not in facts.text
    # value/ts/service/name is all the scan reads — labels map stays
    # behind in the store
    assert all("labels" not in s for s in facts.read_schemas)
