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
