"""Gopher repetition filters (queries/pipeline5.py): interval-union
coverage semantics and engagement of every rule family."""

from __future__ import annotations

from pyspark.sql import Row

from oteldb_spark.queries.pipeline5 import (
    _DUP_N,
    docs_repetition_rules,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rules_engage_and_bound(spark):
    rows = docs_repetition_rules(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        for c in ("top2_frac", "top3_frac", "top4_frac", "dupn_frac"):
            assert 0.0 <= r[c] <= 1.0, (c, r)
        # a doc's top-2-gram covers at least as many chars as its
        # top-4-gram occurrences can (more occurrences, shorter gram
        # is not guaranteed — but zero-top2 implies zero-top4)
        if r["top2_frac"] == 0.0:
            assert len(rows) and r["top4_frac"] == 0.0
    # the filter rejects someone and keeps someone
    keeps = [r["keep"] for r in rows]
    assert 0 < sum(keeps) < len(keeps)


def test_dup_coverage_interval_union(spark):
    """Hand-built doc: 'a b c a b c x' has duplicate 3-gram 'a b c' at
    positions 0 and 3 → covered word positions {0..5} (union, position
    6 'x' uncovered) → coverage = 6 chars / 7 chars."""
    assert _DUP_N == 3
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c a b c x")]
    )
    import oteldb_spark.queries.pipeline5 as p5
    from unittest import mock

    with mock.patch.object(p5, "load", lambda s, d, n, **kw: docs):
        r = docs_repetition_rules(spark, "unused").collect()[0]
    assert r["dupn_frac"] == round(6 / 7, 6)
    # top-2-gram: 'a b' (and 'b c') occur twice; tie broken to 'a b';
    # coverage = 2 occurrences x 2 chars / 7 chars
    assert r["top2_frac"] == round(4 / 7, 6)


def test_bpe_encoder_hand_case(spark):
    """'the table' → merges produce [the] [table] (both fully merged:
    t+h, th+e; t+a, ta+b, tab+l, tabl+e) → 2 tokens; 'xyz' has no
    applicable merge → 3 char tokens."""
    from pyspark.sql import Row
    from unittest import mock

    import oteldb_spark.queries.pipeline5 as p5

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the table"), Row(doc_id=2, text="xyz")]
    )
    with mock.patch.object(p5, "load", lambda s, d, n, **kw: docs):
        rows = {
            r["doc_id"]: r
            for r in p5.text_bpe_tokens(spark, "unused").collect()
        }
    assert rows[1]["bpe_tokens"] == 2
    assert rows[1]["chars_per_token"] == round(8 / 2, 6)
    assert rows[2]["bpe_tokens"] == 3


def test_bpe_adjacent_repeat_two_pass(spark):
    """'tata' exercises the two-pass rule: pass 1 merges the first
    't a', the consumed space hides the second until pass 2 → both
    merge → 2 tokens [ta] [ta]."""
    from pyspark.sql import Row
    from unittest import mock

    import oteldb_spark.queries.pipeline5 as p5

    docs = spark.createDataFrame([Row(doc_id=1, text="tata")])
    with mock.patch.object(p5, "load", lambda s, d, n, **kw: docs):
        r = p5.text_bpe_tokens(spark, "unused").collect()[0]
    assert r["bpe_tokens"] == 2


def test_mixture_sample_temperature(spark):
    """T=2 mixing: quotas respected per source, and the sampled
    FRACTION of a small source exceeds that of a large one."""
    import oteldb_spark.queries.pipeline5 as p5

    sf = "/root/testdata/sf0.001"
    rows = p5.docs_mixture_sample(spark, sf).collect()
    assert rows
    by_src: dict[str, int] = {}
    quota: dict[str, int] = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
        quota[r["source"]] = r["source_quota"]
    for s, n in by_src.items():
        assert n <= quota[s], (s, n, quota[s])
    # source sizes from the raw table
    from oteldb_spark.tables import load
    from pyspark.sql import functions as F

    sizes = {
        r["source"]: r["n"]
        for r in load(spark, sf, "documents")
        .groupBy(F.expr(p5._MIX_SRC_SQL).alias("source"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    frac = {s: by_src.get(s, 0) / sizes[s] for s in sizes}
    # sqrt-temperature upweights the smallest source vs the largest
    small = min(sizes, key=sizes.get)
    large = max(sizes, key=sizes.get)
    assert frac[small] > frac[large], frac
