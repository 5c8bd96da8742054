"""OTel attr-key ↔ Prometheus label-name translation surface.

Unit cases are pinned to the reference's own tables
(``otelstorage/attrs_test.go:10-23`` KeyToLabel,
``chstorage/querier_metrics_test.go:14-100`` DecodeUnicodeLabel); the
end-to-end cases drive the LogQL and PromQL engines with underscore /
``U__``-hex spellings against dotted stored keys, the way a Grafana
dashboard pointed at OTel-attributed data queries.
"""

import pytest
from pyspark.sql import functions as F

from oteldb_spark.functions.otel_labels import (
    decode_unicode_label,
    key_to_label,
    map_attr_lookup,
    resolve_label_name,
)


@pytest.mark.parametrize(
    "key,want",
    [
        ("", ""),
        ("foo", "foo"),
        ("f_oo", "f_oo"),
        ("0foo", "_0foo"),
        ("foo.bar", "foo_bar"),
        ("foo/bar", "foo_bar"),
        ("receiver/accepted_spans/0", "receiver_accepted_spans_0"),
        ("a\U0001f439/b\U0001f439/0", "a__b__0"),
    ],
)
def test_key_to_label(key, want):
    assert key_to_label(key) == want


@pytest.mark.parametrize(
    "name,want",
    [
        ("normal_label", "normal_label"),
        ("U__k8s_2e_node_2e_name", "k8s.node.name"),
        ("U__my_2d_label", "my-label"),
        ("U__path_2f_to_2f_resource", "path/to/resource"),
        ("U__k8s_2e_io_2f_app_2d_name", "k8s.io/app-name"),
        ("U__some_label_name", "some_label_name"),
        ("U__test_2x_value", "test_2x_value"),
        ("U__", ""),
        ("U___2e__2e__2e_", "..."),
        ("U__label_2", "label_2"),
        ("U__label_2e", "label_2e"),
        ("U__service_3a_name", "service:name"),
        ("U__hello_20_world", "hello world"),
        ("U__user_40_domain", "user@domain"),
        ("U__test_2E_value", "test.value"),
        ("U__test_2_value", "test_2_value"),
    ],
)
def test_decode_unicode_label(name, want):
    assert decode_unicode_label(name) == want


def test_decode_utf8_across_escapes():
    # Go WriteByte assembles raw bytes: é = C3 A9 over two escapes
    assert decode_unicode_label("U__caf_c3__a9_") == "café"


def test_resolve_label_name_order():
    cands = ["http.method", "http_method", "k8s.node.name"]
    # exact beats sanitized
    assert resolve_label_name("http_method", cands) == "http_method"
    assert resolve_label_name("http.method", cands) == "http.method"
    # U__ decode
    assert resolve_label_name("U__k8s_2e_node_2e_name", cands) == "k8s.node.name"
    # reverse sanitization, sorted-first determinism
    assert resolve_label_name("a_b", ["a/b", "a.b"]) == "a.b"
    assert resolve_label_name("missing", cands) is None
    # all-dots (canonical OTel) beats other reverse-sanitized keys even
    # when they sort first — same precedence as map_attr_lookup's fast
    # path, so compile-time and runtime resolution agree
    assert resolve_label_name("a_b", ["a-b", "a.b"]) == "a.b"
    assert resolve_label_name("a_b", ["a-b", "a/b"]) == "a-b"


def test_map_attr_lookup(spark):
    df = spark.createDataFrame(
        [({"http.method": "GET", "plain": "x"},)], "m map<string,string>"
    )
    got = df.select(
        map_attr_lookup(F.col("m"), "http.method").alias("exact"),
        map_attr_lookup(F.col("m"), "http_method").alias("sanitized"),
        map_attr_lookup(F.col("m"), "U__http_2e_method").alias("uhex"),
        map_attr_lookup(F.col("m"), "plain").alias("plain"),
        map_attr_lookup(F.col("m"), "nope").alias("missing"),
    ).first()
    assert got.exact == "GET"
    assert got.sanitized == "GET"
    assert got.uhex == "GET"
    assert got.plain == "x"
    assert got.missing is None


def test_resolvers_agree_on_ambiguous_keys(spark):
    # both 'a-b' and 'a.b' sanitize to 'a_b': the runtime map path and
    # the compile-time column path must pick the SAME key (all-dots)
    df = spark.createDataFrame(
        [({"a-b": "dash", "a.b": "dot"},)], "m map<string,string>"
    )
    got = df.select(map_attr_lookup(F.col("m"), "a_b").alias("v")).first()
    assert got.v == "dot"
    assert resolve_label_name("a_b", ["a-b", "a.b"]) == "a.b"


def _log_df(spark):
    rows = [
        (1_000_000 * i, f"line {i}", {"http.method": "GET" if i % 2 else "POST"})
        for i in range(6)
    ]
    return spark.createDataFrame(
        rows, "ts_us long, body string, attrs map<string,string>"
    )


def test_logql_sanitized_matcher_and_grouping(spark):
    from oteldb_spark.logql.compiler import (
        EvalParams,
        LogSource,
        compile_logql,
    )

    src = LogSource(
        df=_log_df(spark), label_cols={}, attrs_map_col="attrs"
    )
    listing = EvalParams(0, 10_000_000, 10_000_000)
    # underscore spelling of a dotted attr-map key
    out = compile_logql('{http_method="GET"}', src, listing, spark)
    assert out.count() == 3
    out2 = compile_logql('{U__http_2e_method="POST"}', src, listing, spark)
    assert out2.count() == 3
    # metric-layer grouping by the sanitized spelling
    agg = compile_logql(
        'sum by (http_method) (count_over_time({http_method=~".+"}[10s]))',
        src,
        EvalParams(10_000_000, 10_000_000, 10_000_000),
        spark,
    )
    # single step at 10s covering (0s,10s]: GET at ts 1,3,5; POST at 2,4
    vals = {r["http_method"]: r["value"] for r in agg.collect()}
    assert vals == {"GET": 3.0, "POST": 2.0}


def test_promql_sanitized_matcher_and_grouping(spark):
    from oteldb_spark.promql import compile_promql
    from oteldb_spark.promql.compiler import MetricSource, PromParams

    rows = [(1_000_000 * i, "n%d" % (i % 2), float(i)) for i in range(8)]
    df = spark.createDataFrame(rows, "ts_us long, `k8s.node.name` string, v double")
    src = MetricSource(
        df=df, metrics={"m": "v"}, label_cols=["k8s.node.name"]
    )
    params = PromParams(
        start_us=7_000_000, end_us=7_000_000, step_us=1_000_000
    )
    out = compile_promql('m{U__k8s_2e_node_2e_name="n1"}', src, params, spark)
    got = out.collect()
    assert len(got) == 1 and got[0]["value"] == 7.0
    out2 = compile_promql('m{k8s_node_name="n0"}', src, params, spark)
    got2 = out2.collect()
    assert len(got2) == 1 and got2[0]["value"] == 6.0
    # grouping: Prometheus label names can't contain dots, so the
    # engine surfaces the dotted storage column under its sanitized
    # spelling (exactly why the U__ escape exists)
    out3 = compile_promql(
        "sum by (k8s_node_name) (m)", src, params, spark
    )
    vals = {r["k8s_node_name"]: r["value"] for r in out3.collect()}
    assert vals == {"n0": 6.0, "n1": 7.0}
    out4 = compile_promql(
        "sum by (U__k8s_2e_node_2e_name) (m)", src, params, spark
    )
    vals4 = {r["k8s_node_name"]: r["value"] for r in out4.collect()}
    assert vals4 == {"n0": 6.0, "n1": 7.0}


# ---------------------------------------------------------- properties
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _keys = st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"),
            whitelist_characters="._-/: @",
        ),
        min_size=1,
        max_size=30,
    )

    @given(_keys)
    @settings(max_examples=200, deadline=None)
    def test_prop_sanitized_spelling_resolves_back(key):
        lbl = key_to_label(key)
        got = resolve_label_name(lbl, [key])
        # the sanitized spelling must find the original key (exact
        # match when sanitization was the identity)
        assert got == key

    @given(_keys)
    @settings(max_examples=200, deadline=None)
    def test_prop_uhex_roundtrip(key):
        # only pure-ASCII keys here (multi-byte is covered by
        # test_decode_utf8_across_escapes)
        if not key.isascii():
            return
        # encode the way Prometheus value-encoding escaping does:
        # every char outside [A-Za-z0-9] as _XX_ under a U__ prefix
        enc = "U__" + "".join(
            c if c.isalnum() else f"_{ord(c):02x}_" for c in key
        )
        assert decode_unicode_label(enc) == key

    @given(_keys)
    @settings(max_examples=200, deadline=None)
    def test_prop_key_to_label_is_prometheus_safe(key):
        import re

        lbl = key_to_label(key)
        assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", lbl) or lbl == ""
