"""OTLP protobuf wire decode (sources/otlp_pb.py): pure-python
round-trips for every AnyValue kind and the three request shapes,
plus Spark-path flattening and the arbitrary-scale exponential
histogram operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.sources import otlp_pb as pb


def test_any_value_kinds_roundtrip():
    cases = [
        (pb.enc_any_string("x"), {"stringValue": "x"}),
        (pb.enc_any_int(-5), {"intValue": "-5"}),
        (pb.enc_any_int(7), {"intValue": "7"}),
        (pb.enc_any_double(1.5), {"doubleValue": 1.5}),
        (pb._tag(2, 0) + pb._enc_uvarint(1), {"boolValue": True}),
        (pb._enc_len(7, b"\x01\xff"), {"bytesValue": "01ff"}),
    ]
    for enc, want in cases:
        assert pb.decode_any_value(enc) == want
    # nested array + kvlist
    arr = pb._enc_len(
        5, pb._enc_len(1, pb.enc_any_string("a")) + pb._enc_len(1, pb.enc_any_int(2))
    )
    assert pb.decode_any_value(arr) == {
        "arrayValue": {"values": [{"stringValue": "a"}, {"intValue": "2"}]}
    }
    kvl = pb._enc_len(6, pb._enc_len(1, pb.enc_kv("k", pb.enc_any_string("v"))))
    assert pb.decode_any_value(kvl) == {
        "kvlistValue": {"values": [{"key": "k", "value": {"stringValue": "v"}}]}
    }


def test_logs_request_roundtrip():
    rec = pb.enc_log_record(
        time_ns=123,
        severity_number=17,
        severity_text="ERROR",
        body="boom",
        attrs={"a": "1"},
        trace_id=(255).to_bytes(16, "big"),
        span_id=(7).to_bytes(8, "big"),
        observed_ns=124,
    )
    req = pb.enc_logs_request({"service.name": "s"}, [rec], scope_name="sc")
    got = pb.decode_logs_request(req)
    rl = got["resourceLogs"][0]
    assert rl["resource"]["attributes"][0]["key"] == "service.name"
    sl = rl["scopeLogs"][0]
    assert sl["scope"]["name"] == "sc"
    r = sl["logRecords"][0]
    assert r["timeUnixNano"] == "123" and r["observedTimeUnixNano"] == "124"
    assert r["traceId"].endswith("ff") and len(r["traceId"]) == 32
    assert r["body"] == {"stringValue": "boom"}


def test_traces_and_metrics_roundtrip():
    span = pb.enc_span(
        trace_id=(1).to_bytes(16, "big"),
        span_id=(2).to_bytes(8, "big"),
        parent_span_id=(3).to_bytes(8, "big"),
        name="op",
        kind=3,
        start_ns=10,
        end_ns=25,
        attrs={"k": "v"},
        status_code=2,
        status_message="bad",
    )
    t = pb.decode_traces_request(pb.enc_traces_request({}, [span]))
    s = t["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert (s["name"], s["kind"], s["status"]["code"]) == ("op", 3, 2)
    assert s["startTimeUnixNano"] == "10" and s["endTimeUnixNano"] == "25"

    m = pb.decode_metrics_request(
        pb.enc_metrics_request(
            {},
            [
                pb.enc_sum_metric(
                    "c_total",
                    "1",
                    [pb.enc_number_point(time_ns=5, value=2.5)],
                ),
                pb.enc_gauge_metric(
                    "g", "", [pb.enc_number_point(time_ns=6, value=4, as_int=True)]
                ),
                pb.enc_histogram_metric(
                    "h",
                    "s",
                    [
                        pb.enc_histogram_point(
                            time_ns=7,
                            bucket_counts=[1, 2, 3],
                            explicit_bounds=[0.5, 1.0],
                            sum_=9.0,
                        )
                    ],
                ),
            ],
        )
    )
    metrics = m["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]
    assert metrics[0]["sum"]["isMonotonic"] is True
    assert metrics[0]["sum"]["dataPoints"][0]["asDouble"] == 2.5
    assert metrics[1]["gauge"]["dataPoints"][0]["asInt"] == "4"
    hp = metrics[2]["histogram"]["dataPoints"][0]
    assert hp["bucketCounts"] == ["1", "2", "3"]
    assert hp["explicitBounds"] == [0.5, 1.0] and hp["count"] == "6"


def test_exp_histogram_operators(spark):
    # scale 0, buckets idx 0:(1,2] ×4, idx 1:(2,4] ×4, zero_count 2
    point = pb.enc_exp_histogram_point(
        time_ns=1,
        count=10,
        sum_=20.0,
        scale=0,
        zero_count=2,
        positive_offset=0,
        positive_counts=[4, 4],
        attrs={"g": "a"},
    )
    req = pb.enc_metrics_request(
        {}, [pb.enc_exp_histogram_metric("m", "", [point])]
    )
    payloads = spark.createDataFrame([(req,)], "payload binary")
    state = pb.pb_exp_histograms(payloads)
    row = state.collect()[0]
    assert row.scale == 0 and row.zero_count == 2
    assert row.positive_counts == [4, 4]

    from oteldb_spark.operators.exp_histogram import (
        explode_exp_buckets,
        exp_histogram_fraction,
        exp_histogram_quantile,
    )

    b = explode_exp_buckets(state.withColumn("g", F.lit("a")), ["g"])
    rows = {r.idx: r for r in b.collect()}
    assert rows[0].lower == 1.0 and rows[0].upper == 2.0
    assert rows[1].lower == 2.0 and rows[1].upper == 4.0
    # median: rank 5 → 3 into bucket 0 (cum 2+4=6 ≥ 5):
    # 1 + (2-1)·(5-2)/4 = 1.75
    med = exp_histogram_quantile(b, 0.5, ["g"]).collect()[0]
    assert abs(med.value - 1.75) < 1e-12
    # fraction in [1, 2]: bucket 0 fully, bucket 1 none → 4/10
    fr = exp_histogram_fraction(b, 1.0, 2.0, ["g"]).collect()[0]
    assert abs(fr.value - 0.4) < 1e-12


def test_signed_exp_histogram_quantile(spark):
    """Signed decode: negative buckets mirror positive bounds; the
    quantile sweep runs negatives → zero → positives, interpolating
    inside a negative bucket and returning exactly 0.0 for ranks in
    the zero bucket."""
    from oteldb_spark.operators.exp_histogram import (
        exp_histogram_quantile_signed,
        explode_exp_buckets_signed,
    )

    # scale 0 (base 2): negatives [-4,-2) x4, [-2,-1) x2; zero x4;
    # positives (1,2] x2, (2,4] x8 — total 20
    state = spark.createDataFrame(
        [
            ("m", 0, 4, [1, 0], [2, 8], [2, 4]),
        ],
        "name string, scale int, zero_count long,"
        " offs array<int>, positive_counts array<long>,"
        " negative_counts array<long>",
    ).selectExpr(
        "name", "scale", "zero_count",
        "offs[0] as positive_offset", "positive_counts",
        "offs[1] as negative_offset", "negative_counts",
    )
    b = explode_exp_buckets_signed(state, ["name"])
    rows = {
        (r.lower, r.upper): r.cnt for r in b.collect()
    }
    assert rows[(-4.0, -2.0)] == 4 and rows[(-2.0, -1.0)] == 2
    assert rows[(0.0, 0.0)] == 4
    assert rows[(2.0, 4.0)] == 2 and rows[(4.0, 8.0)] == 8

    def q(p):
        out = exp_histogram_quantile_signed(b, p, ["name"]).collect()
        return out[0].value

    # rank 2 of 20 → inside [-4,-2): -4 + 2*(2/4)
    assert q(0.1) == -3.0
    # rank 8 of 20 → inside the zero bucket → exactly 0.0
    assert q(0.4) == 0.0
    # rank 16 of 20 → inside (4,8]: cum before = 12 → 4 + 4*(4/8)
    assert q(0.8) == 6.0


def test_pb_metrics_direct_equals_via_json(spark):
    """The direct row decode must reproduce the shared-flattener
    (via-JSON) path exactly — mixed fixture: monotonic sum with int
    points and typed attrs, gauge, histogram with min/max, summary."""
    import oteldb_spark.sources.otlp_pb as pb

    num_pts = [
        pb.enc_number_point(
            time_ns=1_704_067_200_000_000_000 + i * 10**9,
            value=i * 2 + 1,
            attrs={"cpu": str(i % 2)},
            as_int=(i % 2 == 0),
        )
        for i in range(6)
    ]
    metrics = [
        pb.enc_sum_metric("req_total", "1", num_pts, monotonic=True),
        pb.enc_gauge_metric("temp", "cel", num_pts[:3]),
        pb.enc_histogram_metric(
            "lat",
            "s",
            [
                pb.enc_histogram_point(
                    time_ns=1_704_067_200_000_000_000,
                    bucket_counts=[3, 5, 2],
                    explicit_bounds=[0.5, 1.0],
                    sum_=7.25,
                    attrs={"route": "/api"},
                )
            ],
        ),
    ]
    payload = pb.enc_metrics_request({"service.name": "svc"}, metrics)
    df = spark.createDataFrame([(payload,)], "payload binary")

    direct = pb.pb_metrics(df)
    via = pb.pb_metrics_via_json(df)
    cols = sorted(direct.columns)
    assert cols == sorted(via.columns)

    def norm(frame):
        rows = []
        for r in frame.select(*cols).collect():
            d = r.asDict()
            d["labels"] = tuple(sorted((d["labels"] or {}).items()))
            d["resource_attrs"] = tuple(
                sorted((d["resource_attrs"] or {}).items())
            )
            rows.append(tuple(d[c] for c in cols))
        return sorted(rows)

    assert norm(direct) == norm(via)


def _norm_frames_equal(direct, via):
    cols = sorted(direct.columns)
    assert cols == sorted(via.columns)

    def norm(frame):
        rows = []
        for r in frame.select(*cols).collect():
            d = r.asDict()
            for mc in ("labels", "attrs", "resource_attrs"):
                if mc in d:
                    d[mc] = tuple(sorted((d[mc] or {}).items()))
            rows.append(tuple(d[c] for c in cols))
        return sorted(rows, key=repr)

    assert norm(direct) == norm(via)


def test_pb_logs_direct_equals_via_json(spark):
    recs = [
        pb.enc_log_record(
            time_ns=1_704_067_200_000_000_000 + i * 10**9,
            severity_number=9 if i % 2 else 17,
            severity_text="INFO" if i % 2 else "ERROR",
            body=f"line {i}",
            attrs={"user": str(i)},
            trace_id=i.to_bytes(16, "big"),
            span_id=i.to_bytes(8, "big"),
            observed_ns=1_704_067_200_000_000_000 + i * 10**9 + 5,
        )
        for i in range(5)
    ]
    payload = pb.enc_logs_request(
        {"service.name": "svc", "service.namespace": "prod"}, recs,
        scope_name="sc",
    )
    df = spark.createDataFrame([(payload,)], "payload binary")
    _norm_frames_equal(pb.pb_logs(df), pb.pb_logs_via_json(df))


def test_pb_spans_direct_equals_via_json(spark):
    spans = [
        pb.enc_span(
            trace_id=(i // 3).to_bytes(16, "big"),
            span_id=i.to_bytes(8, "big"),
            parent_span_id=b"" if i % 3 == 0 else (i - i % 3).to_bytes(8, "big"),
            name=f"op-{i}",
            kind=2 + i % 3,
            start_ns=1_704_067_200_000_000_000 + i * 10**6,
            end_ns=1_704_067_200_000_000_000 + i * 10**6 + 42,
            attrs={"k": str(i)},
            status_code=i % 3,
            status_message="m" if i % 3 else "",
        )
        for i in range(6)
    ]
    payload = pb.enc_traces_request({"service.name": "svc"}, spans)
    df = spark.createDataFrame([(payload,)], "payload binary")
    _norm_frames_equal(pb.pb_spans(df), pb.pb_spans_via_json(df))


def test_pb_metrics_direct_typed_attrs(spark):
    """Typed point attributes (int / double / bool) must stringify
    identically on the direct path and the Spark-cast JSON path."""
    base = pb.enc_number_point(time_ns=1_704_067_200_000_000_000, value=1.5)
    typed = (
        pb._enc_len(7, pb.enc_kv("n", pb.enc_any_int(-42)))
        + pb._enc_len(7, pb.enc_kv("d", pb.enc_any_double(0.25)))
        + pb._enc_len(7, pb.enc_kv("dd", pb.enc_any_double(3.0)))
        + pb._enc_len(7, pb.enc_kv("b", pb._tag(2, 0) + pb._enc_uvarint(1)))
    )
    metric = pb.enc_gauge_metric("g", "", [base + typed])
    payload = pb.enc_metrics_request({"service.name": "svc"}, [metric])
    df = spark.createDataFrame([(payload,)], "payload binary")
    d_rows = pb.pb_metrics(df).collect()
    v_rows = pb.pb_metrics_via_json(df).collect()
    d = dict(d_rows[0]["labels"])
    v = dict(v_rows[0]["labels"])
    assert d == v, (d, v)
    assert d == {"n": "-42", "d": "0.25", "dd": "3.0", "b": "true"}
    assert d_rows[0]["series_hash"] == v_rows[0]["series_hash"]


def test_pb_metrics_direct_double_attr_formatting(spark):
    """Doubles outside Python repr's plain-decimal window ([1e7,1e16),
    [1e-4,1e-3)), the legacy-FloatingDecimal exact-integer band
    (2^54..2^63), and NaN/Inf must render via Java Double.toString
    rules on BOTH ingest paths — labels and series_hash pinned equal."""
    doubles = [
        2e7,           # Java 2.0E7, Python repr 20000000.0
        12345678.0,    # Java 1.2345678E7
        0.00012,       # Java 1.2E-4, Python repr 0.00012
        1e16,
        1.7033882668101804e18,  # legacy band: 1.70338826681018035E18
        float("nan"),
        float("inf"),
        float("-inf"),
        -0.0,
    ]
    typed = b"".join(
        pb._enc_len(7, pb.enc_kv(f"d{i}", pb.enc_any_double(x)))
        for i, x in enumerate(doubles)
    )
    base = pb.enc_number_point(time_ns=1_704_067_200_000_000_000, value=1.0)
    metric = pb.enc_gauge_metric("g", "", [base + typed])
    payload = pb.enc_metrics_request({"service.name": "svc"}, [metric])
    df = spark.createDataFrame([(payload,)], "payload binary")
    d_rows = pb.pb_metrics(df).collect()
    v_rows = pb.pb_metrics_via_json(df).collect()
    d = dict(d_rows[0]["labels"])
    v = dict(v_rows[0]["labels"])
    assert d == v, (d, v)
    assert d["d0"] == "2.0E7"
    assert d["d1"] == "1.2345678E7"
    assert d["d2"] == "1.2E-4"
    assert d["d4"] == "1.70338826681018035E18"
    assert d["d5"] == "NaN"
    assert d["d6"] == "Infinity"
    assert d["d7"] == "-Infinity"
    assert d["d8"] == "-0.0"
    assert d_rows[0]["series_hash"] == v_rows[0]["series_hash"]
