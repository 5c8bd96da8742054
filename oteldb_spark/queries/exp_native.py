"""Arbitrary-scale exponential-histogram gates (scale 3 — the OTel
SDK default range is 3..8; the round-2 model was scale-0 only).

Fixture: per event_type, events values are bucketed at scale 3
(idx = ⌈8·log2(v)⌉ − 1, bucket (2^(i/8), 2^((i+1)/8)]) into a native
state row, encoded as OTLP protobuf ExponentialHistogram, and decoded
by the REAL wire path (``sources/otlp_pb.pb_exp_histograms``).  The
DuckDB oracle recreates bucket indices/bounds from the raw events
with the same ceil/log2 math, so the gates round-trip encode → wire
decode → arbitrary-scale value-space math against SQL ground truth.

Reference: ``chstorage/querier_metrics.go:1365-1470`` (decode at any
scale), ``columns_metrics.go:181-230`` (state columns).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..operators.exp_histogram import (
    explode_exp_buckets,
    exp_histogram_fraction,
    exp_histogram_quantile,
)
from ..memo import SessionMemo
from ..sources import otlp_pb as pb
from ..tables import load
from .registry import register

_LIMIT = 400
_SCALE = 3
_T0_NS = 1_704_067_200_000_000_000


def _encode_states(rows, limit, time_ns) -> list[bytes]:
    """One exp-histogram state metric per event_type over the first
    ``limit`` events, timestamped ``time_ns``."""
    by_type: dict[str, list[float]] = {}
    for r in rows:
        if r.event_id < limit:
            by_type.setdefault(r.event_type, []).append(r.value)
    metrics = []
    for etype, vals in sorted(by_type.items()):
        zero_count = sum(1 for v in vals if v <= 0)
        idxs = [
            math.ceil(8 * math.log2(v)) - 1 for v in vals if v > 0
        ]
        lo, hi = min(idxs), max(idxs)
        counts = [0] * (hi - lo + 1)
        for i in idxs:
            counts[i - lo] += 1
        sum_ = sum(int(round(v * 100)) for v in vals) / 100.0
        metrics.append(
            pb.enc_exp_histogram_metric(
                "app_value_exp",
                "1",
                [
                    pb.enc_exp_histogram_point(
                        time_ns=time_ns,
                        count=len(vals),
                        sum_=sum_,
                        scale=_SCALE,
                        zero_count=zero_count,
                        positive_offset=lo,
                        positive_counts=counts,
                        attrs={"etype": etype},
                    )
                ],
            )
        )
    return metrics


_PAYLOAD_MEMO = SessionMemo()


def _state_payload(spark, sf_dir) -> list[bytes]:
    # fixture encode pinned per (session, sf): five sibling gates call
    # this, and the events collect + driver-side wire encode is
    # identical every time
    memo = _PAYLOAD_MEMO.get(spark, sf_dir)
    if memo is not None:
        return memo
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < _LIMIT)
        .select("event_id", "event_type", "value")
        .collect()
    )
    out = [
        pb.enc_metrics_request(
            {"service.name": "svc-exp"}, _encode_states(rows, _LIMIT, _T0_NS)
        )
    ]
    _PAYLOAD_MEMO.set(spark, sf_dir, out)
    return out


_BUCKETS_MEMO = SessionMemo()


def _buckets(spark, sf_dir):
    # pinned per session like _signed_buckets: three sibling gates and
    # the quantile's window branches otherwise re-run the Arrow wire
    # decode each; repin revives the blocks after a bench release
    from ..operators.pin import pin, repin

    memo = _BUCKETS_MEMO.get(spark, sf_dir)
    if memo is not None:
        return repin(memo, small=True)
    from ..sources.payloads import payload_frame

    # Arrow-built local frame: one JVM partition per payload, no
    # Python-pickle scan and no repartition Exchange (sources/payloads.py)
    df = payload_frame(spark, _state_payload(spark, sf_dir))
    state = pb.pb_exp_histograms(df).withColumn(
        "etype", F.col("labels")["etype"]
    )
    out = pin(explode_exp_buckets(state, ["name", "etype"]), small=True)
    _BUCKETS_MEMO.set(spark, sf_dir, out)
    return out


_BASE_CTES = f"""WITH e AS (
  SELECT event_type AS etype, value FROM events WHERE event_id < {_LIMIT}
), z AS (
  SELECT etype, CAST(count(*) FILTER (value <= 0) AS BIGINT) AS zc
  FROM e GROUP BY etype
), b AS (
  SELECT etype, CAST(ceil(8 * log2(value)) AS BIGINT) - 1 AS idx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM e WHERE value > 0 GROUP BY 1, 2
), bb AS (
  SELECT b.etype, b.idx, b.cnt, z.zc,
         pow(2.0, b.idx / 8.0) AS lower,
         pow(2.0, (b.idx + 1) / 8.0) AS upper
  FROM b JOIN z USING (etype)
)"""


@register(
    "exp_hist_scale3_decode",
    _BASE_CTES
    + """
SELECT 'app_value_exp' AS name, etype, CAST(3 AS INTEGER) AS scale,
       zc AS zero_count, idx, cnt,
       round(lower, 6) AS lower, round(upper, 6) AS upper
FROM bb""",
)
def exp_hist_scale3_decode(spark, sf_dir):
    b = _buckets(spark, sf_dir)
    return b.select(
        "name",
        "etype",
        "scale",
        "zero_count",
        "idx",
        "cnt",
        F.round("lower", 6).alias("lower"),
        F.round("upper", 6).alias("upper"),
    )


@register(
    "exp_hist_scale3_p90",
    _BASE_CTES
    + """, c AS (
  SELECT etype, idx, cnt, lower, upper,
         zc + sum(cnt) OVER (PARTITION BY etype ORDER BY idx) AS cum,
         zc + sum(cnt) OVER (PARTITION BY etype) AS total
  FROM bb
), m AS (
  SELECT etype, min(idx) AS i0 FROM c WHERE cum >= 0.9 * total GROUP BY etype
)
SELECT 'app_value_exp' AS name, c.etype,
       round(greatest(lower, least(upper,
         lower + (upper - lower) * ((0.9 * total - (cum - cnt)) / cnt))), 6)
         AS value
FROM c JOIN m ON c.etype = m.etype AND c.idx = m.i0""",
)
def exp_hist_scale3_p90(spark, sf_dir):
    q = exp_histogram_quantile(_buckets(spark, sf_dir), 0.9, ["name", "etype"])
    return q.select("name", "etype", F.round("value", 6).alias("value"))


# --- engine-path STATE selectors ---------------------------------------------
# Two state snapshots per etype (cumulative: first 200 events, then
# all 400) six hours apart; the PromQL engine must pick the latest
# state per step inside the 5m lookback and decode at scale 3 —
# steps: T0 → snapshot A, T0+6h → snapshot B, T0+12h → stale (empty).

_SNAP_GAP_US = 6 * 3_600_000_000
_T0_US = _T0_NS // 1000


def _state_frame(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < _LIMIT)
        .select("event_id", "event_type", "value")
        .collect()
    )
    payload = [
        pb.enc_metrics_request(
            {"service.name": "svc-exp"},
            _encode_states(rows, 200, _T0_NS)
            + _encode_states(rows, _LIMIT, _T0_NS + _SNAP_GAP_US * 1000),
        )
    ]
    from ..sources.payloads import payload_frame

    df = payload_frame(spark, payload)
    return pb.pb_exp_histograms(df).select(
        F.col("labels")["etype"].alias("etype"),
        (F.col("ts_ns") / 1000).cast("long").alias("ts_us"),
        "count",
        "sum",
        "scale",
        "zero_count",
        "positive_offset",
        "positive_counts",
    )


def _run_state(q: str):
    from ..promql import MetricSource, PromParams, compile_promql

    def fn(spark, sf_dir):
        state = _state_frame(spark, sf_dir)
        src = MetricSource(
            df=state,
            metrics={},
            label_cols=[],
            exp_states={"app_value_exp_state": state},
            exp_state_labels=["etype"],
        )
        params = PromParams(_T0_US, _T0_US + 2 * _SNAP_GAP_US, _SNAP_GAP_US)
        out = compile_promql(q, src, params, spark)
        return out.withColumn("value", F.round("value", 6))

    return fn


def _snap_cte(tag: str, limit: int, step_us: int) -> str:
    """Bucketed snapshot CTEs for one state, tagged with its step."""
    return f"""z{tag} AS (
  SELECT etype, CAST(count(*) FILTER (value <= 0) AS BIGINT) AS zc
  FROM (SELECT event_type AS etype, value FROM events
        WHERE event_id < {limit}) GROUP BY etype
), b{tag} AS (
  SELECT etype, CAST(ceil(8 * log2(value)) AS BIGINT) - 1 AS idx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT event_type AS etype, value FROM events
        WHERE event_id < {limit}) WHERE value > 0 GROUP BY 1, 2
), bb{tag} AS (
  SELECT b{tag}.etype, CAST({step_us} AS BIGINT) AS step_us, idx, cnt, zc,
         pow(2.0, idx / 8.0) AS lower,
         pow(2.0, (idx + 1) / 8.0) AS upper
  FROM b{tag} JOIN z{tag} USING (etype)
)"""


@register(
    "ppql_exp_state_quantile",
    f"""WITH {_snap_cte("a", 200, _T0_US)},
{_snap_cte("b", _LIMIT, _T0_US + _SNAP_GAP_US)},
bbu AS (SELECT * FROM bba UNION ALL SELECT * FROM bbb),
c AS (
  SELECT etype, step_us, idx, cnt, lower, upper,
         zc + sum(cnt) OVER (PARTITION BY etype, step_us ORDER BY idx) AS cum,
         zc + sum(cnt) OVER (PARTITION BY etype, step_us) AS total
  FROM bbu
), m AS (
  SELECT etype, step_us, min(idx) AS i0 FROM c
  WHERE cum >= 0.9 * total GROUP BY etype, step_us
)
SELECT c.etype, c.step_us,
       round(greatest(lower, least(upper,
         lower + (upper - lower) * ((0.9 * total - (cum - cnt)) / cnt))), 6)
         AS value
FROM c JOIN m ON c.etype = m.etype AND c.step_us = m.step_us
             AND c.idx = m.i0""",
)
def ppql_exp_state_quantile(spark, sf_dir):
    return _run_state("histogram_quantile(0.9, app_value_exp_state)")(
        spark, sf_dir
    )


@register(
    "ppql_exp_state_avg",
    f"""WITH sa AS (
  SELECT event_type AS etype,
         sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_id < 200 GROUP BY 1
), sb AS (
  SELECT event_type AS etype,
         sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_id < {_LIMIT} GROUP BY 1
)
SELECT etype, CAST({_T0_US} AS BIGINT) AS step_us,
       round(s / n, 6) AS value FROM sa
UNION ALL
SELECT etype, CAST({_T0_US + _SNAP_GAP_US} AS BIGINT),
       round(s / n, 6) FROM sb""",
)
def ppql_exp_state_avg(spark, sf_dir):
    return _run_state("histogram_avg(app_value_exp_state)")(spark, sf_dir)


@register(
    "exp_hist_scale3_fraction",
    _BASE_CTES
    + """
SELECT 'app_value_exp' AS name, etype,
       round((
         sum(cnt * (CASE WHEN 16.0 >= upper THEN 1.0
                         WHEN 16.0 <= lower THEN 0.0
                         ELSE (16.0 - lower) / (upper - lower) END))
         - sum(cnt * (CASE WHEN 1.0 >= upper THEN 1.0
                           WHEN 1.0 <= lower THEN 0.0
                           ELSE (1.0 - lower) / (upper - lower) END))
       ) / (any_value(zc) + sum(cnt)), 6) AS value
FROM bb GROUP BY etype""",
)
def exp_hist_scale3_fraction(spark, sf_dir):
    f = exp_histogram_fraction(
        _buckets(spark, sf_dir), 1.0, 16.0, ["name", "etype"]
    )
    return f.select("name", "etype", F.round("value", 6).alias("value"))


# --- SIGNED buckets: negative domain ----------------------------------------
# Real workloads observe negative values (temperature deltas, balance
# changes); OTLP carries them in the ``negative`` bucket array
# (mirrored bounds).  Fixture: events values shifted by -30 at scale 2
# → a genuine negative/positive mix; decode sweeps negatives → zero →
# positives in one ascending value-space pass.

_SHIFT = 30.0
_S2 = 2  # base 2^(1/4)


def _encode_signed_states(rows, time_ns) -> list[bytes]:
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            round(r.value - _SHIFT, 2)
        )
    metrics = []
    for etype, vals in sorted(by_type.items()):
        zero_count = sum(1 for v in vals if v == 0)
        pos_idx = [math.ceil(4 * math.log2(v)) - 1 for v in vals if v > 0]
        neg_idx = [math.ceil(4 * math.log2(-v)) - 1 for v in vals if v < 0]
        # an all-one-sign (or all-zero) event_type leaves the other
        # side empty — emit empty counts at offset 0, matching
        # enc_exp_histogram_point's optional arrays
        if pos_idx:
            plo, phi = min(pos_idx), max(pos_idx)
            pcounts = [0] * (phi - plo + 1)
            for i in pos_idx:
                pcounts[i - plo] += 1
        else:
            plo, pcounts = 0, []
        if neg_idx:
            nlo, nhi = min(neg_idx), max(neg_idx)
            ncounts = [0] * (nhi - nlo + 1)
            for i in neg_idx:
                ncounts[i - nlo] += 1
        else:
            nlo, ncounts = 0, []
        metrics.append(
            pb.enc_exp_histogram_metric(
                "app_delta_exp",
                "1",
                [
                    pb.enc_exp_histogram_point(
                        time_ns=time_ns,
                        count=len(vals),
                        sum_=round(sum(vals), 2),
                        scale=_S2,
                        zero_count=zero_count,
                        positive_offset=plo,
                        positive_counts=pcounts,
                        negative_offset=nlo,
                        negative_counts=ncounts,
                        attrs={"etype": etype},
                    )
                ],
            )
        )
    return metrics


_SIGNED_MEMO = SessionMemo()


def _signed_buckets(spark, sf_dir):
    """Signed bucket frame, pinned per session: the explode references
    the state THREE times (pos/neg/zero branches), which would re-run
    the wire decode per branch without the pin; the frame is tiny."""
    from ..operators.exp_histogram import explode_exp_buckets_signed

    memo = _SIGNED_MEMO.get(spark, sf_dir)
    if memo is not None:
        # a release_pins() between queries may have dropped the blocks;
        # revive both pins or every sibling branch re-runs the decode
        from ..operators.pin import repin

        state = _SIGNED_MEMO.get(spark, ("state", sf_dir))
        if state is not None:  # buckets memoized without state: rare
            repin(state)  # partial-set failure; recompute is still safe
        return repin(memo)
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < _LIMIT)
        .select("event_id", "event_type", "value")
        .collect()
    )
    payloads = [
        pb.enc_metrics_request(
            {"service.name": "svc-exp"}, _encode_signed_states(rows, _T0_NS)
        )
    ]
    from ..sources.payloads import payload_frame

    df = payload_frame(spark, payloads)
    state = pb.pb_exp_histograms(df).withColumn(
        "etype", F.col("labels")["etype"]
    )
    from ..operators.pin import pin

    pinned_state = pin(state)
    out = pin(explode_exp_buckets_signed(pinned_state, ["name", "etype"]))
    _SIGNED_MEMO.set(spark, sf_dir, out)
    _SIGNED_MEMO.set(spark, ("state", sf_dir), pinned_state)
    return out


def _signed_state(spark, sf_dir):
    """The pinned native state rows behind :func:`_signed_buckets`
    (count/sum per series — the stddev mean source)."""
    _signed_buckets(spark, sf_dir)
    return _SIGNED_MEMO.get(spark, ("state", sf_dir))


_SIGNED_CTES = f"""WITH e AS (
  SELECT event_type AS etype, round(value - {_SHIFT}, 2) AS v
  FROM events WHERE event_id < {_LIMIT}
), pos AS (
  SELECT etype, CAST(ceil(4 * log2(v)) AS BIGINT) - 1 AS i,
         CAST(count(*) AS BIGINT) AS cnt
  FROM e WHERE v > 0 GROUP BY 1, 2
), neg AS (
  SELECT etype, CAST(ceil(4 * log2(-v)) AS BIGINT) - 1 AS i,
         CAST(count(*) AS BIGINT) AS cnt
  FROM e WHERE v < 0 GROUP BY 1, 2
), zero AS (
  SELECT etype, CAST(count(*) AS BIGINT) AS cnt
  FROM e WHERE v = 0 GROUP BY etype
), bb AS (
  SELECT etype, i AS idx, cnt,
         pow(2.0, i / 4.0) AS lower, pow(2.0, (i + 1) / 4.0) AS upper
  FROM pos
  UNION ALL
  SELECT etype, -(i + 1) AS idx, cnt,
         -pow(2.0, (i + 1) / 4.0) AS lower, -pow(2.0, i / 4.0) AS upper
  FROM neg
  UNION ALL
  SELECT etype, 0 AS idx, cnt, 0.0 AS lower, 0.0 AS upper FROM zero
)"""


@register(
    "exp_hist_signed_median",
    _SIGNED_CTES
    + """, c AS (
  SELECT etype, lower, upper, cnt,
         sum(cnt) OVER (PARTITION BY etype ORDER BY lower) AS cum,
         sum(cnt) OVER (PARTITION BY etype) AS total
  FROM bb
), m AS (
  SELECT etype, min(lower) AS l0 FROM c WHERE cum >= 0.5 * total
  GROUP BY etype
)
SELECT 'app_delta_exp' AS name, c.etype,
       round(greatest(lower, least(upper,
         lower + (upper - lower) * ((0.5 * total - (cum - cnt)) / cnt))), 6)
         AS value
FROM c JOIN m ON c.etype = m.etype AND c.lower = m.l0""",
)
def exp_hist_signed_median(spark, sf_dir):
    from ..operators.exp_histogram import exp_histogram_quantile_signed

    q = exp_histogram_quantile_signed(
        _signed_buckets(spark, sf_dir), 0.5, ["name", "etype"]
    )
    return q.select("name", "etype", F.round("value", 6).alias("value"))


# p10 lands deep in the NEGATIVE domain — interpolation inside a
# mirrored bucket, not just ordering across the sign boundary
@register(
    "exp_hist_signed_p10",
    _SIGNED_CTES
    + """, c AS (
  SELECT etype, lower, upper, cnt,
         sum(cnt) OVER (PARTITION BY etype ORDER BY lower) AS cum,
         sum(cnt) OVER (PARTITION BY etype) AS total
  FROM bb
), m AS (
  SELECT etype, min(lower) AS l0 FROM c WHERE cum >= 0.1 * total
  GROUP BY etype
)
SELECT 'app_delta_exp' AS name, c.etype,
       round(greatest(lower, least(upper,
         lower + (upper - lower) * ((0.1 * total - (cum - cnt)) / cnt))), 6)
         AS value
FROM c JOIN m ON c.etype = m.etype AND c.lower = m.l0""",
)
def exp_hist_signed_p10(spark, sf_dir):
    from ..operators.exp_histogram import exp_histogram_quantile_signed

    q = exp_histogram_quantile_signed(
        _signed_buckets(spark, sf_dir), 0.1, ["name", "etype"]
    )
    return q.select("name", "etype", F.round("value", 6).alias("value"))


# histogram_stdvar/stddev over the SIGNED native state — pinned to the
# UPSTREAM Prometheus convention (promql/functions.go
# funcHistogramStdDev): geometric-midpoint mass ±sqrt(upper·lower),
# exactly 0 for the zero bucket, deviations around the true mean
# sum/count with zero counts in the denominator.  The oracle replays
# the identical loop in SQL over the same decoded buckets.
@register(
    "exp_hist_signed_stdvar",
    _SIGNED_CTES
    + """, m AS (
  SELECT etype, round(sum(v), 2) / count(*) AS mean,
         CAST(count(*) AS DOUBLE) AS n
  FROM e GROUP BY etype
)
SELECT 'app_delta_exp' AS name, bb.etype,
       round(sum(cnt * pow(
         (CASE WHEN lower <= 0 AND upper >= 0 THEN 0.0
               ELSE sign(upper) * sqrt(upper * lower) END) - mean, 2))
         / any_value(n), 6) AS stdvar,
       round(sqrt(sum(cnt * pow(
         (CASE WHEN lower <= 0 AND upper >= 0 THEN 0.0
               ELSE sign(upper) * sqrt(upper * lower) END) - mean, 2))
         / any_value(n)), 6) AS stddev
FROM bb JOIN m USING (etype) GROUP BY bb.etype""",
)
def exp_hist_signed_stdvar(spark, sf_dir):
    from ..operators.exp_histogram import exp_histogram_stdvar_signed

    out = exp_histogram_stdvar_signed(
        _signed_buckets(spark, sf_dir),
        _signed_state(spark, sf_dir),
        ["name", "etype"],
    )
    return out.select(
        "name",
        "etype",
        F.round("h_stdvar", 6).alias("stdvar"),
        F.round("h_stddev", 6).alias("stddev"),
    )
