"""Independent referee for the Prometheus numeric semantics.

The oracle-gate pairs (Spark plan + DuckDB SQL) are written together,
so a shared misreading of the spec would pass both.  These tests add a
THIRD, independent statement: a direct pure-Python transcription of
the upstream algorithms (prometheus/promql/functions.go
extrapolatedRate, promql/quantile.go histogramStdDev) evaluated
sample-by-sample, diffed against the Spark operators AND the DuckDB
oracle SQL on the same data.  Agreement of all three is the closest
available anchor to the real-Prometheus compliance diff the reference
runs (no live Prometheus exists in this environment).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from oteldb_spark.operators.rate import rate_family, rate_family_oracle_sql

STEP_US = 60_000_000  # 1m
RANGE_US = 300_000_000  # 5m
START_US = 1_700_000_000_000_000
END_US = START_US + 10 * STEP_US


def extrapolated_rate_referee(samples, window_start_us, window_end_us,
                              *, is_counter, is_rate):
    """Direct loop transcription of promql/functions.go
    extrapolatedRate — intentionally NOT sharing any code or algebra
    with the Spark/SQL implementations."""
    if len(samples) < 2:
        return None
    result = samples[-1][1] - samples[0][1]
    if is_counter:
        prev = samples[0][1]
        for _, v in samples[1:]:
            if v < prev:
                result += prev
            prev = v
    first_ts, last_ts = samples[0][0], samples[-1][0]
    duration_to_start = (first_ts - window_start_us) / 1e6
    duration_to_end = (window_end_us - last_ts) / 1e6
    sampled_interval = (last_ts - first_ts) / 1e6
    avg_between = sampled_interval / (len(samples) - 1)
    if is_counter and result > 0 and samples[0][1] >= 0:
        duration_to_zero = sampled_interval * (samples[0][1] / result)
        if duration_to_zero < duration_to_start:
            duration_to_start = duration_to_zero
    threshold = avg_between * 1.1
    extrapolate_to = sampled_interval
    extrapolate_to += (
        duration_to_start if duration_to_start < threshold else avg_between / 2
    )
    extrapolate_to += (
        duration_to_end if duration_to_end < threshold else avg_between / 2
    )
    factor = extrapolate_to / sampled_interval
    if is_rate:
        factor /= (window_end_us - window_start_us) / 1e6
    return result * factor


def _series():
    """Two series: irregular spacing, counter resets, a sparse tail."""
    rows = []
    # series a: resets at i=4 and i=11, jittered spacing
    v = 0.0
    for i in range(16):
        ts = START_US + i * 37_000_000 + (i % 3) * 5_000_000
        if i in (4, 11):
            v = 1.0  # reset
        else:
            v += 3.0 + (i % 5)
        rows.append(("a", ts, v))
    # series b: sparse, no resets
    for i in range(7):
        ts = START_US + i * 83_000_000
        rows.append(("b", ts, 10.0 * i))
    return rows


@pytest.mark.parametrize("op", ["rate", "increase", "delta"])
def test_rate_family_matches_referee_and_oracle(spark, op):
    rows = _series()
    df = spark.createDataFrame(rows, "s string, ts_us long, v double")
    got = {
        (r.s, r.step_us): r.value
        for r in rate_family(
            df,
            op,
            series=["s"],
            value_col="v",
            start_us=START_US,
            end_us=END_US,
            step_us=STEP_US,
            range_us=RANGE_US,
        ).collect()
    }

    # referee: evaluate every step window directly
    want = {}
    for sname in ("a", "b"):
        samples_all = sorted((ts, v) for s, ts, v in rows if s == sname)
        step = START_US
        while step <= END_US:
            win = [
                (ts, v)
                for ts, v in samples_all
                if step - RANGE_US < ts <= step
            ]
            r = extrapolated_rate_referee(
                win,
                step - RANGE_US,
                step,
                is_counter=(op != "delta"),
                is_rate=(op == "rate"),
            )
            if r is not None:
                want[(sname, step)] = r
            step += STEP_US

    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9, abs=1e-12), (op, k)

    # DuckDB oracle on the same rows: the third independent engine
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (VALUES " +
                ",".join(f"('{s}', {ts}, {v!r})" for s, ts, v in rows) +
                ") t(s, ts_us, v)")
    sql = rate_family_oracle_sql(
        op,
        source="pts",
        series_sql=["s"],
        value_col="v",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
    )
    oracle = {
        (s, int(step)): val
        for s, step, val in con.execute("WITH " + sql).fetchall()
    }
    assert set(oracle) == set(want)
    for k, v in want.items():
        assert oracle[k] == pytest.approx(v, rel=1e-9, abs=1e-12), (op, k)


def histogram_stddev_referee(buckets, total_sum, total_count):
    """Loop transcription of promql/quantile.go histogramStdDev for
    positive scale-0 buckets: mass at sqrt(lower·upper), deviations
    around mean = sum/count."""
    mean = total_sum / total_count
    variance = 0.0
    for e, cnt in buckets:  # bucket (2^(e-1), 2^e]
        val = math.sqrt((2.0 ** (e - 1)) * (2.0 ** e))
        delta = val - mean
        variance += cnt * delta * delta
    variance /= total_count
    return math.sqrt(variance), variance


def test_hist_stdvar_expansion_equals_upstream_loop():
    """The gate computes Σcnt·val²/n − 2·mean·Σcnt·val/n + mean² over
    exact integer scaled moments; prove the algebra equals the
    upstream deviation loop on an uneven bucket set."""
    buckets = [(-2, 3), (0, 10), (1, 7), (4, 2), (9, 1)]
    n = sum(c for _, c in buckets)
    tsum = 137.25
    stddev_ref, stdvar_ref = histogram_stddev_referee(buckets, tsum, n)

    s1 = sum(c * 2 ** (e + 6) for e, c in buckets)
    s2 = sum(c * 2 ** (2 * e + 12) for e, c in buckets)
    mean = tsum / n
    ex2 = s2 / (n * 8192.0)
    ex = s1 / (n * 64.0 * math.sqrt(2.0))
    var = ex2 - 2.0 * mean * ex + mean * mean
    assert var == pytest.approx(stdvar_ref, rel=1e-12)
    assert math.sqrt(var) == pytest.approx(stddev_ref, rel=1e-12)
