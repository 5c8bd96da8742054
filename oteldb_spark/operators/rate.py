"""PromQL rate family — counter-reset-aware, extrapolated, per step.

Reference: the SQL offload in ``chstorage/querier_metrics_rate.go:27-872``
implements Prometheus' ``extrapolatedRate`` (public semantics from the
Prometheus docs/source: prometheus/promql/functions.go) fully in the
storage engine.  This module is the same offload re-expressed as a
Spark plan:

1. **reset adjustment** (one pass, per series): ``lag`` window →
   wherever value drops, add the previous value to a running
   correction; ``adj = value + cum_correction`` is monotone.
2. **fan-out** each point to its steps (stepfanout.py).
3. **per (series, step) aggregate**: first/last adjusted value + ts,
   raw first value, count — all via min_by/max_by on the unique ts.
4. **extrapolation formula** as a plain column expression:
   extrapolate the observed increase to the window edges unless the
   gap exceeds 1.1× the average sample spacing (then half a spacing),
   with the counter zero-crossing cutoff.

Supported: rate, increase, delta, idelta, irate.
Needs ≥2 samples per window (Prometheus rule) — enforced by HAVING.

Scale note: the only shuffles are the per-series window (1) and the
groupBy (3); both hash on the series key, and AQE handles skewed
series.  The fan-out itself is a narrow generate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .stepfanout import fanout, fanout_join_sql


def with_reset_adjustment(
    points: DataFrame,
    series: list[str],
    value_col: str,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Add ``adj`` (reset-corrected monotone value) and ``prev_*`` cols."""
    w = Window.partitionBy(*series).orderBy(ts_col)
    prev = F.lag(F.col(value_col)).over(w)
    pts = (
        points.withColumn("__prev", prev)
        .withColumn("prev_ts_us", F.lag(F.col(ts_col)).over(w))
        .withColumn(
            "__drop",
            F.when(F.col(value_col) < F.col("__prev"), F.col("__prev")).otherwise(
                F.lit(0.0)
            ),
        )
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the running correction accumulates in DECIMAL: window sums of
    # doubles are NOT a left fold in every engine (DuckDB evaluates
    # window aggregates with segment trees, i.e. tree-order addition),
    # so float accumulation drifts by an ulp between engines at larger
    # SFs; decimal addition is exact in any order, and the single
    # decimal→double cast at the end is correctly rounded in both
    dec = "decimal(38,9)"
    pts = pts.withColumn(
        "__corr", F.sum(F.col("__drop").cast(dec)).over(wcum)
    )
    raw_dec = F.col(value_col).cast(dec)
    pts = pts.withColumn("adj", raw_dec + F.col("__corr"))
    return (
        pts.withColumn(
            "prev_adj",
            F.when(F.col("__prev").isNull(), F.lit(None))
            .when(F.col(value_col) < F.col("__prev"), F.col("adj") - raw_dec)
            .otherwise(
                F.col("adj") - raw_dec + F.col("__prev").cast(dec)
            ),
        )
        .withColumn("prev_raw", F.col("__prev"))
        .drop("__prev", "__drop", "__corr")
    )


def _extrapolated(
    grouped: DataFrame, *, range_us: int, is_counter: bool, is_rate: bool
) -> DataFrame:
    """Apply Prometheus extrapolation to per-window (first/last/n) aggs.

    Expects columns: step_us, n, first_ts, last_ts, first_adj,
    last_adj, first_raw.
    """
    range_s = range_us / 1e6
    e = {}
    # adj is decimal for counters (exact increment), raw double for
    # delta; the cast to double is a no-op for the latter
    e["raw_inc"] = (F.col("last_adj") - F.col("first_adj")).cast("double")
    dur_start = (F.col("first_ts") - (F.col("step_us") - F.lit(range_us))) / 1e6
    dur_end = (F.col("step_us") - F.col("last_ts")) / 1e6
    sampled = (F.col("last_ts") - F.col("first_ts")) / 1e6
    avg_spacing = sampled / (F.col("n") - 1)
    if is_counter:
        zero_cut = sampled * (F.col("first_raw") / e["raw_inc"])
        dur_start = F.when(
            (e["raw_inc"] > 0) & (F.col("first_raw") >= 0) & (zero_cut < dur_start),
            zero_cut,
        ).otherwise(dur_start)
    threshold = avg_spacing * 1.1
    extrap = (
        sampled
        + F.when(dur_start < threshold, dur_start).otherwise(avg_spacing / 2)
        + F.when(dur_end < threshold, dur_end).otherwise(avg_spacing / 2)
    )
    # keep the oracle's association: (inc * (extrap/sampled)) / range_s
    # — a different grouping rounds differently at the ulp level and
    # the 9-digit gate flips on larger inputs
    value = e["raw_inc"] * (extrap / sampled)
    if is_rate:
        value = value / F.lit(range_s)
    return grouped.withColumn("value", value)


def rate_family(
    points: DataFrame,
    op: str,
    *,
    series: list[str],
    value_col: str,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Evaluate rate/increase/delta/irate/idelta.

    Returns (series..., step_us, value)."""
    pts = with_reset_adjustment(points, series, value_col, ts_col)
    fanned = fanout(pts, start_us, end_us, step_us, range_us, ts_col)

    if op in ("rate", "increase", "delta"):
        is_counter = op != "delta"
        vcol = "adj" if is_counter else value_col
        g = (
            fanned.groupBy(*series, "step_us")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min(ts_col).alias("first_ts"),
                F.max(ts_col).alias("last_ts"),
                F.min_by(vcol, F.col(ts_col)).alias("first_adj"),
                F.max_by(vcol, F.col(ts_col)).alias("last_adj"),
                F.min_by(value_col, F.col(ts_col)).alias("first_raw"),
            )
            .filter(F.col("n") >= 2)
        )
        out = _extrapolated(
            g, range_us=range_us, is_counter=is_counter, is_rate=(op == "rate")
        )
        return out.select(*series, "step_us", "value")

    if op in ("irate", "idelta"):
        # last two samples of the window: take the latest point that has
        # a predecessor inside the window.
        g = fanned.groupBy(*series, "step_us").agg(
            F.max_by(
                F.struct(ts_col, "prev_ts_us", "adj", "prev_adj", value_col, "prev_raw"),
                F.col(ts_col),
            ).alias("lastp")
        )
        last = g.select(*series, "step_us", "lastp.*")
        in_win = last.filter(
            F.col("prev_ts_us").isNotNull()
            & (F.col("prev_ts_us") > F.col("step_us") - F.lit(range_us))
        )
        if op == "irate":
            value = (F.col("adj") - F.col("prev_adj")).cast("double") / (
                (F.col(ts_col) - F.col("prev_ts_us")) / 1e6
            )
        else:
            value = F.col(value_col) - F.col("prev_raw")
        return in_win.select(*series, "step_us", value.alias("value"))

    raise ValueError(f"unknown rate-family op {op!r}")


def resets_changes(
    points: DataFrame,
    op: str,  # resets | changes
    *,
    series: list[str],
    value_col: str,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    ts_col: str = "ts_us",
) -> DataFrame:
    """PromQL ``resets()`` / ``changes()``: count of counter resets /
    value changes between consecutive samples within each window.
    A pair counts when BOTH samples are inside the window — exact
    integer semantics, no extrapolation."""
    w = Window.partitionBy(*series).orderBy(ts_col)
    pts = points.withColumn("__prev", F.lag(F.col(value_col)).over(w)).withColumn(
        "prev_ts_us", F.lag(F.col(ts_col)).over(w)
    )
    if op == "resets":
        ind = F.col(value_col) < F.col("__prev")
    else:
        ind = F.col(value_col) != F.col("__prev")
    pts = pts.withColumn("__ind", F.when(ind, 1).otherwise(0))
    fanned = fanout(pts, start_us, end_us, step_us, range_us, ts_col)
    in_win = F.col("prev_ts_us").isNotNull() & (
        F.col("prev_ts_us") > F.col("step_us") - F.lit(range_us)
    )
    return fanned.groupBy(*series, "step_us").agg(
        F.sum(F.when(in_win, F.col("__ind")).otherwise(0))
        .cast("double")
        .alias("value")
    )


def deriv(
    points: DataFrame,
    *,
    series: list[str],
    value_col: str,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    ts_col: str = "ts_us",
) -> DataFrame:
    """PromQL ``deriv()``: least-squares slope per window (per-second).

    Computed from decomposable sums (n, Σt, Σy, Σty, Σt²) with t
    relative to the window start — one shuffle, codegen'd arithmetic.
    """
    fanned = fanout(points, start_us, end_us, step_us, range_us, ts_col)
    t = (F.col(ts_col) - (F.col("step_us") - F.lit(range_us))) / 1e6
    y = F.col(value_col)
    g = fanned.groupBy(*series, "step_us").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(t).alias("st"),
        F.sum(y).alias("sy"),
        F.sum(t * y).alias("sty"),
        F.sum(t * t).alias("stt"),
    )
    slope = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    return g.filter(F.col("n") >= 2).select(*series, "step_us", slope.alias("value"))


def predict_linear(
    points: DataFrame,
    *,
    series: list[str],
    value_col: str,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    horizon_s: float,
    ts_col: str = "ts_us",
    offset_us: int = 0,
) -> DataFrame:
    """PromQL ``predict_linear(v[r], t)``: least-squares extrapolation
    ``intercept + slope * (t_eval + horizon)`` with t relative to the
    window start (same sums as deriv).

    ``offset_us``: the selector's offset.  Upstream anchors the
    regression at the UNSHIFTED eval timestamp (functions.go
    funcPredictLinear uses enh.Ts) while these points arrive with
    offset-shifted timestamps, so the prediction time moves out by
    the offset — an offset selector extrapolates across the gap it
    created, exactly as Prometheus does."""
    fanned = fanout(points, start_us, end_us, step_us, range_us, ts_col)
    t = (F.col(ts_col) - (F.col("step_us") - F.lit(range_us))) / 1e6
    y = F.col(value_col)
    g = fanned.groupBy(*series, "step_us").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(t).alias("st"),
        F.sum(y).alias("sy"),
        F.sum(t * y).alias("sty"),
        F.sum(t * t).alias("stt"),
    )
    slope = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    intercept = (F.col("sy") - slope * F.col("st")) / F.col("n")
    # prediction time: horizon past the step (= window end), i.e.
    # t = range_s + horizon in window-relative coordinates (+ the
    # selector offset, see docstring)
    t_pred = F.lit(range_us / 1e6 + offset_us / 1e6 + horizon_s)
    return g.filter(F.col("n") >= 2).select(
        *series, "step_us", (intercept + slope * t_pred).alias("value")
    )


# --- DuckDB oracle -----------------------------------------------------------


def rate_family_oracle_sql(
    op: str,
    *,
    source: str,
    series_sql: list[str],
    value_col: str,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    round_digits: int = 6,
) -> str:
    """Emit the equivalent DuckDB SQL (same math, same expression
    order) for the rate family over ``source`` (a CTE name with
    columns series..., ts_us, value_col)."""
    range_s = range_us / 1e6
    sser = ", ".join(series_sql)
    # the correction accumulates in DECIMAL (exact in any order —
    # window sums of doubles are segment-tree-ordered here, a left
    # fold in Spark; see with_reset_adjustment)
    adj = f"""adjusted AS (
  SELECT {sser}, ts_us, {value_col} AS raw,
         lag({value_col}) OVER w AS prev_raw,
         lag(ts_us) OVER w AS prev_ts_us,
         CAST({value_col} AS DECIMAL(38,9))
           + coalesce(sum(CAST(CASE WHEN {value_col} < lagv THEN lagv
                                    ELSE 0 END AS DECIMAL(38,9)))
             OVER (PARTITION BY {sser} ORDER BY ts_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS adj
  FROM (
    SELECT *, lag({value_col}) OVER (PARTITION BY {sser} ORDER BY ts_us) AS lagv
    FROM {source}
  ) WINDOW w AS (PARTITION BY {sser} ORDER BY ts_us)
)"""
    # prev_adj = prev_raw + correction before this point's drop
    adj2 = f"""adjusted2 AS (
  SELECT *, CASE WHEN prev_raw IS NULL THEN NULL
                 WHEN raw < prev_raw THEN adj - CAST(raw AS DECIMAL(38,9))
                 ELSE adj - CAST(raw AS DECIMAL(38,9))
                        + CAST(prev_raw AS DECIMAL(38,9)) END AS prev_adj
  FROM adjusted
)"""
    fan = fanout_join_sql(
        "adjusted2", start_us, end_us, step_us, range_us, ts_col="ts_us"
    )

    if op in ("rate", "increase", "delta"):
        is_counter = op != "delta"
        vexpr = "adj" if is_counter else "raw"
        grouped = f"""g AS (
  SELECT {sser}, step_us,
         count(*) AS n,
         min(ts_us) AS first_ts,
         max(ts_us) AS last_ts,
         arg_min({vexpr}, ts_us) AS first_adj,
         arg_max({vexpr}, ts_us) AS last_adj,
         arg_min(raw, ts_us) AS first_raw
  FROM {fan}
  GROUP BY {sser}, step_us
  HAVING count(*) >= 2
)"""
        inc = "CAST(last_adj - first_adj AS DOUBLE)"
        zero = (
            """CASE WHEN {inc} > 0 AND first_raw >= 0
                AND ((last_ts - first_ts)/1e6) * (first_raw / {inc})
                    < (first_ts - (step_us - {range_us}))/1e6
           THEN ((last_ts - first_ts)/1e6) * (first_raw / {inc})
           ELSE (first_ts - (step_us - {range_us}))/1e6 END""".format(
                range_us=range_us, inc=inc
            )
            if is_counter
            else f"(first_ts - (step_us - {range_us}))/1e6"
        )
        rate_div = f" / {range_s!r}" if op == "rate" else ""
        body = f"""SELECT {sser}, step_us,
       {inc} *
       ((((last_ts - first_ts)/1e6)
         + CASE WHEN ({zero}) < (((last_ts - first_ts)/1e6) / (n - 1)) * 1.1
                THEN ({zero})
                ELSE (((last_ts - first_ts)/1e6) / (n - 1)) / 2 END
         + CASE WHEN ((step_us - last_ts)/1e6) < (((last_ts - first_ts)/1e6) / (n - 1)) * 1.1
                THEN ((step_us - last_ts)/1e6)
                ELSE (((last_ts - first_ts)/1e6) / (n - 1)) / 2 END)
        / ((last_ts - first_ts)/1e6)){rate_div} AS value
FROM g"""
        return f"{adj},\n{adj2},\n{grouped}\n{body}"

    if op in ("irate", "idelta"):
        grouped = f"""g AS (
  SELECT {sser}, step_us,
         arg_max(ts_us, ts_us) AS lts,
         arg_max(prev_ts_us, ts_us) AS pts,
         arg_max(adj, ts_us) AS ladj,
         arg_max(prev_adj, ts_us) AS padj,
         arg_max(raw, ts_us) AS lraw,
         arg_max(prev_raw, ts_us) AS praw
  FROM {fan}
  GROUP BY {sser}, step_us
)"""
        val = (
            "CAST(ladj - padj AS DOUBLE) / ((lts - pts)/1e6)"
            if op == "irate"
            else "lraw - praw"
        )
        body = f"""SELECT {sser}, step_us, {val} AS value
FROM g WHERE pts IS NOT NULL AND pts > step_us - {range_us}"""
        return f"{adj},\n{adj2},\n{grouped}\n{body}"

    raise ValueError(op)
