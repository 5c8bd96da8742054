"""Sessionization — gap-based session windows over the events stream.

The batch formulation (both engines, exact): a session break is a
>30-minute gap between consecutive events of a user; session id =
running count of breaks.  The streaming formulation with
``applyInPandasWithState`` lives in streaming/sessionize.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..signals import LOGS_CTE, logs_frame, with_ctes
from ..tables import load
from .registry import START_US, register

GAP_US = 30 * 60 * 1_000_000


@register(
    "events_sessionize",
    with_ctes(
        LOGS_CTE,
        f"""marked AS (
  SELECT user_id, ts_us, value,
         CASE WHEN ts_us - lag(ts_us) OVER w > {GAP_US} THEN 1 ELSE 0 END
           AS brk
  FROM logs
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
)""",
        """sessions AS (
  SELECT user_id, ts_us, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM marked
)""",
        body="""SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts_us) AS BIGINT) AS session_start_us,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_value
FROM sessions GROUP BY user_id, session_id""",
    ),
)
def events_sessionize(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us")
    marked = logs.withColumn(
        "brk",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > GAP_US, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = marked.withColumn("session_id", F.sum("brk").over(cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts_us").cast("long").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
            "total_value"
        ),
    )


# as-of join (build-brief named operator): attribute every purchase
# to the user's most recent signup at or before it.  Spark side is
# the union-tag + window shape (operators/asof.py — one shuffle,
# linear); the oracle is DuckDB's native ASOF LEFT JOIN.
@register(
    "events_asof_join",
    """SELECT p.event_id, p.user_id,
       epoch_ns(p.ts) AS ts_ns, epoch_ns(s.ts) AS signup_ts_ns
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts""",
)
def events_asof_join(spark, sf_dir):
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("ts_ns")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("ts_ns"), F.col("ts").alias("signup_ts")
    )
    out = asof_join(
        purchases,
        signups,
        on=["user_id"],
        ts_col="ts_ns",
        value_cols=["signup_ts"],
        suffix="",
    )
    return out.select(
        "event_id", "user_id", "ts_ns", F.col("signup_ts").alias("signup_ts_ns")
    )


# range join (build-brief named operator): count events inside
# synthesized maintenance windows with NO equality key.  The
# scale-correct shape is time-bin bucketing: explode each window
# into the 6h bins it overlaps, join events on their bin (an
# equality hash join), then filter exact containment — candidate
# volume is events-per-bin x windows-per-bin instead of the
# cartesian events x windows a naive theta join scans.
_WIN_LEN_US = 4 * 3_600_000_000  # 4h windows on a 26h stride
_WIN_STRIDE_US = 26 * 3_600_000_000
_BIN_US = 6 * 3_600_000_000


@register(
    "events_range_join",
    f"""WITH windows AS (
  SELECT CAST(w AS BIGINT) AS w_id,
         {START_US} + w * {_WIN_STRIDE_US} AS w_start,
         {START_US} + w * {_WIN_STRIDE_US} + {_WIN_LEN_US} AS w_end
  FROM (SELECT unnest(generate_series(0, 26)) AS w)
)
SELECT w_id, CAST(count(*) AS BIGINT) AS n_events
FROM windows w JOIN events e
  ON epoch_us(e.ts) >= w.w_start AND epoch_us(e.ts) < w.w_end
GROUP BY w_id""",
)
def events_range_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        F.expr("ts div 1000").alias("ts_us")
    )
    windows = spark.range(27).select(
        F.col("id").alias("w_id"),
        (F.lit(START_US) + F.col("id") * _WIN_STRIDE_US).alias("w_start"),
        (
            F.lit(START_US) + F.col("id") * _WIN_STRIDE_US + _WIN_LEN_US
        ).alias("w_end"),
    )
    # explode each window into the bins it overlaps
    w_bins = windows.select(
        "w_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                (F.col("w_start") / _BIN_US).cast("long"),
                ((F.col("w_end") - 1) / _BIN_US).cast("long"),
            )
        ).alias("bin"),
    )
    e_bins = ev.withColumn("bin", (F.col("ts_us") / _BIN_US).cast("long"))
    return (
        e_bins.join(F.broadcast(w_bins), "bin")
        .filter(
            (F.col("ts_us") >= F.col("w_start"))
            & (F.col("ts_us") < F.col("w_end"))
        )
        .groupBy("w_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# hypertable rollup cascade (build-brief named operator): the 6h
# rollup is built FROM the 1h rollup, not from raw events — the
# continuous-aggregate cascade that makes coarse granularities cost
# |fine rollup| instead of |raw|.  Sums/counts compose exactly; avg
# is derived at the end from the composed sums.
# the composed average is computed ENTIRELY in integer math: values
# carry two decimals, so avg = V/(100·n) with V = Σvalue·100 an exact
# integer, and round-half-up to 6 decimals is (V·20000 + n) div (2n).
# Anything float-typed here eventually lands a knife-edge tie (Spark
# rounds the shortest-decimal rendering, DuckDB the exact binary —
# they break .xxxxxx5 ties differently).
@register(
    "events_rollup_cascade",
    """SELECT t6, event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST((CAST(sum(v_sum) * 100 AS HUGEINT) * 20000 + sum(n))
            // (2 * sum(n)) AS BIGINT) / 1e6 AS avg_value
FROM (
  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS t1,
         ((epoch_us(ts) // 3600000000) // 6) * 6 * 3600000000 AS t6,
         event_type, count(*) AS n,
         sum(CAST(value AS DECIMAL(18,2))) AS v_sum
  FROM events GROUP BY 1, 2, 3
) GROUP BY t6, event_type""",
)
def events_rollup_cascade(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    hour = F.expr("(ts div 1000 div 3600000000) * 3600000000")
    r1h = (
        ev.select(
            hour.alias("t1"),
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("value"),
        )
        .groupBy("t1", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v_sum"))
    )
    return (
        r1h.withColumn("t6", F.expr("(t1 div 3600000000 div 6) * 6 * 3600000000"))
        .groupBy("t6", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            # scaled numerator stays DECIMAL(38,0) (Spark) / HUGEINT
            # (oracle): a BIGINT intermediate silently wraps once the
            # per-group value sum passes ~4.6e12 — plausible at 100 TB.
            # Only the (small) quotient is cast back.  Half-up identity
            # assumes non-negative sums (events.value ≥ 0 by contract).
            (
                F.expr(
                    "(CAST(sum(v_sum) * 100 AS DECIMAL(38,0)) * 20000"
                    " + sum(n)) div (2 * sum(n))"
                )
                / F.lit(1e6)
            ).alias("avg_value"),
        )
    )
