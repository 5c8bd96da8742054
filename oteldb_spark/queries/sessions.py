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
from .registry import register

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
