"""Referee sweep over the registered parsed-gate families.

The driver's DuckDB oracle certifies each ``lql_parsed_*`` /
``ppql_parsed_*`` gate; this tool adds a THIRD, independent
implementation: the pure-Python LogQL / PromQL referees
(``oteldb_spark/logql_referee.py`` / ``referee.py`` — transcriptions
of the upstream Loki/Prometheus evaluation loops) evaluate the same
expressions over the same rows and must agree with the Spark engine
point-by-point.  ``tests/test_referee_gates.py`` folds the sweep into
pytest and requires every gate to land in {match, both_error} or the
documented EXCLUDED list.

Run standalone:  python tools/referee_gates.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# gate name -> (front-end, expression).  Expressions are transcribed
# from the gate registrations (oteldb_spark/queries/*.py); the
# completeness assert in run_sweep keeps this table in lockstep with
# the registry.  "logql+value" runs with the numeric `value` column
# exposed as a label on both sides (the unwrap gates need it).
GATE_EXPRS: dict[str, tuple[str, str]] = {
    # --- logql_parsed.py -------------------------------------------------
    "lql_parsed_pipeline": (
        "logql",
        '{env="prod"} |= `"k": 7` | json k="k" | k >= 50',
    ),
    "lql_parsed_count": (
        "logql",
        'sum by (service, level) (count_over_time({env="prod"}[12h]))',
    ),
    "lql_parsed_rate": ("logql", 'sum by (service) (rate({env="prod"}[12h]))'),
    "lql_parsed_topk": (
        "logql",
        'topk(3, sum by (service, level) (count_over_time({env="prod"}[12h])))',
    ),
    "lql_parsed_binop": (
        "logql",
        'sum by (service) (count_over_time({level="ERROR"}[12h]))'
        " / sum by (service) (count_over_time({}[12h]))",
    ),
    "lql_parsed_quantile": (
        "logql+value",
        'quantile_over_time(0.9, {env="prod"} | unwrap value [12h]) by (service)',
    ),
    "lql_parsed_scalar_mul": (
        "logql",
        'sum by (service) (rate({level="ERROR"}[12h])) * 100',
    ),
    "lql_parsed_line_format_fns": (
        "logql",
        '{env="prod"} | json k="k" | line_format '
        '`{{ printf "%s|%s" .service .level }}'
        " k={{ .k | alignRight 4 }} {{ .level | lower | trunc 2 }}`",
    ),
    "lql_parsed_label_format_tmpl": (
        "logql",
        '{env="prod"} | label_format lvl=`{{ .level | lower | trunc 2 }}`',
    ),
    # --- logql_parsers.py ------------------------------------------------
    # gate runs over a bespoke logfmt frame; the sweep runs the same
    # expression over the standard corpus — semantics, not fixtures,
    # are what the referee checks
    "lql_parsed_logfmt": ("logql", "{} | logfmt took, user | took > 300ms"),
    # --- misc_ext.py -----------------------------------------------------
    "lql_parsed_vector_literal": ("logql", "vector(7) * 3"),
    "lql_parsed_offset": (
        "logql",
        'sum by (service) (count_over_time({env="prod"}[12h] offset 1d))',
    ),
    "lql_parsed_without": (
        "logql",
        "max without (level) (sum by (service, level)"
        ' (count_over_time({env="prod"}[12h])))',
    ),
    # --- coverage_ext.py -------------------------------------------------
    "lql_parsed_vector_avg": (
        "logql",
        'avg by (level) (sum by (service, level) (count_over_time({env="prod"}[12h])))',
    ),
    "lql_parsed_vector_count": (
        "logql",
        'count(sum by (service, level) (count_over_time({env="prod"}[12h])))',
    ),
    "lql_parsed_binop_and": (
        "logql",
        'sum by (service) (count_over_time({level="ERROR"}[12h]))'
        ' and sum by (service) (count_over_time({level="DEBUG", env="staging"}[12h]))',
    ),
    "lql_parsed_binop_or": (
        "logql",
        'sum by (service) (count_over_time({level="ERROR"}[12h]))'
        ' or sum by (service) (count_over_time({level="DEBUG", env="staging"}[12h]))',
    ),
    "lql_parsed_keep": ("logql", '{level="ERROR"} | keep service'),
    "lql_parsed_rate_counter": (
        "logql+value",
        'rate_counter({env="prod"} | unwrap value [12h]) by (service)',
    ),
    # --- promql_parsed.py ------------------------------------------------
    "ppql_parsed_rate": ("promql", 'rate(events_value_total{mtype="error"}[12h])'),
    "ppql_parsed_sum_increase": (
        "promql",
        "sum by (instance) (increase(events_value_total[12h])) / 1000",
    ),
    "ppql_parsed_instant": ("promql", "events_gauge"),
    "ppql_parsed_topk": (
        "promql",
        "topk(3, sum by (instance) (count_over_time(events_gauge[12h])))",
    ),
    "ppql_parsed_cmp_filter": ("promql", "count_over_time(events_gauge[12h]) > 5"),
    "ppql_parsed_sqrt": ("promql", "sqrt(count_over_time(events_gauge[12h]))"),
    "ppql_parsed_group_left": (
        "promql",
        "sum by (mtype, instance) (count_over_time(events_gauge[12h]))"
        " / on (mtype) group_left"
        " sum by (mtype) (count_over_time(events_gauge[12h]))",
    ),
    # --- promql_fns.py ---------------------------------------------------
    "ppql_parsed_predict_linear": (
        "promql",
        "predict_linear(events_counter_total[12h], 3600)",
    ),
    "ppql_parsed_at": ("promql", "events_gauge @ 1705363200"),
    "ppql_parsed_hour": ("promql", "hour()"),
    # --- promql_fns2.py --------------------------------------------------
    "ppql_parsed_timestamp": ("promql", "timestamp(events_gauge)"),
    "ppql_parsed_year": ("promql", "year()"),
    "ppql_parsed_day_of_year": ("promql", "day_of_year()"),
    "ppql_parsed_days_in_month": ("promql", "days_in_month()"),
    "ppql_parsed_trig": (
        "promql",
        "deg(atan(sin(count_over_time(events_gauge[12h]))))",
    ),
    "ppql_parsed_smoothing": (
        "promql",
        "double_exponential_smoothing(events_gauge[12h], 0.4, 0.3)",
    ),
    "ppql_parsed_at_end": ("promql", "events_gauge @ end()"),
    "ppql_parsed_at_start": ("promql", "events_gauge @ start()"),
    "ppql_parsed_sort_desc": ("promql", "sort_desc(count_over_time(events_gauge[12h]))"),
    "ppql_parsed_mad": ("promql", "mad_over_time(events_gauge[12h])"),
    "ppql_parsed_sort_by_label": ("promql", 'sort_by_label(events_gauge, "instance")'),
    "ppql_parsed_absent": ("promql", 'absent(events_gauge{instance="no-such-host"})'),
    # --- promql_fns3.py --------------------------------------------------
    "ppql_parsed_ts_of_max": ("promql", "ts_of_max_over_time(events_gauge[12h])"),
    "ppql_parsed_ts_of_min": ("promql", "ts_of_min_over_time(events_gauge[12h])"),
    "ppql_parsed_ts_of_last": ("promql", "ts_of_last_over_time(events_gauge[12h])"),
    "ppql_parsed_count_at_end": (
        "promql",
        "count_over_time(events_gauge[12h] @ end())",
    ),
    # --- misc_ext.py / coverage_ext.py (PromQL) --------------------------
    "ppql_parsed_quantile_agg": (
        "promql",
        "quantile by (mtype) (0.75, count_over_time(events_gauge[12h]))",
    ),
    "ppql_parsed_count_values": (
        "promql",
        'count_values("n", count_over_time(events_gauge[12h]))',
    ),
    "ppql_parsed_label_join": (
        "promql",
        'label_join(count_over_time(events_gauge[12h]), "series", "/",'
        ' "mtype", "instance")',
    ),
    "ppql_parsed_group": (
        "promql",
        "group by (mtype) (count_over_time(events_gauge[12h]))",
    ),
}

# gates the two main referees cannot evaluate, with where their
# third-implementation coverage lives instead
EXCLUDED: dict[str, str] = {
    # events_hist is an exponential-histogram metric; the float-sample
    # referee has no native-histogram state.  The decode/stddev/stdvar
    # math is referee'd at the function level by the upstream-loop
    # transcriptions in tests/test_prom_referee.py.
    "ppql_parsed_hist_count": "native-histogram: function-level referee (test_prom_referee.py)",
    "ppql_parsed_hist_sum": "native-histogram: function-level referee (test_prom_referee.py)",
    "ppql_parsed_hist_stddev": "native-histogram: function-level referee (test_prom_referee.py)",
    "ppql_parsed_hist_fraction": "native-histogram: function-level referee (test_prom_referee.py)",
    "ppql_parsed_hist_quantile_native": "native-histogram: function-level referee (test_prom_referee.py)",
    "ppql_parsed_hist_count_rate": "native-histogram: function-level referee (test_prom_referee.py)",
    "ppql_parsed_hist_quantile_rate": "native-histogram: function-level referee (test_prom_referee.py)",
    "ppql_parsed_hist_sum_quantile": "native-histogram: function-level referee (test_prom_referee.py)",
    "ppql_parsed_hist_sum_count_rate": "native-histogram: function-level referee (test_prom_referee.py)",
    # info() joins a separate info-metric frame the referee model
    # (flat float series) does not carry
    "ppql_parsed_info": "needs info_df side frame; engine behavior pinned by its oracle gate",
}


def _logql_engine(spark, sf_dir, with_value: bool):
    from oteldb_spark.engine import LogQLEngine
    from oteldb_spark.logql import LogSource
    from oteldb_spark.signals import logs_frame

    labels = {"service": "service", "env": "env", "level": "level"}
    if with_value:
        labels["value"] = "value"
    return LogQLEngine(LogSource(df=logs_frame(spark, sf_dir), label_cols=labels))


def _logql_referee(spark, sf_dir, with_value: bool):
    from oteldb_spark.logql_referee import LogQLReferee, LogRow
    from oteldb_spark.signals import logs_frame

    rows = []
    for r in logs_frame(spark, sf_dir).collect():
        labels = {
            "service": r["service"],
            "env": r["env"],
            "level": r["level"],
        }
        if with_value:
            labels["value"] = repr(float(r["value"]))
        rows.append(LogRow(r["ts_us"], r["body"], labels))
    return LogQLReferee(rows)


def _promql_engine(spark, sf_dir, lookback_us: int):
    from oteldb_spark.engine import PromQLEngine
    from oteldb_spark.promql import MetricSource
    from oteldb_spark.signals import counter_points_frame

    return PromQLEngine(
        MetricSource(
            df=counter_points_frame(spark, sf_dir),
            metrics={
                "events_gauge": "gauge",
                "events_value_total": "counter_mod",
                "events_counter_total": "counter",
            },
            label_cols=["mtype", "instance"],
        ),
        lookback_us=lookback_us,
    )


def run_sweep(spark, sf_dir: str):
    """Run every parsed gate through engine + referee; returns
    {name: (classification, detail)}."""
    from oteldb_spark.logql_referee import compare_logql_entry
    from oteldb_spark.queries import QUERIES
    from oteldb_spark.queries.registry import END_US, RANGE_US, START_US, STEP_US
    from oteldb_spark.referee import build_referee, compare_corpus_entry

    registered = {
        n for n in QUERIES if n.startswith(("lql_parsed_", "ppql_parsed_"))
    }
    covered = set(GATE_EXPRS) | set(EXCLUDED)
    assert registered == covered, (
        f"sweep table drift: missing={sorted(registered - covered)} "
        f"stale={sorted(covered - registered)}"
    )

    leng = _logql_engine(spark, sf_dir, with_value=False)
    lref = _logql_referee(spark, sf_dir, with_value=False)
    leng_v = _logql_engine(spark, sf_dir, with_value=True)
    lref_v = _logql_referee(spark, sf_dir, with_value=True)
    peng = _promql_engine(spark, sf_dir, RANGE_US)
    pref = build_referee(spark, sf_dir, RANGE_US, include_counter=True)

    results = {}
    for name, (lang, expr) in sorted(GATE_EXPRS.items()):
        if lang.startswith("logql"):
            e = leng_v if lang == "logql+value" else leng
            r = lref_v if lang == "logql+value" else lref
            results[name] = compare_logql_entry(
                e, r, expr, START_US, END_US, STEP_US
            )
        else:
            results[name] = compare_corpus_entry(
                peng, pref, expr, START_US, END_US, STEP_US
            )
    return results


def main():
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    results = run_sweep(spark, sf_dir)
    agreed = 0
    for name, (cls, detail) in sorted(results.items()):
        mark = "ok  " if cls in ("match", "both_error") else "DIFF"
        if cls in ("match", "both_error"):
            agreed += 1
        print(f"{mark}  {name}: {cls} {detail[:160]}")
    for name, why in sorted(EXCLUDED.items()):
        print(f"skip  {name}: {why}")
    print(f"\n{agreed}/{len(results)} refereed gates agree "
          f"({len(EXCLUDED)} excluded with documented coverage)")


if __name__ == "__main__":
    main()
