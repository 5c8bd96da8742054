"""oteldb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of oteldb/oteldb (an OpenTelemetry-first
observability database: LogQL / PromQL / TraceQL / ProfileQL over
logs / metrics / traces / profiles).

Design: every query language compiles straight to PySpark DataFrame
plans over columnar Parquet/Delta tables.  There is no iterator engine
and no custom physical layer — Catalyst provides predicate pushdown,
column pruning, join selection and AQE; the only hand-built physical
patterns are the step-fanout spine used by all ``*_over_time``
operators and the counter-reset-aware rate windows.

Package map:
  session    — SparkSession factory tuned for local[N] and cluster use
  tables     — testdata table loaders / temp-view registration
  signals    — signal-model adapters (events→logs/metrics, orders→traces)
  operators/ — step fanout, range & vector aggregation, binary ops,
               rate family, dedup, similarity, text analysis
  functions/ — scalar helpers (durations, bytes, labels, hashing)
  logql/ promql/ traceql/ — parsers + DataFrame compilers
  sources/ streaming/     — batch & Structured Streaming ingest
  queries/   — driver-facing query registry bound to /root/testdata
"""

__version__ = "0.1.0"
