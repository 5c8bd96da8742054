"""PromQL front-end: parser + DataFrame compiler.

The reference delegates PromQL evaluation to a vectorized external
engine and implements the storage seam + SQL offloads
(``internal/promql/promql.go``, ``chstorage/querier_metrics*.go``).
Here the whole evaluation compiles to DataFrame plans: selectors are
filters + staleness-lookback last_over_time, the rate family is the
counter-reset window plan (operators/rate.py), aggregations and vector
matching reuse the shared step machinery.
"""

from .parser import parse  # noqa: F401
from .compiler import MetricSource, PromParams, compile_promql  # noqa: F401
