"""Measured scaling curves: per-gate warm seconds at the three
committed scale factors (sf0.001 / sf0.01 / sf0.1), fitted log-log
exponents, and a mechanical super-linear flag.

The 100×-scale story elsewhere in the repo rests on plan shape
(bucketed layouts, banded joins, pushdown asserts); this tool converts
it into a measured curve, the way the reference anchors its own claims
(``dev/local/embedded-bench/CROSS-ENGINE-REPORT.md:28-40``).

Gate set: every bench.py HEADLINE gate plus the heaviest sweep gates
(HEAVY below, the top of the r8 full-sweep timing table).  Per gate per
sf: pins released, cache cleared, best-of-2 warm runs (same protocol as
bench.py — cold single-run microbenchmarks mislead by 5-10×).

Exponent fit: local[32] gate times carry a large fixed overhead
(session round-trips, planning, Python bridge — ~0.2-0.5s) that at
these scales can exceed the data-dependent cost, so a raw log-log fit
under-reports growth.  Two estimates are recorded:

* ``slope_lsq`` — least-squares slope of log(t) vs log(sf) over the
  three points (the naive fit, kept for the record);
* ``exponent`` — the MARGINAL-cost exponent of the sf0.01→sf0.1
  decade after subtracting the sf0.001 time as the fixed-overhead
  proxy: log10((t3−t1)/(t2−t1)).  Defined only when the marginal
  costs are measurable (t2−t1 > MIN_MARGIN and t3−t1 > MIN_SPAN —
  below that the gate's data-dependent cost hasn't emerged from noise
  at these scales and no exponent is claimable).

Flag rule: ``exponent > FLAG_ABOVE`` (1.2).  A gate that is linear in
the data flags at ~1.0, the didactic quadratic tier at ~2 — the
committed allowlist (ALLOWED_SUPERLINEAR) is asserted against the
artifact by tests/test_scaling_curve.py.

Usage: python tools/scaling_curve.py [--out=SCALING_rN.json] [name...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIRS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]

# the heaviest full-sweep gates (VERIFY_r8 sf0.1 timing order) that are
# not already bench HEADLINE entries
HEAVY = [
    "stream_neardup_pairs",
    "logql_ip_filter",
    "traceql_nested_set_coords",
    "tql_parsed_max_duration",
    "tql_parsed_trace_duration",
    "tql_parsed_event_intrinsic",
    "tql_parsed_union",
    "tql_parsed_negation",
    "stream_span_interval_join",
    "logql_lineformat_parse",
    "tql_parsed_link_traceid",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_capped",
    "stream_sessionize_closed",
    "chunk_cdc_dedup",
]

MIN_MARGIN = 0.08  # s: below this the 0.001→0.01 marginal cost is noise
MIN_SPAN = 0.4  # s: data-dependent cost at sf0.1 must at least be this
FLAG_ABOVE = 1.2

# documented super-linear gates — the didactic exact n-gram Jaccard
# tier is the built-in positive control (quadratic by contract, with
# the certified scale-safe replacement dedup_jaccard_prefix)
ALLOWED_SUPERLINEAR = ["dedup_ngram_jaccard"]


def fit_lsq(xs: list[float], ys: list[float]) -> float:
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> int:
    args = sys.argv[1:]
    out_path = None
    names = []
    for a in args:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        else:
            names.append(a)

    import bench
    from oteldb_spark.operators.pin import release_pins
    from oteldb_spark.queries import QUERIES
    from oteldb_spark.session import get_spark

    gates = list(dict.fromkeys(bench.HEADLINE + HEAVY))
    if names:
        gates = [g for g in gates if any(f in g for f in names)]
    spark = get_spark("scaling-curve")

    # warm the JVM/codegen once (not timed), smallest sf
    QUERIES["tpch_q1"](spark, SF_DIRS[0][0]).count()

    results: dict[str, dict] = {}
    for name in gates:
        secs: dict[str, float] = {}
        for sf_dir, sf in SF_DIRS:
            release_pins()
            spark.catalog.clearCache()
            best = None
            for _ in range(2):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            secs[str(sf)] = round(best, 3)
        t1, t2, t3 = (secs[str(sf)] for _, sf in SF_DIRS)
        slope_lsq = round(
            fit_lsq(
                [math.log10(sf) for _, sf in SF_DIRS],
                [math.log10(max(t, 1e-3)) for t in (t1, t2, t3)],
            ),
            3,
        )
        exponent = None
        if (t2 - t1) > MIN_MARGIN and (t3 - t1) > MIN_SPAN:
            exponent = round(math.log10((t3 - t1) / (t2 - t1)), 3)
        flagged = exponent is not None and exponent > FLAG_ABOVE
        results[name] = {
            "seconds": secs,
            "slope_lsq": slope_lsq,
            "exponent": exponent,
            "flagged": flagged,
        }
        print(
            f"{name:36s} {t1:7.3f} {t2:7.3f} {t3:7.3f}  "
            f"lsq={slope_lsq:6.3f} exp={exponent if exponent is not None else '   -'}"
            f"{'  ** SUPER-LINEAR' if flagged else ''}"
        )

    flagged = sorted(n for n, r in results.items() if r["flagged"])
    print(f"\nflagged super-linear: {flagged or 'none'}")
    print(f"allowlist:            {ALLOWED_SUPERLINEAR}")
    doc = {
        "sfs": [sf for _, sf in SF_DIRS],
        "protocol": "warm best-of-2 per gate per sf, pins released and "
        "cache cleared between gates; exponent = marginal-cost "
        "log-log slope of the 0.01->0.1 decade with the sf0.001 "
        "time as fixed-overhead proxy",
        "min_margin_s": MIN_MARGIN,
        "min_span_s": MIN_SPAN,
        "flag_above": FLAG_ABOVE,
        "partial": bool(names),
        "gates": results,
        "flagged": flagged,
        "allowlist": ALLOWED_SUPERLINEAR,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {out_path}")
    unexpected = [n for n in flagged if n not in ALLOWED_SUPERLINEAR]
    return 1 if unexpected else 0


if __name__ == "__main__":
    raise SystemExit(main())
