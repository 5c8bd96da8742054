"""Print plan facts for the headline queries — the `.explain` loop the
build brief asks for.  Usage: python tools/explain_audit.py [names...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from oteldb_spark.plans.audit import audit  # noqa: E402
from oteldb_spark.queries import QUERIES  # noqa: E402
from oteldb_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "logql_selector",
    "logql_count_over_time",
    "logql_topk",
    "promql_rate",
    "traceql_structural_child",
    "tpch_q1",
    "tpch_revenue_by_nation",
    "dedup_minhash_lsh",
    "ann_ivf_kmeans_top5",
    "ann_near_dup_pairs",
    "hist_native_stdvar",
    "text_keyword_top1",
    "prw_ingest_points",
    "tql_parsed_ancestor_op",
    "pipeline_curation",
    "dedup_components",
    "pipeline_decontaminate",
    "pipeline_pack_sequences",
    "promql_rate_cached",
    # round-3 additions
    "otlp_pb_ingest_points",
    "tql_parsed_childcount",
    "ppql_parsed_info",
    "exp_hist_signed_median",
    "ppql_parsed_ts_of_max",
    "tql_parsed_metrics_topk",
]


def main():
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("explain-audit")
    sf = "/root/testdata/sf0.01"
    for name in names:
        df = QUERIES[name](spark, sf)
        facts = audit(df)
        print(f"== {name}")
        print(f"   exchanges={facts.n_exchanges} broadcasts={facts.n_broadcasts}"
              f" codegen={facts.n_codegen_spans}")
        for p in facts.pushed_filters[:4]:
            print(f"   pushed: {p[:120]}")
        for s in facts.read_schemas[:4]:
            print(f"   schema: {s[:120]}")
        if "--full" in sys.argv:
            print(facts.text)


if __name__ == "__main__":
    main()
