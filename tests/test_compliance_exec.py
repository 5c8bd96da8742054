"""Compliance corpora EXECUTED through the engine facades (not just
parsed): every entry of the reference's promql/logql compliance query
sets runs against sf0.001 and its canonical result fingerprint is
diffed against recorded goldens — execution-level drift detection, the
analog of the reference's compliance-tester gates
(``internal/promcompliance``, ``internal/lokicompliance``).

Regenerate goldens after an intentional semantics change:
    python tools/gen_compliance_goldens.py
"""

from __future__ import annotations

import json
import os

import pytest

from oteldb_spark.compliance import LOGQL_CORPUS, PROMQL_CORPUS, run_all

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "compliance")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(PROMQL_CORPUS) and os.path.exists(LOGQL_CORPUS)),
    reason="reference compliance corpora not available",
)


@pytest.fixture(scope="module")
def results(spark):
    return run_all(spark, "/root/testdata/sf0.001")


def _golden(fam: str) -> list[dict]:
    with open(os.path.join(GOLDEN_DIR, f"{fam}.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("fam", ["promql", "logql"])
def test_corpus_executes(results, fam):
    recs = results[fam]
    executed = [r for r in recs if r["status"] in ("ok", "empty", "xfail")]
    frac = len(executed) / len(recs)
    errors = [r for r in recs if r["status"] == "error"]
    assert frac >= 0.9, (
        f"{fam}: only {frac:.0%} of corpus executes; first errors: "
        + "; ".join(f"{r['query']!r}: {r['error']}" for r in errors[:5])
    )
    # a meaningful share must return data, not just run
    nonempty = sum(r["status"] == "ok" for r in recs)
    assert nonempty >= len(recs) // 3


@pytest.mark.parametrize("fam", ["promql", "logql"])
def test_corpus_matches_goldens(results, fam):
    golden = {r["idx"]: r for r in _golden(fam)}
    drift = []
    for r in results[fam]:
        g = golden.get(r["idx"])
        if g is None:
            drift.append((r["idx"], "new entry", r["query"]))
            continue
        if (r["status"], r.get("hash")) != (g["status"], g.get("hash")):
            drift.append((r["idx"], f"{g['status']}→{r['status']}", r["query"]))
    assert not drift, f"{fam}: {len(drift)} drifted: {drift[:8]}"
