"""Record compliance-corpus execution goldens.

Runs both corpora through the engine facades at sf0.001 and writes
per-entry fingerprints to tests/golden/compliance_{promql,logql}.json.
Re-run after an INTENTIONAL semantics change; the pytest gate
(tests/test_compliance_exec.py) diffs live runs against these files.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oteldb_spark.compliance import run_all  # noqa: E402
from oteldb_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "compliance"
)


def main() -> None:
    res = run_all(get_spark(), SF_DIR)
    for fam, recs in res.items():
        path = os.path.join(OUT_DIR, f"{fam}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(recs, f, indent=1, sort_keys=True)
        ok = sum(r["status"] in ("ok", "empty", "xfail") for r in recs)
        print(f"{fam}: {ok}/{len(recs)} executed → {path}")


if __name__ == "__main__":
    main()
