"""The committed scaling artifact's super-linear flag set must be
exactly the documented allowlist — the brute-force all-pairs ANN
baseline, the ARCHITECTURAL positive control (O(n²·D) by construction,
value-independent).  Any other gate flagging means a scale regression
slipped in; the control not flagging means the rule lost detection
power.  The didactic ``dedup_ngram_jaccard`` is quadratic BY CONTRACT
but value-coupled (its shingle-join groups grow only when unrelated
docs share grams), so on the vocab-disjoint synthetic growth it
measures linear — the artifact records that as a contract note, not a
flag.  The measurement itself is tools/scaling_curve.py, run per
round; this test pins the committed artifact, not a re-run."""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _latest_artifact():
    files = glob.glob(str(ROOT / "SCALING_r*.json"))
    assert files, "no SCALING_rN.json committed — run tools/scaling_curve.py"
    def rnd(p):
        m = re.search(r"SCALING_r(\d+)", p)
        return int(m.group(1)) if m else -1
    return json.load(open(max(files, key=rnd)))


def test_flagged_set_is_exactly_the_allowlist():
    doc = _latest_artifact()
    assert not doc.get("partial"), "committed artifact must be a full run"
    # r11: fixed-plane sign-LSH joined the allowlist — bucket
    # occupancy grows with N at a fixed plane count (×64 confirmation
    # exp 1.91), the documented fixed-precision contract; its
    # scale-safe sibling is certified flat below
    assert (
        doc["flagged"]
        == sorted(doc["allowlist"])
        == ["ann_lsh_pairs", "ann_near_dup_pairs"]
    )


def test_adaptive_lsh_sibling_not_flagged():
    """The certified replacement for the fixed-plane LSH tier: the
    count-adaptive banding must measure sub-linear-to-linear on the
    same artifact that flags its fixed sibling."""
    doc = _latest_artifact()
    g = doc["gates"].get("ann_lsh_adaptive_pairs")
    assert g is not None and g["flagged"] is False


# the allowlist contract (VERDICT r11 Wrong #1): every allowlisted
# superlinear tier must name a scale-safe sibling, and that sibling
# must be MEASURED UNFLAGGED in the same artifact — so the escape
# hatch can't silently become a dumping ground.  The mapping is pinned
# here (not only read from the artifact) so a tool edit that drops a
# sibling fails this test.
ALLOWLIST_SIBLINGS = {
    "ann_lsh_pairs": ["ann_lsh_adaptive_pairs"],
    "ann_near_dup_pairs": ["ann_lsh_adaptive_pairs"],
}


def test_every_allowlisted_tier_has_unflagged_sibling():
    doc = _latest_artifact()
    assert sorted(doc["allowlist"]) == sorted(ALLOWLIST_SIBLINGS), (
        "allowlist grew or shrank — update ALLOWLIST_SIBLINGS with a "
        "measured-flat sibling for every entry"
    )
    for tier, siblings in ALLOWLIST_SIBLINGS.items():
        assert siblings, f"{tier} allowlisted with no named sibling"
        for sib in siblings:
            g = doc["gates"].get(sib)
            assert g is not None, (
                f"{tier}'s sibling {sib} is not measured in the artifact"
            )
            assert g["flagged"] is False, (
                f"{tier}'s sibling {sib} is itself flagged — the tier "
                "has no certified scale-safe replacement"
            )
    # artifacts from r12 onward also record the mapping; when present
    # it must agree with the pinned one
    rec = doc.get("allowlist_siblings")
    if rec is not None:
        assert rec == ALLOWLIST_SIBLINGS


def test_positive_control_really_superlinear():
    """The architectural control's fitted exponent must comfortably
    exceed the threshold — the flag is decided on the noise-floor lower
    bound, so that is what must clear the bar."""
    doc = _latest_artifact()
    g = doc["gates"]["ann_near_dup_pairs"]
    assert g["exponent"] is not None and g["exponent"] > doc["flag_above"]
    assert g["exponent_lb"] is not None and g["exponent_lb"] > doc["flag_above"]


def test_contract_superlinear_documented():
    """The value-coupled quadratic tier is recorded as a contract note
    (with its scale-safe sibling named), and its certified replacement
    measures NOT flagged."""
    doc = _latest_artifact()
    assert "dedup_ngram_jaccard" in doc["contract_superlinear"]
    assert "dedup_jaccard_prefix" in doc["contract_superlinear"][
        "dedup_ngram_jaccard"
    ]
    assert doc["gates"]["dedup_jaccard_prefix"]["flagged"] is False


def test_headline_gates_measured():
    """Every bench HEADLINE gate has at least a three-point curve in
    the artifact (the tool's gate set is HEADLINE + HEAVY)."""
    import sys

    sys.path.insert(0, str(ROOT))
    import bench

    doc = _latest_artifact()
    missing = [n for n in bench.HEADLINE if n not in doc["gates"]]
    assert not missing, missing
    for n in bench.HEADLINE:
        assert len(doc["gates"][n]["points"]) >= 3
