"""ExactSubstr removal (Lee et al. 2022 detect → merge → remove):
engineered fixtures where cut intervals abut the document boundaries,
so the reassembly's edge arithmetic (1-based positions, half-open
intervals) is pinned at both ends."""

from __future__ import annotations

from oteldb_spark.queries.pipeline3 import (
    _K,
    exact_substr_apply,
    exact_substr_cut_intervals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def test_cut_abuts_both_document_boundaries(spark):
    # doc 1: [shared head K][unique middle][shared tail K]
    # doc 2 / doc 3: carriers of the head / tail runs
    head = _words("h", _K)
    tail = _words("t", _K)
    mid = _words("m", 5)
    rows = [
        (1, " ".join(head + mid + tail)),
        (2, " ".join(head + _words("x", 6))),
        (3, " ".join(_words("y", 6) + tail)),
    ]
    cuts = {
        (r.doc_id, r.cut_start, r.cut_end)
        for r in exact_substr_cut_intervals(_docs(spark, rows)).collect()
    }
    n1 = len(head) + len(mid) + len(tail)
    # doc 1: head cut starts at position 1; tail cut ends one past the
    # last token (half-open) — both abut the boundary
    assert (1, 1, 1 + _K) in cuts
    assert (1, n1 + 1 - _K, n1 + 1) in cuts
    applied = {
        r.doc_id: (r.cleaned_text, r.n_tokens_kept)
        for r in exact_substr_apply(_docs(spark, rows)).collect()
    }
    assert applied[1] == (" ".join(mid), len(mid))
    # the carriers lose their shared run too, keeping their unique part
    assert applied[2] == (" ".join(_words("x", 6)), 6)
    assert applied[3] == (" ".join(_words("y", 6)), 6)


def test_fully_covered_doc_comes_back_empty(spark):
    shared = _words("s", _K)  # doc 1 is EXACTLY one duplicated window
    rows = [
        (1, " ".join(shared)),
        (2, " ".join(shared + _words("z", 3))),
    ]
    applied = {
        r.doc_id: (r.cleaned_text, r.n_tokens_kept)
        for r in exact_substr_apply(_docs(spark, rows)).collect()
    }
    assert applied[1] == ("", 0)
    assert applied[2] == (" ".join(_words("z", 3)), 3)


def test_touching_cuts_merge_and_apply_once(spark):
    # two duplicated runs separated by NOTHING (adjacent islands merge):
    # doc 1 = [runA][runB]; doc 2 carries runA, doc 3 carries runB
    run_a = _words("a", _K)
    run_b = _words("b", _K)
    rows = [
        (1, " ".join(run_a + run_b)),
        (2, " ".join(run_a + _words("p", 3))),
        (3, " ".join(_words("q", 3) + run_b)),
    ]
    cuts = [
        r
        for r in exact_substr_cut_intervals(_docs(spark, rows)).collect()
        if r.doc_id == 1
    ]
    assert len(cuts) == 1  # merged into one island
    assert (cuts[0].cut_start, cuts[0].cut_end) == (1, 2 * _K + 1)
    applied = {
        r.doc_id: r.n_tokens_kept
        for r in exact_substr_apply(_docs(spark, rows)).collect()
    }
    assert applied[1] == 0


def test_doc_without_cuts_passes_through(spark):
    rows = [
        (1, "alpha beta gamma"),  # shorter than K: no windows at all
        (2, " ".join(_words("u", _K + 4))),  # windows, but no duplicates
    ]
    applied = {
        r.doc_id: (r.cleaned_text, r.n_tokens_kept)
        for r in exact_substr_apply(_docs(spark, rows)).collect()
    }
    assert applied[1] == ("alpha beta gamma", 3)
    assert applied[2] == (" ".join(_words("u", _K + 4)), _K + 4)
