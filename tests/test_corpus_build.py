"""End-to-end corpus-build funnel (queries/pipeline4.py): stage flags
are internally consistent and the attrition report matches the
per-doc frame it summarizes."""

from __future__ import annotations

from oteldb_spark.queries.pipeline4 import (
    corpus_build_funnel,
    corpus_build_survivors,
)

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_flags_consistent(spark):
    rows = corpus_build_survivors(spark, SF_DIR).collect()
    assert rows, "empty corpus"
    for r in rows:
        # survivorship is exactly the conjunction of the stage flags
        assert r["survives"] == (
            r["passed_quality"]
            and r["is_canonical"]
            and not r["near_dup_dropped"]
            and not r["contaminated"]
        ), r
        # canonical only defined among quality docs
        if r["is_canonical"]:
            assert r["passed_quality"], r
        # near-dup suppression only applies to stage-2 survivors
        if r["near_dup_dropped"]:
            assert r["is_canonical"], r
        assert r["n_tokens"] >= 1
        # eval shard held out of the corpus
        assert r["doc_id"] % 50 != 0


def test_funnel_report_matches_frame(spark):
    rows = corpus_build_survivors(spark, SF_DIR).collect()
    rep = corpus_build_funnel(spark, SF_DIR).collect()[0]
    assert rep["n_corpus"] == len(rows)
    assert rep["n_quality"] == sum(r["passed_quality"] for r in rows)
    assert rep["n_exact"] == sum(r["is_canonical"] for r in rows)
    assert rep["n_after_neardup"] == sum(
        r["is_canonical"] and not r["near_dup_dropped"] for r in rows
    )
    assert rep["n_survivors"] == sum(r["survives"] for r in rows)
    assert rep["survivor_tokens"] == sum(
        r["n_tokens"] for r in rows if r["survives"]
    )
    # monotone attrition
    assert (
        rep["n_corpus"]
        >= rep["n_quality"]
        >= rep["n_exact"]
        >= rep["n_after_neardup"]
        >= rep["n_survivors"]
    )
    # strict per-stage engagement is NOT asserted here: it is a
    # property of one generated fixture's text statistics, not of the
    # code — test_funnel_every_stage_fires_on_engineered_corpus pins
    # it on a hand-built corpus where each stage fires by construction


def _word_run(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i:03d}" for i in range(n)]


def _text(words: list[str]) -> str:
    # two distinct stopwords + >=50 alpha words of mean length 3-10:
    # passes every Gopher gate unless the caller truncates it
    return " ".join(["the", "and"] + words)


def test_funnel_every_stage_fires_on_engineered_corpus(spark, tmp_path):
    """Each funnel stage drops at least one document, guaranteed by
    construction: a too-short doc (quality), an exact duplicate pair
    (canon), a one-word-changed near-duplicate pair (MinHash LSH), and
    a train doc sharing a 4-gram with the held-out eval shard
    (decontamination).  Exact expected counts, not just strict drops."""
    near_a = _word_run("bravo", 58)
    near_b = near_a[:-1] + ["zulu999"]  # J(shingles) ~ 0.93 >> band bar
    contam = _word_run("carol", 54) + ["golf", "hotel", "india", "juliet"]
    eval_doc = _word_run("delta", 54) + ["golf", "hotel", "india", "juliet"]
    rows = [
        (1, "too short"),  # fails quality (3 words < 50)
        (2, _text(_word_run("alpha", 58))),  # canonical of the pair
        (3, _text(_word_run("alpha", 58))),  # exact dup -> dropped
        (4, _text(near_a)),  # near-dup canonical (doc_a of the pair)
        (6, _text(near_b)),  # near-dup doc_b -> dropped by LSH
        (7, _text(contam)),  # shares 'golf hotel india juliet' w/ eval
        (50, _text(eval_doc)),  # doc_id % 50 == 0: held-out eval shard
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "fix", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rep = corpus_build_funnel(spark, str(tmp_path)).collect()[0]
    assert rep["n_corpus"] == 6  # eval doc held out
    assert rep["n_quality"] == 5  # doc 1 rejected
    assert rep["n_exact"] == 4  # doc 3 deduplicated
    assert rep["n_after_neardup"] == 3  # doc 6 near-dup-dropped
    assert rep["n_survivors"] == 2  # doc 7 decontaminated
    assert rep["survivor_tokens"] == 2 * 60
    flags = {
        r["doc_id"]: r for r in corpus_build_survivors(
            spark, str(tmp_path)
        ).collect()
    }
    assert not flags[1]["passed_quality"]
    assert flags[2]["is_canonical"] and not flags[3]["is_canonical"]
    assert flags[6]["near_dup_dropped"] and not flags[4]["near_dup_dropped"]
    assert flags[7]["contaminated"] and flags[7]["is_canonical"]
    assert sorted(k for k, r in flags.items() if r["survives"]) == [2, 4]


def test_exact_substr_cuts_merge_windows(spark, tmp_path):
    """A 10-token run shared across two docs flags 3 overlapping
    8-token windows per doc; the gate must emit ONE merged interval
    per doc covering exactly the shared run."""
    from oteldb_spark.queries.pipeline3 import dedup_exact_substr_cuts

    shared = [f"shared{i:02d}" for i in range(10)]
    d1 = [f"a{i:02d}" for i in range(20)] + shared + ["b1", "b2", "b3"]
    d2 = [f"c{i:02d}" for i in range(5)] + shared + ["d1"]
    df = spark.createDataFrame(
        [(1, " ".join(d1), "en", "fix", 0), (2, " ".join(d2), "en", "fix", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in dedup_exact_substr_cuts(spark, str(tmp_path)).collect()
    }
    assert len(rows) == 2  # one merged island per doc, not 3 windows
    # doc 1: shared run at 1-based tokens 21..30 -> [21, 31)
    assert (rows[1]["cut_start"], rows[1]["cut_end"]) == (21, 31)
    assert rows[1]["n_tokens_cut"] == 10
    # doc 2: shared run at tokens 6..15 -> [6, 16)
    assert (rows[2]["cut_start"], rows[2]["cut_end"]) == (6, 16)
