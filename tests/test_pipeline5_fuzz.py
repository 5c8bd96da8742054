"""Property fuzz for pipeline5 against independent pure-Python
references: the DuckDB oracle pins cross-engine agreement; these pin
the SEMANTICS themselves (a shared misreading of the spec would slip
past an oracle that restates the same mistake)."""

from __future__ import annotations

import math
import random


def _round6(v: float) -> float:
    """Spark round() is HALF_UP; Python round() is banker's — emulate
    Spark on exact .5 ulps (e.g. 9/128 = 0.0703125)."""
    return math.floor(v * 1e6 + 0.5) / 1e6

from pyspark.sql import Row

import oteldb_spark.queries.pipeline5 as p5

_VOCAB = ["the", "table", "value", "scan", "row", "fast", "order",
          "data", "xy", "q", "zz", "tata", "thethe"]


def _py_bpe_tokens(word: str) -> int:
    """Reference BPE: two left-to-right non-overlapping replace passes
    per merge, in table order — the exact contract the gate documents."""
    toks = list(word)
    for x, y in p5._BPE_MERGES:
        for _ in range(2):
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
    return len(toks)


def _py_top_frac(words: list[str], n: int) -> float:
    chars = sum(len(w) for w in words)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return 0.0
    counts: dict[str, int] = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    best = min(sorted(counts), key=lambda g: (-counts[g], g))
    return _round6(counts[best] * len(best.replace(" ", "")) / chars)


def _py_dup_frac(words: list[str], n: int) -> float:
    chars = sum(len(w) for w in words)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    counts: dict[str, int] = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    covered: set[int] = set()
    for i, g in enumerate(grams):
        if counts[g] >= 2:
            covered.update(range(i, i + n))
    return _round6(sum(len(words[i]) for i in covered) / chars)


def test_fuzz_vs_python_reference(spark):
    rng = random.Random(61)
    docs = [
        Row(
            doc_id=i,
            text=" ".join(
                rng.choice(_VOCAB) for _ in range(rng.randint(3, 40))
            ),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(docs)
    from unittest import mock

    with mock.patch.object(p5, "load", lambda s, d, n, **kw: df):
        rep = {
            r["doc_id"]: r
            for r in p5.docs_repetition_rules(spark, "unused").collect()
        }
        bpe = {
            r["doc_id"]: r
            for r in p5.text_bpe_tokens(spark, "unused").collect()
        }

    for d in docs:
        words = d.text.split(" ")
        for n in p5._TOP_NS:
            assert rep[d.doc_id][f"top{n}_frac"] == _py_top_frac(words, n), (
                d.doc_id,
                n,
                d.text,
            )
        assert rep[d.doc_id]["dupn_frac"] == _py_dup_frac(words, p5._DUP_N), (
            d.doc_id,
            d.text,
        )
        assert bpe[d.doc_id]["bpe_tokens"] == sum(
            _py_bpe_tokens(w) for w in words
        ), (d.doc_id, d.text)
