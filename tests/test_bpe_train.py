"""BPE training loop: the learned merge table must match a pure-Python
reference trainer step for step (argmax of weighted adjacent-pair
counts, ties on the pair string, two-pass replace application), and
must feed the existing encoder (_bpe_chain) producing the same
tokenization a pure-Python application of the learned merges gives."""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.queries.pipeline5 import _bpe_chain, bpe_train_merges

_DOCS = [
    (1, "the table scans the table fast"),
    (2, "the value in the table"),
    (3, "scan the data the table holds"),
    (4, "a table of tables holds the data"),
]


def _py_train(texts, n_steps):
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            if len(w) >= 2:
                wf[w] = wf.get(w, 0) + 1
    words = {w: list(w) for w in wf}
    merges = []
    for step in range(1, n_steps + 1):
        counts: dict[tuple, int] = {}
        for w, toks in words.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wf[w]
        if not counts:
            break
        best = min(sorted(counts), key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append((step, f"{best[0]} {best[1]}", counts[best]))
        x, y = best
        for w, toks in words.items():
            for _ in range(2):  # two-pass contract, like the engine
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            words[w] = toks
    return merges, words


def test_trainer_matches_python_reference(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = bpe_train_merges(spark, docs, n_steps=6)
    want, _ = _py_train([t for _, t in _DOCS], 6)
    assert got == want


def test_multi_merge_batching_matches_sequential_fuzz(spark):
    """The multi-merge batch rule (r12: one pair-count collect can
    commit several merges) claims exact sequential equivalence — the
    disjoint-prefix + strict-count-cut argument in
    pipeline5._select_merge_batch.  Fuzz it: random skewed corpora
    (shared word stems force conflicting, chained merges; the skew
    forces ties) must yield the identical merge table to the pure
    sequential Python trainer, including tie-breaks."""
    import random

    rng = random.Random(7)
    stems = ["ta", "er", "in", "st", "ow", "the", "re", "an"]
    for trial in range(6):
        vocab = [
            rng.choice(stems) + rng.choice(["ble", "ner", "xy", "", "s"])
            + rng.choice(stems)
            for _ in range(12)
        ]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10)))
            for _ in range(8)
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        n = rng.randint(3, 9)
        got = bpe_train_merges(spark, docs, n_steps=n)
        want, _ = _py_train(texts, n)
        assert got == want, (trial, n, texts)


def test_learned_table_feeds_encoder(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    learned = [tuple(p.split(" ")) for _, p, _ in bpe_train_merges(spark, docs, n_steps=6)]
    _, py_words = _py_train([t for _, t in _DOCS], 6)
    word = "table"  # pinned word present in the corpus
    inner = "' ' || array_join(split(w, ''), ' ') || ' '"
    enc = (
        spark.createDataFrame([(word,)], "w string")
        .select(F.expr(_bpe_chain(inner, merges=learned)).alias("enc"))
        .first()["enc"]
    )
    assert enc.strip().split(" ") == py_words[word]
