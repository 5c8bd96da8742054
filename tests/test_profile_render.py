"""ProfileQL render formats: golden-shape tests against the
reference's render_test.go tree (root → a{self 2, a1 4}, b 4)."""

from __future__ import annotations

import gzip
import json

import pytest

from oteldb_spark.engine import ProfileQLEngine


@pytest.fixture()
def result(spark):
    df = spark.createDataFrame(
        [("a", 2), ("a>a1", 4), ("b", 4)], "stack string, total_us long"
    )
    return ProfileQLEngine(df=df)


def test_collapsed(result):
    assert result.collapsed().splitlines() == ["a 2", "a;a1 4", "b 4"]


def test_flamebearer_golden(result):
    fb = result.flamebearer()
    assert fb["flamebearer"] == {
        "names": ["total", "a", "a1", "b"],
        # per level: [xOffset (delta), total, self, nameIndex]
        "levels": [
            [0, 10, 0, 0],
            [0, 6, 2, 1, 0, 4, 4, 3],
            [2, 4, 4, 2],
        ],
        "numTicks": 10,
        "maxSelf": 4,
    }
    assert fb["metadata"]["format"] == "single"
    assert fb["metadata"]["sampleRate"] == 1_000_000_000
    assert fb["metadata"]["units"] == "nanoseconds"


def test_flamebearer_max_nodes_folds_other(result):
    fb = result.flamebearer(max_nodes=2)
    # keep the two largest totals (a=6, a1/b=4 tie at threshold);
    # anything below the threshold folds into 'other'
    assert "other" not in fb["flamebearer"]["names"]
    fb1 = result.flamebearer(max_nodes=1)
    assert "other" in fb1["flamebearer"]["names"]
    # folded siblings preserve total ticks
    assert fb1["flamebearer"]["numTicks"] == 10


def test_pprof_roundtrip(result):
    from oteldb_spark.sources.prw import _wire_fields

    raw = gzip.decompress(result.pprof())
    samples, locations, functions, strings = [], [], [], []
    sample_type = period_type = None
    for fno, wt, val in _wire_fields(raw):
        if fno == 1:
            sample_type = val
        elif fno == 2:
            samples.append(val)
        elif fno == 4:
            locations.append(val)
        elif fno == 5:
            functions.append(val)
        elif fno == 6:
            strings.append(val.decode())
        elif fno == 11:
            period_type = val
    assert strings[0] == ""
    assert {"a", "a1", "b", "cpu", "nanoseconds"} <= set(strings)
    # one sample per node with self > 0; values sum to the tree total
    assert len(samples) == 3
    total = 0
    stacks = []
    for s in samples:
        from oteldb_spark.sources.prw import _packed_varints

        loc_ids = vals = None
        for fno, wt, val in _wire_fields(s):
            if fno == 1:
                loc_ids = val
            elif fno == 2:
                vals = val

        ids = _packed_varints(loc_ids, 2, zigzag=False)
        vv = _packed_varints(vals, 2, zigzag=False)
        stacks.append(tuple(ids))
        total += vv[0]
    assert total == 10
    assert len(locations) == len(functions) == 3
    # leaf-first stacks: the a>a1 sample has 2 locations, leaf first
    assert max(len(s) for s in stacks) == 2
    assert sample_type is not None and period_type is not None


def test_html_embeds_flamebearer(result):
    page = result.html()
    assert page.startswith("<!DOCTYPE html>")
    start = page.index("window.flamegraph = ") + len("window.flamegraph = ")
    end = page.index(";\n", start)
    payload = json.loads(page[start:end])
    assert payload["flamebearer"]["numTicks"] == 10


def test_profile_discovery_ops(spark):
    import pytest
    from pyspark.sql import functions as F

    from oteldb_spark.engine import ProfileQLEngine
    from oteldb_spark.signals import spans_frame

    spans = spans_frame(spark, "/root/testdata/sf0.001")
    src = spans.select(
        F.col("service").alias("app"), F.col("name").alias("profile_name")
    )
    eng = ProfileQLEngine(df=None, source_df=src, label_cols=("profile_name",))
    apps = eng.apps()
    assert "frontend" in apps and apps == sorted(apps)
    assert eng.profile_labels() == ["__name__", "profile_name"]
    assert eng.profile_label_values("__name__") == apps
    assert eng.profile_label_values("nope") == []
    with pytest.raises(NotImplementedError):
        ProfileQLEngine(df=None).apps()
