"""Reference Pyroscope e2e suite, replicated from its deterministic
generator.

``integration/pyroe2e/common_test.go:19-99`` generates the corpus in
code (2 services × 50 CPU profiles × 3 fixed stacks, sample value
100·(stack+1)+n), and ``storage_test.go:25-89`` asserts profile-type
discovery, label APIs, and flame-tree totals (merged total equals the
generator's running sum; service filter is a strict subset; unknown
service/type yield empty).  Samples here go through the real pprof
wire encode → executor decode → ``flame_nodes`` merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oteldb_spark.sources.pprof import encode_profile, flame_nodes, profile_rows

FRAMES = ["main", "serveHTTP", "queryDB", "encodeJSON", "gcAssist"]
# leaf-first stacks by frame index (common_test.go:31-35)
STACKS = [[2, 1, 0], [3, 1, 0], [4, 0]]
SERVICES = ["frontend", "backend"]
PER_SERVICE = 50
START_NS = 1_704_067_200 * 1_000_000_000
TYPE_ID = "cpu:cpu:nanoseconds:cpu:nanoseconds"


def _expected_total() -> int:
    # Σ over services, profiles n, stacks si of 100·(si+1)+n
    return len(SERVICES) * sum(
        100 * (si + 1) + n
        for n in range(PER_SERVICE)
        for si in range(len(STACKS))
    )


@pytest.fixture(scope="module")
def pyro_samples(spark):
    import pandas as pd

    rows = []
    for svc in SERVICES:
        for n in range(PER_SERVICE):
            t_ns = START_NS + n * 1_000_000_000
            samples = [
                (
                    [FRAMES[i] for i in reversed(stack)],  # root-first
                    100 * (si + 1) + n,
                )
                for si, stack in enumerate(STACKS)
            ]
            payload = encode_profile(
                samples, sample_type=("cpu", "nanoseconds"), time_nanos=t_ns
            )
            rows.append((svc, TYPE_ID, payload))
    payloads = spark.createDataFrame(
        rows, "service string, ptype string, payload binary"
    )

    def fn(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                for smp in profile_rows(bytes(r.payload)):
                    out.append(
                        (
                            r.service,
                            r.ptype,
                            smp["stack"],
                            smp["value"],
                            smp["sample_type"],
                            smp["unit"],
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "service",
                    "ptype",
                    "stack",
                    "value",
                    "sample_type",
                    "unit",
                ],
            )

    samples = payloads.mapInPandas(
        fn,
        schema="service string, ptype string, stack array<string>,"
        " value long, sample_type string, unit string",
    ).cache()
    samples.count()
    return samples


def test_profile_types(pyro_samples):
    types = pyro_samples.select("ptype", "sample_type", "unit").distinct().collect()
    assert len(types) == 1
    assert types[0]["ptype"] == TYPE_ID
    assert types[0]["sample_type"] == "cpu"
    assert types[0]["unit"] == "nanoseconds"


def test_label_values(pyro_samples):
    vals = sorted(
        r[0] for r in pyro_samples.select("service").distinct().collect()
    )
    assert vals == sorted(SERVICES)


def test_merge_all_services(pyro_samples):
    total = pyro_samples.agg(F.sum("value")).first()[0]
    assert total == _expected_total()
    nodes = flame_nodes(pyro_samples.select("stack", "value"))
    # root children exist: the distinct depth-1 frame is "main"
    assert nodes.filter(F.col("depth") == 1).count() == 1
    # the root-level total equals the merged total
    root_total = (
        nodes.filter(F.col("stack") == "main").select("total").first()[0]
    )
    assert root_total == total


def test_filter_by_service(pyro_samples):
    one = pyro_samples.filter(F.col("service") == "frontend")
    sub = one.agg(F.sum("value")).first()[0]
    assert 0 < sub < _expected_total()


def test_no_match_and_unknown_type(pyro_samples):
    assert (
        pyro_samples.filter(F.col("service") == "does-not-exist").count() == 0
    )
    assert (
        pyro_samples.filter(
            F.col("ptype") == "memory:inuse_space:bytes:space:bytes"
        ).count()
        == 0
    )
