from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from oteldb_spark.session import get_spark

    s = get_spark("oteldb-spark-tests", cpus=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"
