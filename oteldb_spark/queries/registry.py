"""Query/oracle registry with the driver's evaluation-window constants.

The synthetic ``events`` stream spans 2024-01 (TESTDATA.md); all step
queries evaluate over that month: step 6h, trailing range 12h — 121
steps, range/step fan-out factor 2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# 2024-01-01T00:00:00Z .. 2024-01-31T00:00:00Z, µs epochs
START_US = 1_704_067_200_000_000
END_US = START_US + 30 * 86_400_000_000
STEP_US = 6 * 3_600_000_000
RANGE_US = 12 * 3_600_000_000
RANGE_S = RANGE_US / 1e6


def register(name: str, oracle: str | None = None):
    def deco(fn):
        if name in QUERIES:
            # a silent overwrite drops a gate from the scoreboard
            raise ValueError(f"duplicate gate registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
