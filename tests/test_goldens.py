"""Golden snapshot tests (gold_test.go analog): compact query outputs
at sf0.001 must match the committed snapshots exactly — a regression
net independent of the DuckDB oracle."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"
NAMES = sorted(p.stem for p in GOLDEN_DIR.glob("*.json"))


@pytest.mark.parametrize("name", NAMES)
def test_golden(spark, name):
    from tools.gen_goldens import snapshot

    expected = json.loads((GOLDEN_DIR / f"{name}.json").read_text())
    got = snapshot(spark, name)
    assert got["columns"] == expected["columns"]
    assert got["rows"] == expected["rows"]
