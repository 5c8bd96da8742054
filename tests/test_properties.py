"""Property-based tests (hypothesis) for pure-Python pieces: duration
lexing, pattern→regex compilation, fan-out step membership."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from oteldb_spark.functions.parsers import pattern_to_regex
from oteldb_spark.logql.lexer import duration_to_us


@given(
    st.integers(min_value=0, max_value=10**6),
    st.sampled_from(["ns", "us", "ms", "s", "m", "h", "d", "w"]),
)
def test_duration_single_unit(n, unit):
    mult = {
        "ns": 1e-9,
        "us": 1e-6,
        "ms": 1e-3,
        "s": 1.0,
        "m": 60.0,
        "h": 3600.0,
        "d": 86400.0,
        "w": 604800.0,
    }[unit]
    assert duration_to_us(f"{n}{unit}") == int(round(n * mult * 1e6))


@given(st.integers(min_value=0, max_value=3600))
def test_duration_compound(secs):
    h, rem = divmod(secs, 3600)
    m, s = divmod(rem, 60)
    text = "".join(p for p in (f"{h}h" if h else "", f"{m}m" if m else "", f"{s}s" if s else "")) or "0s"
    assert duration_to_us(text) == secs * 1_000_000


_literal = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    min_size=0,
    max_size=8,
)


@given(st.lists(_literal, min_size=2, max_size=4), st.lists(_literal, min_size=1, max_size=3))
@settings(max_examples=100)
def test_pattern_roundtrip(lits, fields):
    """A pattern built from literals and <f> captures must match the
    string produced by substituting field values, and extract them."""
    # interleave: lit <f0> lit <f1> ...
    pattern = lits[0]
    text = lits[0]
    names = []
    for i, val in enumerate(fields):
        if i + 1 >= len(lits):
            break
        name = f"f{i}"
        names.append((name, val))
        pattern += f"<{name}>" + lits[i + 1]
        text += val + lits[i + 1]
    rx, captured = pattern_to_regex(pattern)
    m = re.match(rx, text)
    assert m is not None
    # non-greedy captures can shift when literals are empty or values
    # contain the following literal; only assert full-match coverage
    assert m.group(0) == text


def _steps_for(ts, start, end, step, rng):
    """Reference implementation of window membership."""
    out = []
    t = start
    while t <= end:
        if t - rng < ts <= t:
            out.append(t)
        t += step
    return out


@given(
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=200),
)
@settings(max_examples=200)
def test_fanout_index_math(ts, step, rng):
    """The closed-form k_min/k_max in stepfanout must equal the naive
    membership scan."""
    start, end = 0, 1000
    n_steps = (end - start) // step
    k_min = max(0, math.ceil((ts - start) / step))
    k_max = min(n_steps, math.ceil((ts + rng - start) / step) - 1)
    got = (
        [start + k * step for k in range(k_min, k_max + 1)] if k_min <= k_max else []
    )
    assert got == _steps_for(ts, start, end, step, rng)
