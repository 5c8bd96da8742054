"""SessionMemo: per-session buckets, and a dropped session releases
its memoized fixtures (a plain dict keyed by the session would pin the
session + every memoized DataFrame for the process lifetime)."""

from __future__ import annotations

import gc

from oteldb_spark.memo import SessionMemo


class _FakeSession:  # weakref-able stand-in
    pass


def test_memo_per_session_and_weak():
    m = SessionMemo()
    s1, s2 = _FakeSession(), _FakeSession()
    m.set(s1, "k", 1)
    m.set(s2, "k", 2)
    assert m.get(s1, "k") == 1
    assert m.get(s2, "k") == 2
    assert m.get(s1, "other") is None
    del s1
    gc.collect()
    assert len(m._by_session) == 1  # s1's bucket collected with it


def test_memo_real_session_roundtrip(spark):
    m = SessionMemo()
    assert m.get(spark, "x") is None
    m.set(spark, "x", [1, 2])
    assert m.get(spark, "x") == [1, 2]
