"""Per-session fixture memoization.

Several gates memoize expensive driver-side fixture work (wire-encoded
payloads, pinned decoded frames, sketch bitmaps) per (SparkSession,
sf_dir).  A plain module-level ``dict`` keyed by the session object
would pin the session — and through it the py4j gateway and every
memoized DataFrame — for the life of the process even after
``spark.stop()``.  ``SessionMemo`` keys by WEAK reference instead: when
the session is garbage-collected its whole memo bucket goes with it.
"""

from __future__ import annotations

import weakref
from typing import Any


class SessionMemo:
    def __init__(self) -> None:
        self._by_session: "weakref.WeakKeyDictionary[Any, dict]" = (
            weakref.WeakKeyDictionary()
        )

    def get(self, spark, key) -> Any:
        return self._by_session.get(spark, {}).get(key)

    def set(self, spark, key, value) -> None:
        bucket = self._by_session.get(spark)
        if bucket is None:
            bucket = {}
            self._by_session[spark] = bucket
        bucket[key] = value
