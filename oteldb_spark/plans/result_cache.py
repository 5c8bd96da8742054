"""Query-result cache for step queries (SURVEY §2.4 "query-result
cache"; reference ``internal/metricscache/{cache,entry,block}.go``).

The reference caches per-series compressed point blocks keyed by
``(series hash, step, fn)`` with a contiguous ``[minTS, maxTS]``
watermark (block.go:24-37): a query is a *hit* when the watermark
covers its whole range, a *partial hit* when it covers a prefix or
suffix (cache.go:20-27 CacheStats), in which case only the uncovered
remainder is fetched from storage and the watermark is extended
(entry.go merge).  A ``SafetyLag`` keeps points near ``now`` out of
the cache (cache.go:36-44 Options) so late arrivals are not frozen.

Spark-native analog, at DataFrame granularity instead of per-series
blocks: one cache entry per ``(query key, step, grid alignment)``,
stored as a parquet directory — on a real cluster that directory
lives on shared storage, the cached slice is read *distributed* and
unioned with the freshly-computed steps without anything passing
through the driver, and write-back appends only the new step rows as
new parquet files (lz4 block compression in the reference ≙ parquet
column encoding + snappy here).  Watermark metadata is a tiny JSON
sidecar.

Splitting the step range is exact because every step value depends
only on source data in that step's own trailing window: computing
steps ``[a, b]`` in two sub-ranges on the same grid yields the same
rows as one full computation.  Coverage is kept contiguous the same
way the reference does — a query disjoint from the watermark computes
the bridge from the watermark edge too, storing (but not returning)
the extra steps.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from hashlib import sha256
from typing import Callable

from pyspark.sql import DataFrame

ComputeFn = Callable[[int, int], DataFrame]
"""(start_us, end_us) -> step rows for the grid steps inside the range."""


@dataclass
class CacheStats:
    """Mirror of the reference's CacheStats counters (cache.go:20-27)."""

    hits: int = 0
    partial_hits: int = 0
    misses: int = 0
    skipped_inserts: int = 0


@dataclass
class _Meta:
    lo_us: int
    hi_us: int
    step_us: int
    align_us: int


def _grid_floor(ts_us: int, step_us: int, align_us: int) -> int:
    return (ts_us - align_us) // step_us * step_us + align_us


@dataclass
class StepResultCache:
    """Watermarked parquet cache for ``(labels..., step_us, value)`` frames.

    ``safety_lag_us`` mirrors Options.SafetyLag (cache.go:38-40):
    steps newer than ``now_us - safety_lag_us`` are returned but not
    persisted, so the next query recomputes them.  Pass ``now_us``
    explicitly — the engine has no business reading the wall clock
    inside a plan.
    """

    cache_dir: str
    safety_lag_us: int = 60_000_000
    stats: CacheStats = field(default_factory=CacheStats)

    def _entry(self, key: str, step_us: int, align_us: int) -> tuple[str, str]:
        h = sha256(f"{key}|{step_us}|{align_us}".encode()).hexdigest()[:24]
        base = os.path.join(self.cache_dir, h)
        return os.path.join(base, "data"), os.path.join(base, "meta.json")

    @staticmethod
    def _read_meta(meta_path: str) -> _Meta | None:
        try:
            with open(meta_path) as f:
                return _Meta(**json.load(f))
        except (OSError, ValueError, TypeError):
            return None

    @staticmethod
    def _write_meta(meta_path: str, meta: _Meta) -> None:
        os.makedirs(os.path.dirname(meta_path), exist_ok=True)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta.__dict__, f)
        os.replace(tmp, meta_path)

    def query_range(
        self,
        spark,
        key: str,
        start_us: int,
        end_us: int,
        step_us: int,
        compute: ComputeFn,
        now_us: int | None = None,
    ) -> DataFrame:
        """Steps of ``key`` on the grid ``start_us + k*step_us`` ≤ end_us.

        Computes only the grid ranges the watermark doesn't cover,
        appends them to the store (minus the safety-lag tail), and
        returns the requested range as one DataFrame.
        """
        align_us = start_us % step_us
        data_dir, meta_path = self._entry(key, step_us, align_us)
        meta = self._read_meta(meta_path)
        grid_hi = _grid_floor(end_us, step_us, align_us)  # last step ≤ end
        cutoff = (
            None
            if now_us is None
            else _grid_floor(now_us - self.safety_lag_us, step_us, align_us)
        )

        # uncovered grid ranges to compute, each (s, e) inclusive
        gaps: list[tuple[int, int]] = []
        if meta is None:
            self.stats.misses += 1
            gaps.append((start_us, grid_hi))
        else:
            if meta.lo_us <= start_us and grid_hi <= meta.hi_us:
                self.stats.hits += 1
            else:
                self.stats.partial_hits += 1
            if start_us < meta.lo_us:
                gaps.append((start_us, meta.lo_us - step_us))
            if grid_hi > meta.hi_us:
                gaps.append((meta.hi_us + step_us, grid_hi))

        parts: list[DataFrame] = []
        if meta is not None:
            cached = spark.read.parquet(data_dir)
            parts.append(cached.where(cached["step_us"].between(start_us, grid_hi)))

        new_lo = meta.lo_us if meta is not None else start_us
        new_hi = meta.hi_us if meta is not None else None
        stored = False
        for s, e in gaps:
            df = compute(s, e)
            store_e = e if cutoff is None else min(e, cutoff)
            # A head gap ([s, e] with e = meta.lo - step) may only be
            # persisted when stored in FULL: a safety-lag truncation
            # (store_e < e) would leave steps (store_e, meta.lo) inside
            # the extended watermark with no data — later queries would
            # count them as hits and silently return incomplete results.
            # Tail/miss gaps start contiguous with the watermark, so a
            # truncated store still merges cleanly.
            head_gap = meta is not None and e < meta.lo_us
            if store_e < s or (head_gap and store_e < e):
                self.stats.skipped_inserts += 1
                parts.append(df.where(df["step_us"].between(start_us, grid_hi)))
                continue
            df.where(df["step_us"].between(s, store_e)).write.mode("append").parquet(
                data_dir
            )
            stored = True
            new_lo = min(new_lo, s)
            new_hi = store_e if new_hi is None else max(new_hi, store_e)
            # Serve the stored slice from the files the write just
            # produced: the write-back action above already ran the gap
            # query in full, so routing the returned frame through the
            # plan would compute it a second time when the caller
            # materializes.  Stored files hold disjoint step ranges, so
            # the range filter selects exactly this gap's rows.  Only
            # the safety-lag tail (store_e, e] — deliberately not
            # persisted — still comes from the plan.
            ret_lo, ret_hi = max(s, start_us), min(store_e, grid_hi)
            if ret_lo <= ret_hi:
                back = spark.read.parquet(data_dir)
                parts.append(back.where(back["step_us"].between(ret_lo, ret_hi)))
            if store_e < e:
                tail_lo = max(store_e + step_us, start_us)
                parts.append(df.where(df["step_us"].between(tail_lo, grid_hi)))
        if stored:
            self._write_meta(meta_path, _Meta(new_lo, new_hi, step_us, align_us))

        result = parts[0]
        for df in parts[1:]:
            result = result.unionByName(df)
        return result
