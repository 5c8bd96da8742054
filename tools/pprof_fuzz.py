"""Differential pprof fuzzing: random profiles (random function
universes, stacks of depth 1–10, shared prefixes, repeated stacks,
multi-payload merges) encoded to pprof wire bytes, decoded by the REAL
Spark ingest path (``sources/pprof.pprof_samples`` → ``flame_nodes``),
and compared against an independent pure-Python flame fold computed
from the GENERATED spec — so the wire round-trip (string table,
location/function resolution, leaf-first ordering) and the distributed
prefix fold are both under test.

Usage:  python tools/pprof_fuzz.py [n_cases] [seed]
Imported by tests/test_referee_fuzz.py.
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

_FUNCS = [f"fn_{i}" for i in range(14)] + ["main", "runtime.gc", "io.read"]


def gen_stacks(rng: random.Random) -> list[tuple[list[str], int]]:
    stacks = []
    # a few shared prefixes so internal nodes accumulate across stacks
    prefixes = [
        ["main"],
        ["main", rng.choice(_FUNCS)],
        [rng.choice(_FUNCS)],
    ]
    for _ in range(rng.randint(3, 24)):
        base = list(rng.choice(prefixes))
        depth = rng.randint(0, 8)
        stack = base + [rng.choice(_FUNCS) for _ in range(depth)]
        stacks.append((stack, rng.randint(1, 10_000)))
    if rng.random() < 0.5:  # exact duplicate stacks must merge
        stacks.append((list(stacks[0][0]), rng.randint(1, 100)))
    return stacks


def reference_fold(all_stacks: list[tuple[list[str], int]], sep: str = ">"):
    """Independent flame fold: prefix → (self, total, depth)."""
    out: dict[str, list] = {}
    for stack, value in all_stacks:
        for i in range(1, len(stack) + 1):
            node = sep.join(stack[:i])
            cur = out.setdefault(node, [0, 0, i])
            if i == len(stack):
                cur[0] += value
            cur[1] += value
            cur[2] = min(cur[2], i)
    return {k: tuple(v) for k, v in out.items()}


def run_pprof_fuzz(spark, n: int, seed: int, verbose: bool = False):
    from oteldb_spark.sources.pprof import (
        encode_profile,
        flame_nodes,
        pprof_samples,
    )

    rng = random.Random(seed)
    stats = {"match": 0, "mismatch": 0}
    failures = []
    for _ in range(n):
        n_payloads = rng.randint(1, 3)
        specs = [gen_stacks(rng) for _ in range(n_payloads)]
        payloads = [
            (encode_profile(sp, time_nanos=1),) for sp in specs
        ]
        df = spark.createDataFrame(payloads, "payload binary")
        got = {
            r.stack: (r.self, r.total, r.depth)
            for r in flame_nodes(pprof_samples(df)).collect()
        }
        want = reference_fold([sv for sp in specs for sv in sp])
        if got == want:
            stats["match"] += 1
        else:
            stats["mismatch"] += 1
            eng_only = {k: v for k, v in got.items() if want.get(k) != v}
            ref_only = {k: v for k, v in want.items() if got.get(k) != v}
            detail = f"engine={dict(list(eng_only.items())[:3])} referee={dict(list(ref_only.items())[:3])}"
            failures.append((f"case seed={seed}", "mismatch", detail))
            if verbose:
                print(f"[mismatch] {detail[:300]}")
    return stats, failures


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from oteldb_spark.session import get_spark

    spark = get_spark()
    stats, failures = run_pprof_fuzz(spark, n, seed, verbose=True)
    import json

    print(json.dumps({**stats, "total": n}))
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
