"""Interleaved two-checkout per-gate A/B bench.

The bench host throttles in multi-minute windows (3-5x on
Python-worker-bound paths — OPTIMIZATION_r12 machine-speed note), so
two whole-suite bench runs taken minutes apart are NOT comparable:
a per-gate "regression" can be a throttle window.  This tool holds
TWO live worker processes, one per checkout (each imports its own
``oteldb_spark`` tree and owns its own Spark session), and times each
gate ALTERNATELY on both inside the same machine window — A,B on even
rounds, B,A on odd rounds, so slow drift cancels to first order.  The
report carries min and median per side plus the ratios; read the MIN
ratio for code-attributable deltas (the min of interleaved rounds is
the reading least contaminated by a throttle dip).

Usage:
  python tools/ab_bench.py --a /path/checkoutA --b /path/checkoutB \
      --gates name1,name2[,...] [--rounds 4] \
      [--sf-dir /root/testdata/sf0.1] [--cpus N] [--out FILE]

(Each checkout is typically a git worktree of this repo at the ref
under comparison.)  Internal: ``--worker CHECKOUT SF_DIR CPUS`` runs
the per-checkout loop (stdin commands -> stdout timings).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def worker_main(checkout: str, sf_dir: str, cpus: int) -> None:
    sys.path.insert(0, checkout)
    from oteldb_spark.operators.pin import release_pins
    from oteldb_spark.queries import QUERIES
    from oteldb_spark.session import get_spark

    spark = get_spark(f"ab-bench-{os.path.basename(checkout)}", cpus=cpus)
    sys.stdout.write("READY\n")
    sys.stdout.flush()
    for line in sys.stdin:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "QUIT":
            break
        cmd, gate = parts[0], parts[1]
        try:
            release_pins()
            spark.catalog.clearCache()
            t0 = time.time()
            n = QUERIES[gate](spark, sf_dir).count()
            dt = time.time() - t0
            if cmd == "TIME":
                sys.stdout.write(f"OK {gate} {dt:.4f} {n}\n")
            else:  # WARM
                sys.stdout.write(f"WARMED {gate}\n")
        except Exception as exc:  # surface, don't wedge the driver
            sys.stdout.write(f"ERR {gate} {type(exc).__name__}\n")
        sys.stdout.flush()
    spark.stop()


def _spawn(checkout: str, sf_dir: str, cpus: int) -> subprocess.Popen:
    p = subprocess.Popen(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--worker",
            checkout,
            sf_dir,
            str(cpus),
        ],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        bufsize=1,
    )
    line = p.stdout.readline().strip()
    assert line == "READY", f"worker for {checkout} failed: {line!r}"
    return p


def _ask(p: subprocess.Popen, cmd: str, gate: str) -> tuple[float, str]:
    p.stdin.write(f"{cmd} {gate}\n")
    p.stdin.flush()
    reply = p.stdout.readline().strip().split()
    if reply[0] == "ERR":
        raise RuntimeError(f"{gate}: worker error {reply}")
    return (float(reply[2]) if cmd == "TIME" else 0.0), (
        reply[3] if cmd == "TIME" else ""
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker_main(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="checkout A (e.g. baseline)")
    ap.add_argument("--b", required=True, help="checkout B (e.g. candidate)")
    ap.add_argument("--gates", required=True, help="comma-separated names")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    gates = args.gates.split(",")

    pa = _spawn(os.path.abspath(args.a), args.sf_dir, args.cpus)
    pb = _spawn(os.path.abspath(args.b), args.sf_dir, args.cpus)
    try:
        for g in gates:  # one untimed warm pass per side
            _ask(pa, "WARM", g)
            _ask(pb, "WARM", g)
        res: dict[str, dict[str, list[float]]] = {
            g: {"a": [], "b": []} for g in gates
        }
        rows: dict[str, set[str]] = {g: set() for g in gates}
        for r in range(args.rounds):
            order = [("a", pa), ("b", pb)]
            if r % 2:
                order.reverse()
            for g in gates:
                for side, p in order:
                    dt, n = _ask(p, "TIME", g)
                    res[g][side].append(dt)
                    rows[g].add(n)
                    print(
                        f"# round {r} {side} {g}: {dt:.3f}s ({n} rows)",
                        file=sys.stderr,
                    )
        report = {}
        for g in gates:
            a, b = res[g]["a"], res[g]["b"]
            report[g] = {
                "a_min": round(min(a), 4),
                "b_min": round(min(b), 4),
                "ratio_min_a_over_b": round(min(a) / max(min(b), 1e-9), 3),
                "a_median": round(statistics.median(a), 4),
                "b_median": round(statistics.median(b), 4),
                "a_all": [round(x, 4) for x in a],
                "b_all": [round(x, 4) for x in b],
                "rows_agree": len(rows[g]) == 1,
            }
        doc = {
            "tool": "ab_bench",
            "a": args.a,
            "b": args.b,
            "rounds": args.rounds,
            "sf_dir": args.sf_dir,
            "cpus": args.cpus,
            "gates": report,
        }
        print(json.dumps(doc))
        if args.out:
            with open(args.out, "w") as fh:
                json.dump(doc, fh, indent=1)
    finally:
        for p in (pa, pb):
            try:
                p.stdin.write("QUIT\n")
                p.stdin.flush()
            except Exception:
                pass
            p.wait(timeout=60)


if __name__ == "__main__":
    main()
