"""Compliance-corpus EXECUTION harness.

The reference gates its engines against the promql/logql compliance
testers (``internal/promcompliance``, ``internal/lokicompliance``:
template corpora expanded over variant dimensions, executed against a
reference engine).  Here every corpus entry is rewritten onto the
driver's testdata schema, executed through the engine facades, and
fingerprinted; ``tests/test_compliance_exec.py`` diffs the
fingerprints against recorded goldens (semantic-drift detection) and
enforces an executed-fraction floor.

Corpus sources (public query sets, shipped with the reference):
  dev/local/ch-compliance/promql-test-queries.yml        (119 entries)
  dev/local/ch-logql-compliance/logql-test-queries.yml    (98 entries)

Variant dimensions mirror ``promcompliance/testcases/expand.go`` and
``lokicompliance/expand.go``; one representative value is pinned per
dimension (full cross-products would be ~550 queries — the families
they vary over are separately oracle-gated in oteldb_spark/queries/).

Truth model (why fingerprints, not recorded Prometheus outputs): the
reference's harness diffs against a LIVE Prometheus/Loki spun up via
docker-compose (``dev/local/ch-compliance/run.sh``); it ships NO
recorded result files, and this environment has neither network nor
the binaries, so a recorded-output witness cannot be produced here.
The operative external anchors are instead (a) the pure-Python
referee transcriptions of the upstream evaluation loops, which
execute the SAME corpora with required 100% point-level agreement
(tests/test_referee_corpus.py, test_logql_referee_corpus.py, plus the
per-gate sweep in tools/referee_gates.py), and (b) the four e2e
replays against the reference's own checked-in corpora with its exact
expected counts.  The fingerprints here add drift detection on top —
a semantic change to any corpus answer fails the diff even when both
referee and engine move together.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field

# --- corpus loading (YAML-lite: the two files use only `- query:`
# scalars / |- blocks plus variant_args / should_fail / should_be_empty
# keys, so a dependency-free parser suffices) --------------------------------


@dataclass
class Entry:
    query: str
    variant_args: list[str] = field(default_factory=list)
    should_fail: bool = False
    should_be_empty: bool = False


def load_corpus(path: str) -> list[Entry]:
    entries: list[Entry] = []
    cur: Entry | None = None
    block_indent: int | None = None
    block_lines: list[str] | None = None

    def flush_block():
        nonlocal block_lines, block_indent
        if cur is not None and block_lines is not None:
            cur.query = "\n".join(block_lines)
        block_lines = None
        block_indent = None

    for raw in open(path, encoding="utf-8"):
        line = raw.rstrip("\n")
        if block_lines is not None:
            stripped = line.strip()
            indent = len(line) - len(line.lstrip())
            if stripped and (block_indent is None or indent >= block_indent):
                if block_indent is None:
                    block_indent = indent
                block_lines.append(line[block_indent:])
                continue
            flush_block()
        s = line.strip()
        if s.startswith("#") or not s:
            continue
        m = re.match(r"^-?\s*query:\s*(.*)$", s)
        if m:
            cur = Entry(query="")
            entries.append(cur)
            val = m.group(1).strip()
            if val in ("|-", "|"):
                block_lines = []
                block_indent = None
            else:
                cur.query = _unquote_scalar(val)
            continue
        if cur is None:
            continue
        m = re.match(r"^variant_args:\s*\[(.*)\]\s*$", s)
        if m:
            cur.variant_args = [
                v.strip().strip("'\"") for v in m.group(1).split(",") if v.strip()
            ]
            continue
        if re.match(r"^should_fail:\s*true", s):
            cur.should_fail = True
        elif re.match(r"^should_be_empty:\s*true", s):
            cur.should_be_empty = True
    flush_block()
    return [e for e in entries if e.query]


def _unquote_scalar(val: str) -> str:
    if val and val[0] == '"' and val.endswith('"'):
        return val[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    if val and val[0] == "'" and val.endswith("'"):
        return val[1:-1].replace("''", "'")
    return val


# --- variant expansion -------------------------------------------------------

# one pinned value per dimension; ranges/offsets sized to the testdata
# density (events ~minutes apart over 2024-01)
VARIANT_PICK = {
    # promcompliance/testcases/expand.go
    "range": "1h",
    "offset": "5m",
    "simpleAggrOp": "sum",
    "simpleTimeAggrOp": "avg",
    "topBottomOp": "topk",
    "quantile": "0.9",
    "arithBinOp": "+",
    "compBinOp": "<=",
    "binOp": "*",
    "simpleMathFunc": "abs",
    "extrapolatedRateFunc": "rate",
    "clampFunc": "clamp_min",
    "instantRateFunc": "irate",
    "dateFunc": "day_of_month",
    "smoothingFactor": "0.5",
    "trendFactor": "0.5",
    # lokicompliance/expand.go
    "topN": "2",
    "simpleRangeAggOp": "count_over_time",
    "unwrapRangeAggOp": "avg_over_time",
    "groupRangeAggOp": "max_over_time",
    # the ref's unwrap dims name fields of its nginx demo logs; the
    # testdata bodies are {"k": N}, so unwrap binds to k
    "unwrapExpr": "unwrap k",
    "unwrapLabels": "k",
    "simpleVecAggOp": "sum",
    "sortVecAggOp": "sort",
    "topBottomVecAggOp": "topk",
    "lineFilterOp": "|=",
    "cmpBinOp": ">=",
    "setBinOp": "and",
}

_QUOTE_TMPL = re.compile(r'\{\{\s*"((?:[^"\\]|\\.)*)"\s*\|\s*quote\s*\}\}')
_DIM = re.compile(r"\{\{\s*\.(\w+)\s*\}\}")


def expand(query: str) -> str:
    """Instantiate `{{ .dim }}` template holes with the pinned variant
    values; `{{ "..." | quote }}` renders the quoted literal (used to
    escape LogQL line_format templates inside the corpus templates)."""
    holes: list[str] = []

    def hold(m: re.Match) -> str:
        holes.append('"' + m.group(1) + '"')
        return f"\x00{len(holes) - 1}\x00"

    out = _QUOTE_TMPL.sub(hold, query)
    out = _DIM.sub(lambda m: VARIANT_PICK[m.group(1)], out)
    for i, h in enumerate(holes):
        out = out.replace(f"\x00{i}\x00", h)
    return out


# --- testdata rewrites -------------------------------------------------------

# demo-service metrics → driver testdata metrics (semantics class kept:
# gauges stay gauges, the cumulative CPU counter maps to the counter)
_PROM_REWRITES = [
    (r"\bnode_memory_MemTotal_bytes\b", "events_gauge"),
    (r"\bdemo_memory_usage_bytes\b", "events_gauge"),
    (r"\bdemo_cpu_usage_seconds_total\b", "events_value_total"),
    (r"\bdemo_disk_usage_bytes\b", "events_gauge"),
    (r"\bdemo_batch_last_success_timestamp_seconds\b", "events_gauge"),
    (r"\bdemo_num_cpus\b", "events_gauge"),
    (r"\bdemo_intermittent_metric\b", "events_gauge"),
    (r"\bdemo_api_request_duration_seconds_bucket\b", "events_gauge"),
]

_LOGQL_REWRITES = [
    (r'job="varlogs"', 'env="prod"'),
    (r'job=~"\.\*varlogs\.\*"', 'env=~".*pro.*"'),
    # nginx-demo log fields → the testdata bodies' single field k
    # ({"k": N}, N in 0..100), preserving each entry's tested path:
    # string equality stays a string compare on the parsed label,
    # numeric thresholds stay numeric, regexes stay regexes.  Entries
    # designed to be empty ("no way line ...", absent labels) and the
    # ip()/bytes filters (no such tokens in the bodies) stay empty.
    (r'\| regexp `\\\{\.\*"method":"\(\?P<method>\\w\+\)"\.\*\\\}`',
     r'| regexp `\\{"k": (?P<method>\\d+)\\}`'),
    (r'\| pattern `<_>"method":"<method>"<_>`', '| pattern `{"k": <method>}`'),
    (r'method = "HEAD"', 'method =~ "1."'),
    (r'method != "HEAD"', 'method !~ "1."'),
    (r'method =~ "\(HEAD\|GET\)"', 'method =~ "(1.|2.)"'),
    (r'method !~ "\(HEAD\|GET\)"', 'method !~ "(1.|2.)"'),
    # after | json the discovered field is k, not method
    (r"\| json \| method", "| json | k"),
    (r"status >= 400", "k >= 40"),
    (r"status > 400", "k > 40"),
    (r"took >= 1ms", "k >= 10"),
    (r"size >= 1KB", "k <= 90"),
    (r'\|= "HEAD" or "GET"', '|= "9" or "8"'),
    (r'\|= "HEAD"', '|= "9"'),
    (r'\|~ "\(HEAD\|GET\)"', '|~ "(1|2)"'),
]


def rewrite_promql(q: str) -> str:
    for pat, repl in _PROM_REWRITES:
        q = re.sub(pat, repl, q)
    return q


def rewrite_logql(q: str) -> str:
    for pat, repl in _LOGQL_REWRITES:
        q = re.sub(pat, repl, q)
    return q


# --- execution + fingerprinting ---------------------------------------------


def canonical_hash(resp) -> str:
    """Order-insensitive fingerprint of a wire-shape response."""

    def canon(node):
        if isinstance(node, dict):
            if "result" in node and isinstance(node["result"], list):
                series = []
                for s in node["result"]:
                    s = dict(s)
                    if isinstance(s.get("values"), list):
                        s["values"] = sorted(map(list, s["values"]))
                    series.append(s)
                node = dict(node)
                node["result"] = sorted(
                    series, key=lambda s: json.dumps(s, sort_keys=True)
                )
            return {k: canon(v) for k, v in sorted(node.items())}
        if isinstance(node, list):
            return [canon(v) for v in node]
        return node

    payload = json.dumps(canon(resp), sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def run_corpus(entries, execute) -> list[dict]:
    """Execute every entry; return per-entry records.

    ``execute(query)`` returns the wire-shape response (raising on
    error).  status: ok | empty | error | xfail (should_fail entries
    that did fail)."""
    out = []
    for i, e in enumerate(entries):
        q = e.query
        rec = {"idx": i, "query": q}
        try:
            resp = execute(q)
            rows = _result_size(resp)
            rec["status"] = "empty" if rows == 0 else "ok"
            rec["rows"] = rows
            rec["hash"] = canonical_hash(resp)
        except Exception as ex:  # noqa: BLE001 — recorded, not hidden
            rec["status"] = "xfail" if e.should_fail else "error"
            rec["error"] = f"{type(ex).__name__}: {ex}"[:160]
        out.append(rec)
    return out


PROMQL_CORPUS = "/root/reference/dev/local/ch-compliance/promql-test-queries.yml"
LOGQL_CORPUS = (
    "/root/reference/dev/local/ch-logql-compliance/logql-test-queries.yml"
)

# evaluation window: one day of the 2024-01 testdata month, 6h steps
START_US = 1_704_067_200_000_000
END_US = START_US + 86_400_000_000
STEP_US = 6 * 3_600_000_000


def run_all(spark, sf_dir: str) -> dict[str, list[dict]]:
    """Execute both corpora through the engine facades; returns
    {"promql": [...], "logql": [...]} per-entry records."""
    from .engine import LogQLEngine, PromQLEngine
    from .logql import LogSource
    from .promql import MetricSource
    from .signals import counter_points_frame, logs_frame

    counters = counter_points_frame(spark, sf_dir).cache()
    logs = logs_frame(spark, sf_dir).cache()
    peng = PromQLEngine(
        MetricSource(
            df=counters,
            metrics={
                "events_gauge": "gauge",
                "events_value_total": "counter_mod",
            },
            label_cols=["mtype", "instance"],
        ),
        lookback_us=12 * 3_600_000_000,
    )
    leng = LogQLEngine(
        LogSource(
            df=logs,
            label_cols={"service": "service", "env": "env", "level": "level"},
        )
    )
    prom_entries = load_corpus(PROMQL_CORPUS)
    for e in prom_entries:
        e.query = rewrite_promql(expand(e.query))
    logql_entries = load_corpus(LOGQL_CORPUS)
    for e in logql_entries:
        e.query = rewrite_logql(expand(e.query))
    out = {
        "promql": run_corpus(
            prom_entries,
            lambda q: peng.query_range(q, START_US, END_US, STEP_US),
        ),
        "logql": run_corpus(
            logql_entries,
            lambda q: leng.query_range(q, START_US, END_US, STEP_US),
        ),
    }
    counters.unpersist()
    logs.unpersist()
    return out


def _result_size(resp) -> int:
    if isinstance(resp, dict):
        data = resp.get("data", resp)
        res = data.get("result") if isinstance(data, dict) else None
        if isinstance(res, list):
            return sum(
                len(s.get("values", [s.get("value")] if "value" in s else []))
                for s in res
            )
    if isinstance(resp, list):
        return len(resp)
    return 0
