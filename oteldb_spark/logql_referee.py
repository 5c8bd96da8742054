"""Independent LogQL referee: a pure-Python transcription of the
upstream Loki evaluation semantics (pkg/logql: log pipeline stages,
sample extraction, range/vector aggregation), evaluated row-by-row
over an in-memory copy of the SAME log lines the Spark engine reads.

The vector layer (aggregations, binops, label_replace) is shared with
the PromQL referee — LogQL's metric grammar reuses Prometheus
semantics there, and the AST node classes are literally shared.  Only
the LogQL-specific parts are implemented here: the line pipeline
(selectors, line filters incl. ip(), parsers, label filters, line/
label_format) and the sample-extraction range aggregations.

Deliberate conventions (mirroring Loki):
- Log listings select ``start <= ts < end`` (end exclusive).
- Metric windows are ``(t - range, t]``.
- Label-matcher and label-filter regexes are fully anchored; line
  filter regexes are unanchored substring searches.
- A bare ``| json`` / ``| logfmt`` materializes every discovered
  field as a label; keys colliding with existing labels get the
  ``_extracted`` suffix.
- ``label_format dst=src`` RENAMES: dst takes src's value and src is
  removed (template forms keep their inputs).
- Labels with empty values are dropped from result identities.
"""

from __future__ import annotations

import ipaddress
import json
import math
import re
from dataclasses import dataclass, field

from .logql import ast as last
from .logql.parser import parse as parse_logql
from .referee import Referee, _quantile

_IP_IN_LINE = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
_ANSI = re.compile(r"\x1b\[[0-9;]*m")
_LABEL_CHARS = re.compile(r"[^a-zA-Z0-9_]")


@dataclass
class LogRow:
    ts_us: int
    body: str
    labels: dict[str, str]


@dataclass
class PipeRow:
    """One line moving through the pipeline."""

    ts_us: int
    line: str
    labels: dict[str, str] = field(default_factory=dict)


class LogQLReferee(Referee):
    """rows: the stored stream (already labeled); vector-layer
    machinery inherited from the PromQL referee."""

    def __init__(self, rows: list[LogRow]):
        super().__init__({}, lookback_us=0)
        self.rows = sorted(rows, key=lambda r: r.ts_us)

    # ---- public -------------------------------------------------------------

    def query(self, q: str, start_us: int, end_us: int, step_us: int):
        expr = parse_logql(q) if isinstance(q, str) else q
        if isinstance(expr, last.LogQuery):
            return "streams", self._listing(expr, start_us, end_us)
        return "matrix", self.query_range(expr, start_us, end_us, step_us)

    # ---- node dispatch ------------------------------------------------------

    def _eval(self, node, ts, qstart, qend):
        if isinstance(node, last.RangeAgg):
            return self._range_agg(node, ts)
        if isinstance(node, last.LogQuery):
            raise ValueError("log selector in metric context")
        return super()._eval(node, ts, qstart, qend)

    # ---- pipeline -----------------------------------------------------------

    def _listing(self, lq: last.LogQuery, start_us, end_us):
        out: dict[tuple, list] = {}
        for pr in self._pipeline(lq, start_us, end_us, end_exclusive=True):
            labels = {k: v for k, v in pr.labels.items() if v != ""}
            sig = tuple(sorted(labels.items()))
            out.setdefault(sig, []).append((pr.ts_us, pr.line))
        return [(dict(sig), sorted(vs)) for sig, vs in out.items()]

    def _pipeline(self, lq: last.LogQuery, lo_us, hi_us, *,
                  end_exclusive=False, lo_open=False):
        for row in self.rows:
            if end_exclusive:
                if not (lo_us <= row.ts_us < hi_us):
                    continue
            elif lo_open:
                if not (lo_us < row.ts_us <= hi_us):
                    continue
            elif not (lo_us <= row.ts_us <= hi_us):
                continue
            if not all(
                _match_label(m, row.labels.get(m.name, ""))
                for m in lq.selector.matchers
            ):
                continue
            pr = PipeRow(row.ts_us, row.body, dict(row.labels))
            if self._stages(pr, lq.stages):
                yield pr

    def _stages(self, pr: PipeRow, stages) -> bool:
        """Apply stages in place; False → line dropped."""
        for st in stages:
            if isinstance(st, last.LineFilter):
                if not _line_filter(pr.line, st):
                    return False
            elif isinstance(st, last.ParserStage):
                _parser_stage(pr, st)
            elif isinstance(st, last.LabelFilter):
                if not self._label_filter(pr, st.node):
                    return False
            elif isinstance(st, last.LineFormat):
                pr.line = _render_template(st.template, pr)
            elif isinstance(st, last.LabelFormat):
                for dst, src, is_tmpl in st.actions:
                    if is_tmpl:
                        pr.labels[dst] = _render_template(src, pr)
                    else:
                        # rename: dst takes src's value, src removed;
                        # an empty/missing source DELETES dst (Loki
                        # labels.Builder.Set deletes on empty)
                        v = pr.labels.pop(src, "")
                        if v == "":
                            pr.labels.pop(dst, None)
                        else:
                            pr.labels[dst] = v
            elif isinstance(st, last.DropKeep):
                if st.kind == "drop":
                    for l in st.labels:
                        pr.labels.pop(l, None)
                else:
                    pr.labels = {
                        k: v for k, v in pr.labels.items() if k in st.labels
                    }
            elif isinstance(st, last.Distinct):
                raise ValueError("referee: distinct unsupported")
            else:
                raise ValueError(f"referee: unknown stage {st!r}")
        return True

    def _label_filter(self, pr: PipeRow, node) -> bool:
        if isinstance(node, tuple):
            op, a, b = node
            av = self._label_filter(pr, a.node if hasattr(a, "node") else a)
            bv = self._label_filter(pr, b.node if hasattr(b, "node") else b)
            return (av and bv) if op == "and" else (av or bv)
        return _label_pred(pr, node)

    # ---- metric layer -------------------------------------------------------

    def _range_agg(self, node: last.RangeAgg, ts: int):
        t = ts - node.offset_us
        lo = t - node.range_us
        lq = node.query
        unwrap = lq.unwrap
        series: dict[tuple, tuple[dict, list]] = {}
        any_line = False
        for pr in self._pipeline(lq, lo, t, lo_open=True):
            any_line = True
            labels = {k: v for k, v in pr.labels.items() if v != ""}
            if unwrap is not None:
                raw = labels.pop(unwrap.label, None)
                v = _unwrap_value(raw, unwrap.conv)
                if v is None:
                    labels["__error__"] = "SampleExtractionErr"
                    v = 0.0
            elif node.op in ("bytes_over_time", "bytes_rate"):
                v = float(len(pr.line.encode()))
            else:
                v = 1.0
            gl = _group(labels, node.grouping)
            sig = tuple(sorted(gl.items()))
            if sig not in series:
                series[sig] = (gl, [])
            series[sig][1].append((pr.ts_us, v))
        if node.op == "absent_over_time":
            if any_line:
                return []
            labels = {
                m.name: m.value
                for m in lq.selector.matchers
                if m.op == "=" and m.value != ""
            }
            return [(labels, 1.0)]
        out = []
        range_s = node.range_us / 1e6
        for gl, pairs in series.values():
            vals = [p[1] for p in pairs]
            op = node.op
            if op == "rate_counter":
                # unwrapped samples treated as a Prometheus counter:
                # reset-aware extrapolated rate (the engine routes
                # through rate_family("rate"); this is the same
                # upstream extrapolatedRate transcription the PromQL
                # referee uses)
                from .referee import _extrapolated_rate

                rv = _extrapolated_rate(
                    sorted(pairs), lo, t, is_counter=True, is_rate=True
                )
                if rv is not None:
                    out.append((gl, rv))
                continue
            if op == "count_over_time":
                v = float(len(vals))
            elif op == "rate":
                v = (
                    math.fsum(vals) / range_s
                    if unwrap is not None
                    else len(vals) / range_s
                )
            elif op in ("bytes_over_time", "sum_over_time"):
                v = math.fsum(vals)
            elif op == "bytes_rate":
                v = math.fsum(vals) / range_s
            elif op == "avg_over_time":
                v = math.fsum(vals) / len(vals)
            elif op == "min_over_time":
                v = min(vals)
            elif op == "max_over_time":
                v = max(vals)
            elif op == "first_over_time":
                v = vals[0]
            elif op == "last_over_time":
                v = vals[-1]
            elif op in ("stddev_over_time", "stdvar_over_time"):
                mean = math.fsum(vals) / len(vals)
                var = math.fsum((x - mean) ** 2 for x in vals) / len(vals)
                v = math.sqrt(var) if op == "stddev_over_time" else var
            elif op == "quantile_over_time":
                v = _quantile(float(node.q), vals)
            else:
                raise ValueError(f"referee: unsupported range agg {op}")
            out.append((gl, v))
        return out


# --- stage helpers -----------------------------------------------------------


def _match_label(m: last.LabelMatcher, value: str) -> bool:
    if m.op == "=":
        return value == m.value
    if m.op == "!=":
        return value != m.value
    hit = re.fullmatch(f"(?:{m.value})", value) is not None
    return hit if m.op == "=~" else not hit


def _ip_match(ip_s: str, pattern: str) -> bool:
    try:
        ip = ipaddress.ip_address(ip_s)
    except ValueError:
        return False
    try:
        if "/" in pattern:
            return ip in ipaddress.ip_network(pattern, strict=False)
        if "-" in pattern:
            lo, hi = pattern.split("-")
            return (
                ipaddress.ip_address(lo) <= ip <= ipaddress.ip_address(hi)
            )
        return ip == ipaddress.ip_address(pattern)
    except ValueError:
        return False


def _line_filter(line: str, f: last.LineFilter) -> bool:
    if f.ips:
        found = _IP_IN_LINE.findall(line)
        hit = any(_ip_match(ip, p) for ip in found for p in f.ips)
        return hit if f.op == "|=" else not hit
    values = [f.value, *f.alts]
    if f.op == "|=":
        return any(v in line for v in values)
    if f.op == "!=":
        return not any(v in line for v in values)
    if f.op in ("|~", "!~"):
        hit = any(re.search(v, line) for v in values)
        return hit if f.op == "|~" else not hit
    # pattern line filters: literals + <_> wildcards, whole line
    pats = [_pattern_regex(v) for v in values]
    hit = any(re.fullmatch(p, line, re.DOTALL) for p in pats)
    return hit if f.op == "|>" else not hit


def _pattern_regex(pattern: str) -> str:
    parts = re.split(r"<_>", pattern)
    return "(?s:" + ".*?".join(re.escape(p) for p in parts) + ")"


def _flatten_json(obj, prefix="") -> dict[str, str]:
    out = {}
    for k, v in obj.items():
        key = _LABEL_CHARS.sub("_", f"{prefix}{k}")
        if isinstance(v, dict):
            out.update(_flatten_json(v, f"{key}_"))
        elif isinstance(v, list):
            continue  # bare json skips arrays (Loki jsonParser)
        elif isinstance(v, bool):
            out[key] = "true" if v else "false"
        elif v is None:
            out[key] = "null"
        else:
            out[key] = v if isinstance(v, str) else str(v)
    return out


def _add_extracted(pr: PipeRow, extracted: dict[str, str]):
    for k, v in extracted.items():
        key = k if k not in pr.labels else f"{k}_extracted"
        pr.labels[key] = v


def _parser_stage(pr: PipeRow, st: last.ParserStage):
    if st.kind == "json":
        try:
            obj = json.loads(pr.line, parse_float=str, parse_int=str)
            if not isinstance(obj, dict):
                raise ValueError("not an object")
        except Exception:
            pr.labels["__error__"] = "JSONParserErr"
            return
        if st.exprs:
            for lbl, path in st.exprs.items():
                v = obj
                ok = True
                for part in path.lstrip("$.").split("."):
                    if isinstance(v, dict) and part in v:
                        v = v[part]
                    else:
                        ok = False
                        break
                if ok and not isinstance(v, (dict, list)):
                    pr.labels[lbl] = v if isinstance(v, str) else str(v)
        else:
            _add_extracted(pr, _flatten_json(obj))
    elif st.kind == "logfmt":
        pairs = {}
        try:
            for tok in re.findall(
                r'(\w[\w.]*)=("(?:[^"\\]|\\.)*"|\S*)', pr.line
            ):
                k, v = tok
                if v.startswith('"'):
                    v = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
                pairs[_LABEL_CHARS.sub("_", k)] = v
        except Exception:
            pr.labels["__error__"] = "LogfmtParserErr"
            return
        if st.exprs:
            for lbl, key in st.exprs.items():
                if key in pairs:
                    pr.labels[lbl] = pairs[key]
        else:
            _add_extracted(pr, pairs)
    elif st.kind == "regexp":
        m = re.search(st.param, pr.line)
        if m:
            for name, val in m.groupdict().items():
                if val is not None:
                    pr.labels[name] = val
    elif st.kind == "pattern":
        # build regex: literals joined by capture groups / wildcards
        rx = ""
        rest = st.param
        while rest:
            m = re.match(r"<(_|\w+)>", rest)
            if m:
                rx += ".*?" if m.group(1) == "_" else f"(?P<{m.group(1)}>.*?)"
                rest = rest[m.end():]
            else:
                rx += re.escape(rest[0])
                rest = rest[1:]
        mm = re.fullmatch(f"(?s:{rx})", pr.line)
        if mm:
            for name, val in mm.groupdict().items():
                if val is not None:
                    pr.labels[name] = val
    elif st.kind == "unpack":
        try:
            obj = json.loads(pr.line, parse_float=str, parse_int=str)
            if not isinstance(obj, dict):
                raise ValueError
        except Exception:
            pr.labels["__error__"] = "JSONParserErr"
            return
        for k, v in obj.items():
            if k == "_entry":
                pr.line = v if isinstance(v, str) else str(v)
            elif isinstance(v, str):
                _add_extracted(pr, {k: v})
    elif st.kind == "decolorize":
        pr.line = _ANSI.sub("", pr.line)
    elif st.kind == "noop":
        pass  # parser-inserted placeholder (e.g. before bare unwrap)
    else:
        raise ValueError(f"referee: unknown parser {st.kind}")


_DUR_UNITS = {
    "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
    "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0, "w": 604800.0,
}
_BYTE_UNITS = {
    "b": 1, "kb": 1000, "mb": 1000**2, "gb": 1000**3, "tb": 1000**4,
    "kib": 1024, "mib": 1024**2, "gib": 1024**3, "tib": 1024**4,
}


def _parse_duration_s(s: str) -> float | None:
    total = 0.0
    for m in re.finditer(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w)", s):
        total += float(m.group(1)) * _DUR_UNITS[m.group(2)]
    return total if s and re.fullmatch(
        r"(?:\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h|d|w))+", s
    ) else None


def _parse_bytes(s: str) -> float | None:
    m = re.fullmatch(r"(\d+(?:\.\d+)?)\s*([kKmMgGtT]?i?[bB])", s)
    if not m:
        return None
    return float(m.group(1)) * _BYTE_UNITS[m.group(2).lower()]


def _num(v: str) -> float | None:
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _label_pred(pr: PipeRow, p: last.LabelPredicate) -> bool:
    val = pr.labels.get(p.label, "")
    if p.vtype == "string":
        return _match_label(
            last.LabelMatcher(p.label, "=" if p.op == "==" else p.op, p.value),
            val,
        )
    if p.vtype == "ip":
        hit = _ip_match(val, p.value)
        return hit if p.op in ("=", "==") else not hit
    if p.label not in pr.labels:
        # numeric/duration/bytes filter on an ABSENT label: the line
        # simply fails the predicate — no error (Loki label_filter.go)
        return False
    lv = _num(val)
    if p.vtype == "duration":
        rv = _parse_duration_s(p.value)
        lv = _parse_duration_s(val) if lv is None else lv
    elif p.vtype == "bytes":
        rv = _parse_bytes(p.value)
        lv = _parse_bytes(val) if lv is None else lv
    else:
        rv = _num(p.value)
    if lv is None or rv is None:
        pr.labels["__error__"] = "LabelFilterErr"
        return True  # errored lines stay, tagged (Loki semantics)
    return {
        "=": lv == rv, "==": lv == rv, "!=": lv != rv,
        ">": lv > rv, ">=": lv >= rv, "<": lv < rv, "<=": lv <= rv,
    }[p.op]


def _group(labels: dict, grouping) -> dict:
    if grouping is None:
        return dict(labels)
    if grouping.without:
        drop = set(grouping.labels)
        return {k: v for k, v in labels.items() if k not in drop}
    return {l: labels[l] for l in grouping.labels if labels.get(l)}


# --- Go template mini-renderer ----------------------------------------------

_TMPL_TOKEN = re.compile(r"\{\{(.*?)\}\}", re.DOTALL)


def _go_time_string(ts_us: int) -> str:
    """Go time.Time.String() for a UTC timestamp:
    2006-01-02 15:04:05.999999999 +0000 UTC (fraction trimmed)."""
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
    base = dt.strftime("%Y-%m-%d %H:%M:%S")
    frac = ts_us % 1_000_000
    if frac:
        base += ("." + f"{frac:06d}000").rstrip("0")
    return base + " +0000 UTC"


def _render_template(template: str, pr: PipeRow) -> str:
    """Minimal text/template: {{ .label }}, {{ __line__ }},
    {{ __timestamp__ }}, pipelines with ToLower/ToUpper/quote/trunc N."""

    def resolve_arg(tok: str) -> str:
        if tok.startswith('"') and tok.endswith('"'):
            return tok[1:-1]
        if tok.startswith("."):
            return pr.labels.get(tok[1:], "")
        if tok == "__line__":
            return pr.line
        if tok == "__timestamp__":
            return _go_time_string(pr.ts_us)
        return tok

    def split_pipeline(src: str) -> list[str]:
        # '|' inside a quoted literal (printf "%s|%s") is not a pipe
        parts, buf, in_q = [], [], False
        for ch in src:
            if ch == '"':
                in_q = not in_q
                buf.append(ch)
            elif ch == "|" and not in_q:
                parts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        parts.append("".join(buf))
        return [p.strip() for p in parts]

    def render_action(src: str) -> str:
        parts = split_pipeline(src)
        head = parts[0]
        head_toks = head.split()
        if head_toks and head_toks[0] == "printf":
            # {{ printf "fmt" args... }} — Go fmt verbs %s/%d/%v over
            # resolved args (the only verbs the gate templates use)
            import shlex

            toks = shlex.split(head, posix=False)
            fmt = resolve_arg(toks[1])
            args = [resolve_arg(a) for a in toks[2:]]
            val = re.sub(r"%[sdv]", lambda m: str(args.pop(0)), fmt)
        elif head.startswith('"') and head.endswith('"'):
            val = head[1:-1]
        elif head.startswith("."):
            val = pr.labels.get(head[1:], "")
        elif head == "__line__":
            val = pr.line
        elif head == "__timestamp__":
            val = _go_time_string(pr.ts_us)
        else:
            val = ""
        for fn in parts[1:]:
            name, *args = fn.split()
            if name == "ToLower" or name == "lower":
                val = val.lower()
            elif name == "ToUpper" or name == "upper":
                val = val.upper()
            elif name == "quote":
                val = json.dumps(val)
            elif name == "trunc":
                val = val[: int(args[0])]
            elif name == "alignRight":
                val = val.rjust(int(args[0]))
            elif name == "alignLeft":
                val = val.ljust(int(args[0]))
            else:
                raise ValueError(f"referee template: unknown fn {name}")
        return val

    # string-literal-aware action spans, like Go's text/template lexer
    # (and the engine's templates.iter_actions): "}}" inside a quoted
    # literal does not close the action
    from .functions.templates import iter_actions

    out = []
    pos = 0
    for start, end, body in iter_actions(template):
        out.append(template[pos:start])
        out.append(render_action(body.strip()))
        pos = end
    out.append(template[pos:])
    return "".join(out)


# --- corpus comparison helpers ----------------------------------------------


def build_logql_referee(spark, sf_dir: str) -> "LogQLReferee":
    """Referee over the SAME lines the engine's LogSource reads."""
    from .signals import logs_frame

    rows = [
        LogRow(
            r["ts_us"],
            r["body"],
            {
                "service": r["service"],
                "env": r["env"],
                "level": r["level"],
            },
        )
        for r in logs_frame(spark, sf_dir).collect()
    ]
    return LogQLReferee(rows)


def engine_logql_to_points(resp):
    """Engine wire response → ("streams"|"matrix", canonical dict)."""
    data = resp["data"]
    if data["resultType"] == "streams":
        out = {}
        for s in data["result"]:
            labels = {k: v for k, v in s["stream"].items() if v not in (None, "")}
            sig = tuple(sorted(labels.items()))
            vals = sorted(
                (int(t) // 1000, line) for t, line in s["values"]
            )
            out.setdefault(sig, []).extend(vals)
        return "streams", {k: sorted(v) for k, v in out.items()}
    out = {}
    for s in data["result"]:
        labels = {k: v for k, v in s["metric"].items() if v not in (None, "")}
        sig = tuple(sorted(labels.items()))
        pts = {
            int(round(float(t) * 1e6)): float(v) for t, v in s["values"]
        }
        out.setdefault(sig, {}).update(pts)
    return "matrix", out


def referee_logql_to_points(kind, series):
    if kind == "streams":
        return kind, {
            tuple(sorted(labels.items())): sorted(vs)
            for labels, vs in series
        }
    return kind, {
        tuple(sorted(labels.items())): dict(pts) for labels, pts in series
    }


def compare_logql_entry(leng, referee, q: str,
                        start_us: int, end_us: int, step_us: int):
    """match | mismatch | both_error | engine_only_error |
    referee_only_error, plus a detail string."""
    from .referee import diff_points, values_equal

    eng_err = ref_err = None
    eng_kind = ref_kind = None
    eng = ref = None
    try:
        eng_kind, eng = engine_logql_to_points(
            leng.query_range(q, start_us, end_us, step_us)
        )
    except Exception as ex:  # noqa: BLE001 — classified, not hidden
        eng_err = f"{type(ex).__name__}: {ex}"[:200]
    try:
        ref_kind, ref = referee_logql_to_points(
            *referee.query(q, start_us, end_us, step_us)
        )
    except Exception as ex:  # noqa: BLE001
        ref_err = f"{type(ex).__name__}: {ex}"[:200]
    if eng_err and ref_err:
        return "both_error", f"eng={eng_err} ref={ref_err}"
    if eng_err:
        return "engine_only_error", eng_err
    if ref_err:
        return "referee_only_error", ref_err
    if eng_kind != ref_kind:
        return "mismatch", f"result kinds differ: {eng_kind} vs {ref_kind}"
    if eng_kind == "matrix":
        d = diff_points(eng, ref)
        return ("mismatch", d) if d else ("match", "")
    if set(eng) != set(ref):
        extra = [dict(s) for s in set(eng) - set(ref)][:2]
        missing = [dict(s) for s in set(ref) - set(eng)][:2]
        return (
            "mismatch",
            f"stream sets differ: engine-only={extra} referee-only={missing}",
        )
    for sig in eng:
        if eng[sig] != ref[sig]:
            e_only = [x for x in eng[sig] if x not in ref[sig]][:2]
            r_only = [x for x in ref[sig] if x not in eng[sig]][:2]
            return (
                "mismatch",
                f"{dict(sig)}: lines differ engine-only={e_only} "
                f"referee-only={r_only}",
            )
    return "match", ""


def _unwrap_value(raw: str | None, conv: str | None) -> float | None:
    if raw is None:
        return None
    if conv in ("duration", "duration_seconds"):
        v = _parse_duration_s(raw)
        return v if v is not None else _num(raw)
    if conv == "bytes":
        v = _parse_bytes(raw)
        return v if v is not None else _num(raw)
    return _num(raw)
