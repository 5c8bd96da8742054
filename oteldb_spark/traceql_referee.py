"""Independent TraceQL referee: a pure-Python transcription of the
reference's spanset-pipeline semantics (``internal/traceql``:
dynamic-typed field evaluation op.go:96-114, structural relations
spanset_op.go:40-233 extended to the full parsed 16-op table
op.go:218-239, scalar-filter/by()/coalesce() stages
traceqlengine/pipeline.go), evaluated span-by-span over an in-memory
copy of the SAME spans the Spark engine reads.

This is NOT a restatement of the Spark compiler — it walks parent
pointers per trace the way the reference engine does, so a divergence
between the two flags a semantics bug in one of them
(tools/traceql_fuzz.py drives both on random trees and queries).

Conventions transcribed from the reference:
- Type-mismatched comparisons yield null → the span is dropped;
  boolean combinators are three-valued (Kleene, SQL/Go-iterator
  equivalent).
- ``=~`` / ``!~`` are UNANCHORED substring regex searches
  (regexp.MatchString semantics).
- Sibling ``~`` matches on parent equality including two parentless
  (root) spans of the same trace, and requires a DIFFERENT span on
  the other side.
- Structural output is always the right-hand side's matching spans;
  ``!op`` = rhs matches minus the positive relation; ``&op`` = both
  endpoints of the relation.
- Scalar filters aggregate per spanset (trace, split further by any
  open ``by()`` groups, merged by ``coalesce()``); aggregates ignore
  nulls, and a group whose aggregate is null (no non-null inputs)
  never passes the comparison.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

from .traceql import parser as P

_NUM = (int, float)


class TraceQLRefereeError(ValueError):
    pass


def _kleene_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return bool(a) and bool(b)


def _kleene_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return bool(a) or bool(b)


class TraceQLReferee:
    """Evaluate TraceQL over a list of span dicts.

    Each span dict carries ``trace_id``, ``span_id``,
    ``parent_span_id`` (None for roots) plus the intrinsic fields
    ``name`` (str), ``status_code`` (int), ``kind`` (int),
    ``duration_us`` (number), ``start_us`` (number); ``attr_map``
    maps attribute names as written in queries (``service``,
    ``resource.service.name``, …) to span-dict keys.
    """

    def __init__(self, spans: list[dict], attr_map: dict[str, str]):
        self.spans = spans
        self.attr_map = attr_map
        self.by_key: dict[tuple, dict] = {}
        self.children: dict[tuple, list[dict]] = defaultdict(list)
        for s in spans:
            key = (s["trace_id"], s["span_id"])
            if key in self.by_key:
                raise TraceQLRefereeError(f"duplicate span key {key}")
            self.by_key[key] = s
        for s in spans:
            self.children[(s["trace_id"], s["parent_span_id"])].append(s)

    # ---- trace context ---------------------------------------------------

    def _root_span(self, trace_id):
        """The parentless span with the smallest span_id (matches the
        deterministic root pick when a trace carries several roots)."""
        roots = [
            s
            for s in self.children.get((trace_id, None), [])
        ]
        if not roots:
            return None
        return min(roots, key=lambda s: s["span_id"])

    def _trace_duration(self, trace_id) -> float:
        spans = [s for s in self.spans if s["trace_id"] == trace_id]
        return float(
            max(s["start_us"] + s["duration_us"] for s in spans)
            - min(s["start_us"] for s in spans)
        )

    def _nested_coords(self, trace_id) -> dict:
        """Per-trace nested-set coords (nestedSetLeft/Right/Parent),
        computed independently of the engine's pandas DFS: Tempo
        enter/exit numbering (counter ticks on entry for left and on
        exit for right, 1..2n per trace) with children and roots in
        ascending span_id order; spans whose parent is None/self/absent
        act as roots; cycle remnants break at their smallest span_id;
        ns_parent is the numbering-tree parent's left, -1 for roots."""
        memo = getattr(self, "_ns_memo", None)
        if memo is None:
            memo = self._ns_memo = {}
        if trace_id in memo:
            return memo[trace_id]
        rows = [s for s in self.spans if s["trace_id"] == trace_id]
        sids = sorted({s["span_id"] for s in rows})
        idset = set(sids)
        pid = {}
        for s in sorted(rows, key=lambda r: r["span_id"]):
            pid.setdefault(s["span_id"], s["parent_span_id"])
        kids: dict = {}
        roots = []
        for sid in sids:
            p = pid[sid]
            if p is None or p == sid or p not in idset:
                roots.append(sid)
            else:
                kids.setdefault(p, []).append(sid)
        left: dict = {}
        right: dict = {}
        parent: dict = {}
        visited: set = set()
        counter = 0

        def walk(starts):
            nonlocal counter
            stack = [(r, False, None) for r in reversed(starts)]
            while stack:
                node, done, par = stack.pop()
                if done:
                    # enter/exit numbering: right ticks on subtree exit
                    counter += 1
                    right[node] = counter
                    continue
                if node in visited:
                    continue
                visited.add(node)
                counter += 1
                left[node] = counter
                parent[node] = par
                stack.append((node, True, par))
                for c in reversed(kids.get(node, ())):
                    if c not in visited:
                        stack.append((c, False, node))

        walk(roots)
        remaining = sorted(s for s in sids if s not in visited)
        while remaining:
            walk([remaining[0]])
            remaining = sorted(s for s in sids if s not in visited)
        out = {
            sid: (
                left[sid],
                right[sid],
                -1 if parent[sid] is None else left[parent[sid]],
            )
            for sid in sids
        }
        memo[trace_id] = out
        return out

    # ---- field evaluation ------------------------------------------------

    def _attr_value(self, span: dict, a: P.Attr):
        if a.scope == "intrinsic":
            intr = {
                "duration": "duration_us",
                "name": "name",
                "status": "status_code",
                "kind": "kind",
            }
            if a.name in intr:
                v = span.get(intr[a.name])
                return float(v) if isinstance(v, _NUM) else v
            if a.name in ("rootName", "rootServiceName"):
                root = self._root_span(span["trace_id"])
                if root is None:
                    return None
                if a.name == "rootName":
                    return root["name"]
                key = self.attr_map.get("service.name") or self.attr_map.get(
                    "service"
                )
                return root.get(key) if key else None
            if a.name == "traceDuration":
                return self._trace_duration(span["trace_id"])
            if a.name == "childCount":
                return float(
                    len(self.children.get(
                        (span["trace_id"], span["span_id"]), ()))
                )
            if a.name in ("nestedSetLeft", "nestedSetRight", "nestedSetParent"):
                l, r, p = self._nested_coords(span["trace_id"])[span["span_id"]]
                return float(
                    {"nestedSetLeft": l, "nestedSetRight": r,
                     "nestedSetParent": p}[a.name]
                )
            # colon-scoped intrinsics: first-match over events/links
            # (attribute.go:67-84 / evaluater.go:562-669)
            if a.name == "span:id":
                return float(span["span_id"])
            if a.name == "span:parentID":
                p = span["parent_span_id"]
                return None if p is None else float(p)
            if a.name == "trace:id":
                return float(span["trace_id"])
            if a.name == "event:name":
                for e in span.get("events") or []:
                    if e["name"] != "":
                        return e["name"]
                return None
            if a.name == "event:timeSinceStart":
                for e in span.get("events") or []:
                    d = e["ts_us"] - span["start_us"]
                    if d != 0:
                        return float(d)
                return None
            if a.name in ("link:traceID", "link:spanID"):
                key = "trace_id" if a.name == "link:traceID" else "span_id"
                for ln in span.get("links") or []:
                    if ln[key] is not None:
                        return float(ln[key])
                return None
            raise TraceQLRefereeError(f"referee: intrinsic {a.name}")
        if a.scope == "event":
            for e in span.get("events") or []:
                if a.name in e["attrs"]:
                    return e["attrs"][a.name]
            return None
        if a.scope == "link":
            for ln in span.get("links") or []:
                if a.name in ln["attrs"]:
                    return ln["attrs"][a.name]
            return None
        if a.scope == "parent":
            pk = self._parent_key((span["trace_id"], span["span_id"]))
            if pk is None:
                return None  # parentless span: nil → comparisons drop
            parent = self.by_key[pk]
            intr = {
                "duration": "duration_us",
                "name": "name",
                "status": "status_code",
                "kind": "kind",
            }
            if a.name in intr:
                v = parent.get(intr[a.name])
            else:
                key = self.attr_map.get(a.name)
                if key is None:
                    raise TraceQLRefereeError(
                        f"referee: parent attribute {a.name}"
                    )
                v = parent.get(key)
            return float(v) if isinstance(v, _NUM) else v
        key = self.attr_map.get(a.name)
        if key is None and a.scope in ("span", "resource", "instrumentation"):
            key = self.attr_map.get(f"{a.scope}.{a.name}")
        if key is None:
            return None
        v = span.get(key)
        return float(v) if isinstance(v, _NUM) else v

    def _eval_field(self, e, span: dict):
        if isinstance(e, P.Lit):
            if e.kind in ("number", "duration", "status", "kind"):
                return float(e.value)
            return e.value
        if isinstance(e, P.Attr):
            return self._attr_value(span, e)
        if isinstance(e, P.FieldOp):
            if e.op == "!":
                v = self._eval_field(e.lhs, span)
                if v is None:
                    return None
                if not isinstance(v, bool):
                    return None  # type mismatch
                return not v
            if e.op == "neg":
                v = self._eval_field(e.lhs, span)
                return -v if isinstance(v, _NUM) else None
            if e.op == "&&":
                return _kleene_and(
                    self._eval_field(e.lhs, span), self._eval_field(e.rhs, span)
                )
            if e.op == "||":
                return _kleene_or(
                    self._eval_field(e.lhs, span), self._eval_field(e.rhs, span)
                )
            a = self._eval_field(e.lhs, span)
            b = self._eval_field(e.rhs, span)
            if e.op in ("=~", "!~"):
                if not isinstance(a, str) or not isinstance(b, str):
                    return None
                hit = re.search(b, a) is not None
                return hit if e.op == "=~" else not hit
            if a is None or b is None:
                return None
            if e.op in ("=", "!=", ">", ">=", "<", "<="):
                both_num = isinstance(a, _NUM) and isinstance(b, _NUM)
                both_str = isinstance(a, str) and isinstance(b, str)
                if not (both_num or both_str):
                    return None  # dynamic typing: mismatch → null
                try:
                    return {
                        "=": lambda: a == b,
                        "!=": lambda: a != b,
                        ">": lambda: a > b,
                        ">=": lambda: a >= b,
                        "<": lambda: a < b,
                        "<=": lambda: a <= b,
                    }[e.op]()
                except TypeError:
                    return None
            if e.op in ("+", "-", "*", "/", "%"):
                if not (isinstance(a, _NUM) and isinstance(b, _NUM)):
                    return None
                if e.op == "/":
                    return a / b if b != 0 else None
                if e.op == "%":
                    return math.fmod(a, b) if b != 0 else None
                return {"+": a + b, "-": a - b, "*": a * b}[e.op]
            raise TraceQLRefereeError(f"referee: field op {e.op}")
        raise TraceQLRefereeError(f"referee: bad field expr {e!r}")

    def _match_set(self, spanset: P.Spanset) -> set:
        if spanset.expr is None:
            return set(self.by_key)
        out = set()
        for key, s in self.by_key.items():
            if self._eval_field(spanset.expr, s) is True:
                out.add(key)
        return out

    # ---- structural relations -------------------------------------------

    def _parent_key(self, key: tuple):
        s = self.by_key[key]
        if s["parent_span_id"] is None:
            return None
        pk = (s["trace_id"], s["parent_span_id"])
        return pk if pk in self.by_key else None

    def _ancestor_keys(self, key: tuple) -> set:
        out = set()
        cur = self._parent_key(key)
        while cur is not None and cur not in out:
            out.add(cur)
            cur = self._parent_key(cur)
        return out

    def _child_keys(self, key: tuple) -> list:
        t, s = key
        return [(t, c["span_id"]) for c in self.children.get((t, s), [])]

    def _descendant_keys(self, key: tuple) -> set:
        out: set = set()
        frontier = self._child_keys(key)
        while frontier:
            nxt = []
            for k in frontier:
                if k in out:
                    continue
                out.add(k)
                nxt.extend(self._child_keys(k))
            frontier = nxt
        return out

    def _siblings_in(self, key: tuple, pool: set) -> bool:
        s = self.by_key[key]
        t = s["trace_id"]
        for other in self.children.get((t, s["parent_span_id"]), []):
            ok = (t, other["span_id"])
            if ok != key and ok in pool:
                return True
        return False

    def _relation(self, op: str, lset: set, rset: set) -> set:
        if op == ">":
            return {r for r in rset if self._parent_key(r) in lset}
        if op == "<":
            return {
                r for r in rset if any(c in lset for c in self._child_keys(r))
            }
        if op == ">>":
            return {r for r in rset if self._ancestor_keys(r) & lset}
        if op == "<<":
            return {r for r in rset if self._descendant_keys(r) & lset}
        if op == "~":
            return {r for r in rset if self._siblings_in(r, lset)}
        if op in ("!>", "!>>", "!~"):
            pos = self._relation(op[1:], lset, rset)
            return rset - pos
        if op.startswith("&"):
            rel = op[1:]
            fwd = self._relation(rel, lset, rset)
            mirror_rel = {">": "<", "<": ">", ">>": "<<", "<<": ">>", "~": "~"}[
                rel
            ]
            back = self._relation(mirror_rel, rset, lset)
            return fwd | back
        raise TraceQLRefereeError(f"referee: structural op {op}")

    def _structural(self, node) -> set:
        if isinstance(node, P.Spanset):
            return self._match_set(node)
        if isinstance(node, P.Structural):
            if node.op in ("&&", "||"):
                lset = self._structural(node.lhs)
                rset = self._structural(node.rhs)
                if node.op == "||":
                    return lset | rset
                lt = {t for t, _ in lset}
                rt = {t for t, _ in rset}
                both = lt & rt
                return {k for k in (lset | rset) if k[0] in both}
            if not isinstance(node.lhs, P.Spanset) or not isinstance(
                node.rhs, P.Spanset
            ):
                raise TraceQLRefereeError(
                    "referee: nested structural chains need parentheses"
                )
            lset = self._match_set(node.lhs)
            rset = self._match_set(node.rhs)
            return self._relation(node.op, lset, rset)
        raise TraceQLRefereeError(f"referee: bad node {node!r}")

    # ---- pipeline stages -------------------------------------------------

    def query(self, q) -> set:
        """Evaluate; returns the set of matching (trace_id, span_id)."""
        ast = P.parse(q) if isinstance(q, str) else q
        keys = self._structural(ast.root)
        # (key, group-value tuple) per span; group cols accumulate via
        # by() and reset at coalesce()
        cur: list[tuple] = [(k, ()) for k in sorted(keys)]
        for stage in ast.stages:
            if isinstance(stage, P.Group):
                nxt = []
                for k, g in cur:
                    v = self._eval_field(stage.by, self.by_key[k])
                    if v is None:
                        continue  # span with no group value → no spanset
                    nxt.append((k, g + (v,)))
                cur = nxt
            elif isinstance(stage, P.Coalesce):
                cur = [(k, ()) for k, _ in cur]
            elif isinstance(stage, P.ScalarFilter):
                groups: dict[tuple, list] = defaultdict(list)
                for k, g in cur:
                    groups[(k[0],) + g].append((k, g))
                keep = set()
                for gk, members in groups.items():
                    if stage.agg == "count":
                        agg = float(len(members))
                    else:
                        vals = []
                        for k, _ in members:
                            span = self.by_key[k]
                            if stage.attr is not None:
                                v = self._attr_value(span, stage.attr)
                            else:
                                v = float(span["duration_us"])
                            if isinstance(v, _NUM):
                                vals.append(float(v))
                        if not vals:
                            continue  # null aggregate never passes
                        agg = {
                            "max": max,
                            "min": min,
                            "sum": math.fsum,
                            "avg": lambda x: math.fsum(x) / len(x),
                        }[stage.agg](vals)
                    passed = {
                        "=": agg == stage.value,
                        "!=": agg != stage.value,
                        ">": agg > stage.value,
                        ">=": agg >= stage.value,
                        "<": agg < stage.value,
                        "<=": agg <= stage.value,
                    }[stage.op]
                    if passed:
                        keep.add(gk)
                cur = [(k, g) for k, g in cur if ((k[0],) + g) in keep]
            elif isinstance(stage, P.Select):
                pass  # projection only — span identity unchanged
            else:
                raise TraceQLRefereeError(f"referee: stage {stage!r}")
        return {k for k, _ in cur}

    # ---- metrics layer ---------------------------------------------------

    def query_metrics(
        self, q, *, start_us: int, end_us: int, step_us: int, range_us: int
    ) -> dict:
        """TraceQL metrics: ``{filter} | fn() [by (...)] | stages`` →
        {(label values..., step_us): value}.  Matched spans become
        samples at their start timestamp; each step t aggregates the
        trailing window (t - range, t] (empty windows emit nothing);
        second-stage topk/bottomk keep k series per step with ties
        broken by the label columns."""
        ast = P.parse(q) if isinstance(q, str) else q
        fn_at = next(
            (
                i
                for i, s in enumerate(ast.stages)
                if isinstance(s, (P.MetricFn, P.Compare))
            ),
            None,
        )
        if fn_at is None:
            raise TraceQLRefereeError("referee: not a metrics query")
        fn = ast.stages[fn_at]
        if isinstance(fn, P.Compare):
            raise TraceQLRefereeError("referee: compare() not modeled")
        second = ast.stages[fn_at + 1 :]
        base = P.TraceQuery(ast.root, ast.stages[:fn_at])
        keys = self.query(base)

        samples = []  # (label tuple, ts_us, sample)
        for k in sorted(keys):
            span = self.by_key[k]
            labels = tuple(
                self._eval_field(a, span) for a in fn.by
            )
            if fn.attr is not None:
                v = self._eval_field(fn.attr, span)
                if not isinstance(v, _NUM) or isinstance(v, bool):
                    v = None
                else:
                    v = float(v)
            else:
                v = 1.0
            samples.append((labels, float(span["start_us"]), v))

        range_s = range_us / 1e6
        out: dict = {}
        t = start_us
        while t <= end_us:
            window: dict[tuple, list] = {}
            for labels, ts, v in samples:
                if t - range_us < ts <= t:
                    window.setdefault(labels, []).append(v)
            for labels, vals in window.items():
                if fn.name == "rate":
                    val = len(vals) / range_s
                elif fn.name == "count_over_time":
                    val = float(len(vals))
                else:
                    nn = [v for v in vals if v is not None]
                    if not nn:
                        val = None  # all-null window → null value row
                    elif fn.name == "sum_over_time":
                        val = math.fsum(nn)
                    elif fn.name == "avg_over_time":
                        val = math.fsum(nn) / len(nn)
                    elif fn.name == "min_over_time":
                        val = min(nn)
                    elif fn.name == "max_over_time":
                        val = max(nn)
                    elif fn.name == "quantile_over_time":
                        val = _percentile_cont(nn, fn.q)
                    else:
                        raise TraceQLRefereeError(
                            f"referee: metrics fn {fn.name}"
                        )
                out[labels + (t,)] = val
            t += step_us

        for st in second:
            if isinstance(st, P.TopK):
                by_step: dict[float, list] = {}
                for key, val in out.items():
                    by_step.setdefault(key[-1], []).append((key, val))
                keep = {}
                for _, rows in by_step.items():
                    rows.sort(
                        key=lambda kv: (
                            -kv[1] if st.op == "topk" else kv[1],
                            kv[0][:-1],
                        )
                    )
                    for key, val in rows[: st.limit]:
                        keep[key] = val
                out = keep
            elif isinstance(st, P.MetricsFilter):
                import operator as _op

                cmp = {
                    ">": _op.gt, ">=": _op.ge, "<": _op.lt,
                    "<=": _op.le, "=": _op.eq, "!=": _op.ne,
                }[st.op]
                out = {
                    k: v
                    for k, v in out.items()
                    if v is not None and cmp(v, st.value)
                }
            elif isinstance(st, P.MetricsScalarOp):
                f = {
                    "+": lambda v: v + st.value,
                    "-": lambda v: v - st.value,
                    "*": lambda v: v * st.value,
                    "/": lambda v: v / st.value,
                }[st.op]
                out = {
                    k: (f(v) if v is not None else None)
                    for k, v in out.items()
                }
            else:
                raise TraceQLRefereeError(f"referee: metrics stage {st!r}")
        return out


def _percentile_cont(vals: list, q: float) -> float:
    """SQL percentile_cont / Spark F.percentile: linear interpolation
    at index q*(n-1) over the sorted values."""
    s = sorted(vals)
    if len(s) == 1:
        return s[0]
    idx = q * (len(s) - 1)
    lo = int(math.floor(idx))
    hi = int(math.ceil(idx))
    if lo == hi:
        return s[lo]
    frac = idx - lo
    return s[lo] * (1 - frac) + s[hi] * frac
