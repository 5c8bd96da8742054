"""Independent PromQL referee: a pure-Python transcription of the
upstream Prometheus evaluation semantics (promql/engine.go,
promql/functions.go, promql/quantile.go), evaluated sample-by-sample
over an in-memory copy of the SAME points the Spark engine reads.

Purpose (the compliance-anchoring gap): the Spark plans and their
DuckDB oracle SQL are written together, so a shared misreading of the
PromQL spec would pass both.  No live Prometheus exists in this
environment (the reference diffs against a real server via
``cmd/promql-compliance-tester``); the closest available external
truth is a third, independent implementation transcribed directly from
the upstream algorithms.  This module shares the PromQL *parser* with
the engine (syntax only) and none of the numeric/evaluation code.

Deliberate, documented conventions:

- Series labels in results DROP ``__name__`` unless ``keep_name`` is
  set: the Spark engine's wire output carries only storage label
  columns.  Internally the referee tracks the metric name so upstream
  name-keeping/-dropping rules (comparison without ``bool`` keeps the
  name, arithmetic drops it, ``last_over_time`` keeps it, …) still
  shape series identity correctly before the final projection.
- Range-vector windows are left-open ``(t - range, t]`` and instant
  lookback is ``(t - lookback, t]`` — Prometheus 3.x semantics, which
  is also what the Spark operators implement.
- Label-matcher regexes are fully anchored (``^(?:re)$``), as in
  Prometheus.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from datetime import datetime, timezone

from .logql.ast import BinOp, Grouping, LabelReplace, Literal, VectorAgg
from .promql import ast
from .promql.parser import parse as parse_promql

NAN = float("nan")
INF = float("inf")


@dataclass
class RefSeries:
    """One stored series: immutable labels + ascending (ts_us, value)."""

    labels: dict[str, str]
    samples: list[tuple[int, float]]  # sorted by ts_us


@dataclass
class Referee:
    """metrics: metric name → list of RefSeries."""

    metrics: dict[str, list[RefSeries]]
    lookback_us: int = 5 * 60_000_000

    # ---- public entry -------------------------------------------------------

    def query_range(
        self, q: str, start_us: int, end_us: int, step_us: int,
        *, keep_name: bool = False,
    ) -> list[tuple[dict[str, str], list[tuple[int, float]]]]:
        """Evaluate ``q`` at every step; returns [(labels, points)]."""
        expr = parse_promql(q) if isinstance(q, str) else q
        out: dict[tuple, tuple[dict, list]] = {}
        for ts in range(start_us, end_us + 1, step_us):
            val = self._eval(expr, ts, start_us, end_us)
            if isinstance(val, float):
                vec = [({}, val)]
            else:
                vec = val
            seen_sigs = set()
            for labels, v in vec:
                labels = {
                    k: s for k, s in labels.items()
                    if s != "" and (keep_name or k != "__name__")
                }
                sig = tuple(sorted(labels.items()))
                if sig in seen_sigs:
                    raise ValueError(
                        f"duplicate series in result: {labels}"
                    )
                seen_sigs.add(sig)
                if sig not in out:
                    out[sig] = (labels, [])
                out[sig][1].append((ts, v))
        return list(out.values())

    # ---- instant evaluation -------------------------------------------------

    def _eval(self, node, ts: int, qstart: int, qend: int):
        """Instant evaluation → float (scalar) or [(labels, value)]."""
        if isinstance(node, Literal):
            return float(node.value)
        if isinstance(node, ast.VectorSelector):
            if node.range_us is not None:
                raise ValueError("range vector in instant context")
            return self._select_instant(node, ts, qstart, qend)
        if isinstance(node, VectorAgg):
            return self._agg(node, ts, qstart, qend)
        if isinstance(node, BinOp):
            return self._binop(node, ts, qstart, qend)
        if isinstance(node, LabelReplace):
            return self._label_replace(node, ts, qstart, qend)
        if isinstance(node, ast.FuncCall):
            return self._call(node, ts, qstart, qend)
        raise ValueError(f"referee: unsupported node {type(node).__name__}")

    def _resolve_at(self, at_us, ts: int, qstart: int, qend: int) -> int:
        if at_us is None:
            return ts
        if at_us == "start":
            return qstart
        if at_us == "end":
            return qend
        return int(at_us)

    def _series_for(self, sel: ast.VectorSelector):
        """Matching stored series → [(labels_with_name, samples)].

        Matchers are fully anchored; a matcher on an absent label
        compares against "" (Prometheus semantics)."""
        names = []
        name_matchers = [m for m in sel.matchers if m.name == "__name__"]
        rest = [m for m in sel.matchers if m.name != "__name__"]
        if sel.name is not None:
            names = [sel.name] if sel.name in self.metrics else []
        else:
            names = list(self.metrics)
        out = []
        for name in sorted(names):
            if not all(_match(m, name) for m in name_matchers):
                continue
            for s in self.metrics[name]:
                if all(_match(m, s.labels.get(m.name, "")) for m in rest):
                    out.append(({**s.labels, "__name__": name}, s.samples))
        return out

    def _select_instant(self, sel, ts, qstart, qend):
        t = self._resolve_at(sel.at_us, ts, qstart, qend) - sel.offset_us
        lo = t - self.lookback_us
        vec = []
        for labels, samples in self._series_for(sel):
            v = _point_at(samples, lo, t)
            if v is not None:
                vec.append((labels, v[1]))
        return vec

    # ---- range/matrix evaluation -------------------------------------------

    def _matrix(self, node, ts, qstart, qend):
        """Range-vector arg → [(labels, [(ts_us, value), ...])]."""
        if isinstance(node, ast.VectorSelector) and node.range_us is not None:
            if node.subquery_step_us is not None:
                # @/offset pin the subquery WINDOW; the inner instant
                # evals run at plain grid times
                inner = ast.VectorSelector(
                    node.name, node.matchers, None, 0, None, None
                )
                return self._subquery_matrix(
                    inner, node.range_us, node.subquery_step_us,
                    node.offset_us, node.at_us, ts, qstart, qend,
                )
            t = self._resolve_at(node.at_us, ts, qstart, qend) - node.offset_us
            lo = t - node.range_us
            out = []
            for labels, samples in self._series_for(node):
                win = [(st, sv) for st, sv in samples if lo < st <= t]
                if win:
                    out.append((labels, win))
            return out
        if isinstance(node, ast.FuncCall) and node.name == "__subquery__":
            return self._subquery_matrix(
                node.args[0], node.range_us, node.step_us,
                getattr(node, "offset_us", 0), None, ts, qstart, qend,
            )
        raise ValueError("referee: expected a range vector")

    def _subquery_matrix(self, inner, range_us, step_us, offset_us, at_us,
                         ts, qstart, qend):
        """Subquery: instant-evaluate ``inner`` at absolute multiples of
        the subquery step inside the (left-open) window, each with full
        lookback (promql/engine.go evalSubquery)."""
        if not step_us:
            step_us = 60_000_000  # default resolution: 1m
        t = self._resolve_at(at_us, ts, qstart, qend) - offset_us
        lo = t - range_us
        first = (lo // step_us) * step_us
        if first <= lo:
            first += step_us
        series: dict[tuple, tuple[dict, list]] = {}
        st = first
        while st <= t:
            val = self._eval(inner, st, qstart, qend)
            vec = [({}, val)] if isinstance(val, float) else val
            for labels, v in vec:
                sig = tuple(sorted(labels.items()))
                if sig not in series:
                    series[sig] = (labels, [])
                series[sig][1].append((st, v))
            st += step_us
        return list(series.values())

    # ---- aggregation --------------------------------------------------------

    def _agg(self, node: VectorAgg, ts, qstart, qend):
        vec = self._eval(node.expr, ts, qstart, qend)
        if isinstance(vec, float):
            vec = [({}, vec)]
        groups: dict[tuple, tuple[dict, list]] = {}
        keep_all = node.op in ("topk", "bottomk", "sort", "sort_desc")
        for labels, v in vec:
            gl = _group_labels(labels, node.grouping)
            sig = tuple(sorted(gl.items()))
            if sig not in groups:
                groups[sig] = (gl, [])
            groups[sig][1].append((labels, v))
        out = []
        op = node.op
        if op in ("sort", "sort_desc"):
            return vec  # ordering is not part of set-comparison identity
        for gl, members in groups.values():
            vals = [v for _, v in members]
            if op == "sum":
                out.append((gl, math.fsum(vals)))
            elif op == "min":
                out.append((gl, _agg_min(vals)))
            elif op == "max":
                out.append((gl, _agg_max(vals)))
            elif op == "avg":
                out.append((gl, math.fsum(vals) / len(vals)))
            elif op == "count":
                out.append((gl, float(len(vals))))
            elif op in ("stddev", "stdvar"):
                mean = math.fsum(vals) / len(vals)
                var = math.fsum((v - mean) ** 2 for v in vals) / len(vals)
                out.append((gl, math.sqrt(var) if op == "stddev" else var))
            elif op == "quantile":
                out.append((gl, _quantile(float(node.q), vals)))
            elif op == "count_values":
                buckets: dict[str, int] = {}
                for _, v in members:
                    key = _format_float(v)
                    buckets[key] = buckets.get(key, 0) + 1
                for key, n in buckets.items():
                    lb = dict(gl)
                    lb[str(node.q)] = key
                    out.append((lb, float(n)))
            elif op in ("topk", "bottomk"):
                k = int(node.k or 0)
                if k <= 0:
                    continue
                real = [(lb, v) for lb, v in members if not math.isnan(v)]
                nans = [(lb, v) for lb, v in members if math.isnan(v)]
                # upstream breaks value ties arbitrarily (heap order);
                # both this referee and the engine refine that to a
                # deterministic label-lexicographic tie-break
                real.sort(
                    key=lambda p: (
                        -p[1] if op == "topk" else p[1],
                        tuple(sorted(p[0].items())),
                    )
                )
                picked = (real + nans)[:k]
                for lb, v in picked:
                    out.append((dict(lb), v))
            elif op == "group":
                out.append((gl, 1.0))
            else:
                raise ValueError(f"referee: unsupported agg {op}")
        if keep_all:
            return out
        return out

    # ---- binary operators ---------------------------------------------------

    def _binop(self, node: BinOp, ts, qstart, qend):
        lhs = self._eval(node.lhs, ts, qstart, qend)
        rhs = self._eval(node.rhs, ts, qstart, qend)
        op = node.op
        if isinstance(lhs, float) and isinstance(rhs, float):
            if op in _COMPARISONS:
                if not node.bool_mode:
                    raise ValueError("comparison between scalars needs bool")
                return 1.0 if _compare(op, lhs, rhs) else 0.0
            return _arith(op, lhs, rhs)
        if op in ("and", "or", "unless"):
            return self._set_op(node, lhs, rhs)
        if isinstance(lhs, float) or isinstance(rhs, float):
            swap = isinstance(lhs, float)
            vec, scalar = (rhs, lhs) if swap else (lhs, rhs)
            out = []
            for labels, v in vec:
                l, r = (scalar, v) if swap else (v, scalar)
                if op in _COMPARISONS:
                    ok = _compare(op, l, r)
                    if node.bool_mode:
                        out.append((_drop_name(labels), 1.0 if ok else 0.0))
                    elif ok:
                        out.append((labels, v))
                else:
                    out.append((_drop_name(labels), _arith(op, l, r)))
            return out
        return self._vector_binop(node, lhs, rhs)

    def _set_op(self, node, lhs, rhs):
        if isinstance(lhs, float) or isinstance(rhs, float):
            raise ValueError("set operator requires vectors")
        sig = _signature_fn(node)
        rsigs = {sig(lb) for lb, _ in rhs}
        if node.op == "and":
            return [(lb, v) for lb, v in lhs if sig(lb) in rsigs]
        if node.op == "unless":
            return [(lb, v) for lb, v in lhs if sig(lb) not in rsigs]
        lsigs = {sig(lb) for lb, _ in lhs}
        return list(lhs) + [(lb, v) for lb, v in rhs if sig(lb) not in lsigs]

    def _vector_binop(self, node, lhs, rhs):
        sig = _signature_fn(node)
        many_left = node.group_left is not None
        many_right = node.group_right is not None
        include = node.group_left or node.group_right or []
        if many_right:
            lhs, rhs = rhs, lhs  # "many" side on the left below
        one: dict[tuple, tuple[dict, float]] = {}
        for lb, v in rhs:
            s = sig(lb)
            if s in one:
                raise ValueError(
                    "found duplicate series for the match group on the "
                    + ("left" if many_right else "right") + " side"
                )
            one[s] = (lb, v)
        out = []
        seen: dict[tuple, int] = {}
        for lb, v in lhs:
            s = sig(lb)
            if s not in one:
                continue
            olb, ov = one[s]
            if not (many_left or many_right):
                seen[s] = seen.get(s, 0) + 1
                if seen[s] > 1:
                    raise ValueError(
                        "found duplicate series for the match group on the "
                        + ("right" if many_right else "left") + " side"
                    )
            l, r = (ov, v) if many_right else (v, ov)
            result_labels = dict(lb)
            if node.op in _COMPARISONS and not node.bool_mode:
                if _compare(node.op, l, r):
                    out.append((result_labels, l))
                continue
            result_labels = _drop_name(result_labels)
            if not (many_left or many_right):
                # promql/engine.go resultMetric, one-to-one: on() keeps
                # only the matching labels; ignoring() drops them
                if node.on is not None:
                    result_labels = {
                        k: result_labels[k]
                        for k in node.on
                        if k in result_labels
                    }
                elif node.ignoring is not None:
                    result_labels = {
                        k: s for k, s in result_labels.items()
                        if k not in node.ignoring
                    }
            for extra in include:
                if extra in olb:
                    result_labels[extra] = olb[extra]
                else:
                    result_labels.pop(extra, None)
            if node.op in _COMPARISONS:
                out.append((result_labels, 1.0 if _compare(node.op, l, r) else 0.0))
            else:
                out.append((result_labels, _arith(node.op, l, r)))
        return out

    # ---- functions ----------------------------------------------------------

    def _label_replace(self, node: LabelReplace, ts, qstart, qend):
        vec = self._eval(node.expr, ts, qstart, qend)
        if isinstance(vec, float):
            raise ValueError("label_replace needs a vector")
        if not _VALID_LABEL.fullmatch(node.dst):
            raise ValueError(f"invalid destination label {node.dst!r}")
        try:
            rx = re.compile(f"^(?:{node.regex})$")
        except re.error as ex:
            raise ValueError(f"invalid regex: {ex}") from ex
        out = []
        for labels, v in vec:
            src = labels.get(node.src, "")
            m = rx.match(src)
            lb = dict(labels)
            if m:
                res = m.expand(_go_template_to_py(node.replacement))
                if res == "":
                    lb.pop(node.dst, None)
                else:
                    lb[node.dst] = res
            out.append((lb, v))
        return out

    def _call(self, node: ast.FuncCall, ts, qstart, qend):
        name = node.name
        if name == "time":
            return ts / 1e6
        if name == "pi":
            return math.pi
        if name == "vector":
            v = self._eval(node.args[0], ts, qstart, qend)
            return [({}, float(v))]
        if name == "scalar":
            vec = self._eval(node.args[0], ts, qstart, qend)
            if isinstance(vec, float):
                return vec
            return vec[0][1] if len(vec) == 1 else NAN
        if name in ("rate", "increase", "delta"):
            mat = self._matrix(node.args[0], ts, qstart, qend)
            rng = _range_of(node.args[0])
            # extrapolation bounds follow the SELECTED window: @ pins
            # it, offset shifts it (mixing pinned samples with the
            # step's own bounds produced negative counter rates)
            t = self._resolve_at(
                getattr(node.args[0], "at_us", None), ts, qstart, qend
            ) - _offset_of(node.args[0])
            out = []
            for labels, samples in mat:
                v = _extrapolated_rate(
                    samples, t - rng, t,
                    is_counter=name != "delta", is_rate=name == "rate",
                )
                if v is not None:
                    out.append((_drop_name(labels), v))
            return out
        if name in ("irate", "idelta"):
            mat = self._matrix(node.args[0], ts, qstart, qend)
            out = []
            for labels, samples in mat:
                v = _instant_value(samples, is_rate=name == "irate")
                if v is not None:
                    out.append((_drop_name(labels), v))
            return out
        if name in ("deriv", "predict_linear"):
            mat = self._matrix(node.args[0], ts, qstart, qend)
            out = []
            for labels, samples in mat:
                if len(samples) < 2:
                    continue
                if name == "deriv":
                    slope, _ = _linear_regression(samples, samples[0][0])
                    out.append((_drop_name(labels), slope))
                else:
                    dur = self._eval(node.args[1], ts, qstart, qend)
                    slope, intercept = _linear_regression(samples, ts)
                    out.append((_drop_name(labels), slope * float(dur) + intercept))
            return out
        if name in ("resets", "changes"):
            mat = self._matrix(node.args[0], ts, qstart, qend)
            out = []
            for labels, samples in mat:
                n = 0
                for i in range(1, len(samples)):
                    a, b = samples[i - 1][1], samples[i][1]
                    if name == "resets":
                        n += b < a
                    else:
                        n += (b != a) and not (math.isnan(a) and math.isnan(b))
                out.append((_drop_name(labels), float(n)))
            return out
        if name == "double_exponential_smoothing":
            sf = float(self._eval(node.args[1], ts, qstart, qend))
            tf = float(self._eval(node.args[2], ts, qstart, qend))
            if not (0 < sf < 1) or not (0 < tf < 1):
                raise ValueError("smoothing/trend factor out of (0,1)")
            mat = self._matrix(node.args[0], ts, qstart, qend)
            out = []
            for labels, samples in mat:
                v = _double_exp_smoothing(samples, sf, tf)
                if v is not None:
                    out.append((_drop_name(labels), v))
            return out
        if name.endswith("_over_time"):
            return self._over_time(name, node, ts, qstart, qend)
        if name == "absent":
            vec = self._eval(node.args[0], ts, qstart, qend)
            if isinstance(vec, float) or vec:
                return []
            return [(_absent_labels(node.args[0]), 1.0)]
        if name == "timestamp":
            arg = node.args[0]
            if isinstance(arg, ast.VectorSelector) and arg.range_us is None:
                # special case: raw sample timestamps for a direct
                # selector (promql/functions.go funcTimestamp)
                t = self._resolve_at(arg.at_us, ts, qstart, qend) - arg.offset_us
                lo = t - self.lookback_us
                out = []
                for labels, samples in self._series_for(arg):
                    pt = _point_at(samples, lo, t)
                    if pt is not None:
                        out.append((_drop_name(labels), pt[0] / 1e6))
                return out
            vec = self._eval(arg, ts, qstart, qend)
            if isinstance(vec, float):
                raise ValueError("timestamp needs a vector")
            return [(_drop_name(lb), ts / 1e6) for lb, _ in vec]
        if name in _DATE_FUNCS:
            if node.args:
                vec = self._eval(node.args[0], ts, qstart, qend)
                if isinstance(vec, float):
                    vec = [({}, vec)]
            else:
                vec = [({}, ts / 1e6)]
            return [
                (_drop_name(lb), _DATE_FUNCS[name](v)) for lb, v in vec
            ]
        if name in ("clamp", "clamp_min", "clamp_max"):
            vec = self._eval(node.args[0], ts, qstart, qend)
            if isinstance(vec, float):
                raise ValueError(f"{name} needs a vector")
            if name == "clamp":
                lo = float(self._eval(node.args[1], ts, qstart, qend))
                hi = float(self._eval(node.args[2], ts, qstart, qend))
                if lo > hi:
                    return []
                return [(_drop_name(lb), max(lo, min(hi, v))) for lb, v in vec]
            bound = float(self._eval(node.args[1], ts, qstart, qend))
            fn = max if name == "clamp_min" else min
            return [(_drop_name(lb), fn(v, bound)) for lb, v in vec]
        if name == "round":
            vec = self._eval(node.args[0], ts, qstart, qend)
            to = (
                float(self._eval(node.args[1], ts, qstart, qend))
                if len(node.args) > 1 else 1.0
            )
            return [
                (_drop_name(lb), math.floor(v / to + 0.5) * to)
                for lb, v in vec
            ]
        if name == "label_join":
            vec = self._eval(node.args[0], ts, qstart, qend)
            dst, sep, srcs = node.args[1], node.args[2], node.args[3:]
            if not _VALID_LABEL.fullmatch(dst):
                raise ValueError(f"invalid destination label {dst!r}")
            out = []
            for labels, v in vec:
                lb = dict(labels)
                joined = sep.join(labels.get(s, "") for s in srcs)
                if joined == "":
                    lb.pop(dst, None)
                else:
                    lb[dst] = joined
                out.append((lb, v))
            return out
        if name == "histogram_quantile":
            q = float(self._eval(node.args[0], ts, qstart, qend))
            vec = self._eval(node.args[1], ts, qstart, qend)
            if isinstance(vec, float):
                raise ValueError("histogram_quantile needs a vector")
            groups: dict[tuple, tuple[dict, list]] = {}
            for labels, v in vec:
                le = labels.get("le")
                if le is None:
                    continue
                gl = {
                    k: s for k, s in labels.items()
                    if k not in ("le", "__name__")
                }
                sig = tuple(sorted(gl.items()))
                if sig not in groups:
                    groups[sig] = (gl, [])
                groups[sig][1].append((float(le), v))
            out = []
            for gl, buckets in groups.values():
                v = _bucket_quantile(q, buckets)
                if v is not None:
                    out.append((gl, v))
            return out
        if name in ("sort", "sort_desc", "sort_by_label", "sort_by_label_desc"):
            vec = self._eval(node.args[0], ts, qstart, qend)
            return vec  # ordering is not part of set-comparison identity
        if name in _SIMPLE_FUNCS:
            vec = self._eval(node.args[0], ts, qstart, qend)
            if isinstance(vec, float):
                raise ValueError(f"{name} needs a vector, got scalar")
            fn = _SIMPLE_FUNCS[name]
            return [(_drop_name(lb), fn(v)) for lb, v in vec]
        raise ValueError(f"referee: unsupported function {name}()")

    def _over_time(self, name, node, ts, qstart, qend):
        qarg = None
        if name == "quantile_over_time":
            qarg = float(self._eval(node.args[0], ts, qstart, qend))
            mat = self._matrix(node.args[1], ts, qstart, qend)
        else:
            mat = self._matrix(node.args[0], ts, qstart, qend)
        if name == "absent_over_time":
            if mat:
                return []
            arg = node.args[0]
            inner = arg if isinstance(arg, ast.VectorSelector) else None
            return [(_absent_labels(inner) if inner else {}, 1.0)]
        out = []
        for labels, samples in mat:
            vals = [v for _, v in samples]
            if not vals:
                continue
            if name == "avg_over_time":
                v = math.fsum(vals) / len(vals)
            elif name == "sum_over_time":
                v = math.fsum(vals)
            elif name == "count_over_time":
                v = float(len(vals))
            elif name == "min_over_time":
                v = _agg_min(vals)
            elif name == "max_over_time":
                v = _agg_max(vals)
            elif name == "last_over_time":
                v = vals[-1]
            elif name == "first_over_time":
                v = vals[0]
            elif name == "present_over_time":
                v = 1.0
            elif name in ("stddev_over_time", "stdvar_over_time"):
                mean = math.fsum(vals) / len(vals)
                var = math.fsum((x - mean) ** 2 for x in vals) / len(vals)
                v = math.sqrt(var) if name == "stddev_over_time" else var
            elif name == "quantile_over_time":
                v = _quantile(qarg, vals)
            elif name == "mad_over_time":
                med = _quantile(0.5, vals)
                v = _quantile(0.5, [abs(x - med) for x in vals])
            elif name == "ts_of_last_over_time":
                v = samples[-1][0] / 1e6
            elif name == "ts_of_max_over_time":
                # upstream iterates with >=: later ties win
                best_t, best_v = samples[0]
                for t, x in samples[1:]:
                    if x >= best_v or math.isnan(best_v):
                        best_t, best_v = t, x
                v = best_t / 1e6
            elif name == "ts_of_min_over_time":
                best_t, best_v = samples[0]
                for t, x in samples[1:]:
                    if x <= best_v or math.isnan(best_v):
                        best_t, best_v = t, x
                v = best_t / 1e6
            else:
                raise ValueError(f"referee: unsupported {name}()")
            keep = name in ("last_over_time",)
            out.append((labels if keep else _drop_name(labels), v))
        return out


# --- helpers -----------------------------------------------------------------

_COMPARISONS = {"==", "!=", ">", "<", ">=", "<="}
_VALID_LABEL = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")


def _match(m, value: str) -> bool:
    if m.op == "=":
        return value == m.value
    if m.op == "!=":
        return value != m.value
    anchored = re.compile(f"^(?:{m.value})$")
    hit = anchored.match(value) is not None
    return hit if m.op == "=~" else not hit


def _point_at(samples, lo: int, t: int):
    """Latest sample with lo < ts <= t (binary search would be nicer;
    linear is fine at referee scale)."""
    best = None
    for st, sv in samples:
        if st > t:
            break
        if st > lo:
            best = (st, sv)
    return best


def _drop_name(labels: dict) -> dict:
    if "__name__" in labels:
        labels = {k: v for k, v in labels.items() if k != "__name__"}
    return labels


def _group_labels(labels: dict, grouping) -> dict:
    if grouping is None:
        return {}
    if grouping.without:
        drop = set(grouping.labels) | {"__name__"}
        return {k: v for k, v in labels.items() if k not in drop}
    keep = set(grouping.labels)
    return {k: v for k, v in labels.items() if k in keep}


def _signature_fn(node: BinOp):
    if node.on is not None:
        on = list(node.on)

        def sig(labels):
            return tuple((k, labels.get(k, "")) for k in on)

        return sig
    ignoring = set(node.ignoring or []) | {"__name__"}

    def sig(labels):
        return tuple(
            sorted((k, v) for k, v in labels.items() if k not in ignoring)
        )

    return sig


def _compare(op, l, r) -> bool:
    if op == "==":
        return l == r
    if op == "!=":
        return l != r
    if op == ">":
        return l > r
    if op == "<":
        return l < r
    if op == ">=":
        return l >= r
    return l <= r


def _arith(op, l, r) -> float:
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        if r == 0:
            if l == 0 or math.isnan(l):
                return NAN
            return INF if (l > 0) == (not math.copysign(1, r) < 0) else -INF
        return l / r
    if op == "%":
        if r == 0:
            return NAN
        try:
            return math.fmod(l, r)
        except ValueError:
            return NAN
    if op == "^":
        try:
            return math.pow(l, r)
        except OverflowError:
            return INF  # Go math.Pow overflow → +Inf
        except ValueError:
            return NAN  # e.g. negative base, fractional exponent
    if op == "atan2":
        return math.atan2(l, r)
    raise ValueError(f"referee: unsupported binop {op}")


def _agg_min(vals):
    out = vals[0]
    for v in vals[1:]:
        if math.isnan(out) or v < out:
            out = v
    return out


def _agg_max(vals):
    out = vals[0]
    for v in vals[1:]:
        if math.isnan(out) or v > out:
            out = v
    return out


def _quantile(q: float, vals) -> float:
    """promql/quantile.go quantile()."""
    if math.isnan(q):
        return NAN
    if q < 0:
        return -INF
    if q > 1:
        return INF
    s = sorted(vals)
    n = len(s)
    rank = q * (n - 1)
    lower = int(math.floor(rank))
    upper = int(math.ceil(rank))
    weight = rank - lower
    return s[lower] * (1 - weight) + s[upper] * weight


def _bucket_quantile(q: float, buckets) -> float | None:
    """promql/quantile.go bucketQuantile() over classic le-buckets."""
    if math.isnan(q):
        return NAN
    if q < 0:
        return -INF
    if q > 1:
        return INF
    bs = sorted(buckets)
    if len(bs) < 2 or not math.isinf(bs[-1][0]):
        return NAN
    # ensure monotonicity (float accumulation in rate() can wobble)
    fixed = []
    prev = -INF
    for le, c in bs:
        c = max(c, prev)
        fixed.append((le, c))
        prev = c
    total = fixed[-1][1]
    if total == 0:
        return NAN
    rank = q * total
    b = next(i for i, (_, c) in enumerate(fixed) if c >= rank)
    if b == len(fixed) - 1:
        return fixed[-2][0]
    if b == 0 and fixed[0][0] <= 0:
        return fixed[0][0]
    start, end = 0.0, fixed[b][0]
    count = fixed[b][1]
    if b > 0:
        start = fixed[b - 1][0]
        count -= fixed[b - 1][1]
        rank -= fixed[b - 1][1]
    return start + (end - start) * (rank / count)


def _extrapolated_rate(samples, window_start_us, window_end_us,
                       *, is_counter, is_rate):
    """promql/functions.go extrapolatedRate() — the canonical referee
    transcription (also exercised standalone by test_prom_referee)."""
    if len(samples) < 2:
        return None
    result = samples[-1][1] - samples[0][1]
    if is_counter:
        prev = samples[0][1]
        for _, v in samples[1:]:
            if v < prev:
                result += prev
            prev = v
    first_ts, last_ts = samples[0][0], samples[-1][0]
    duration_to_start = (first_ts - window_start_us) / 1e6
    duration_to_end = (window_end_us - last_ts) / 1e6
    sampled_interval = (last_ts - first_ts) / 1e6
    avg_between = sampled_interval / (len(samples) - 1)
    if is_counter and result > 0 and samples[0][1] >= 0:
        duration_to_zero = sampled_interval * (samples[0][1] / result)
        if duration_to_zero < duration_to_start:
            duration_to_start = duration_to_zero
    threshold = avg_between * 1.1
    extrapolate_to = sampled_interval
    extrapolate_to += (
        duration_to_start if duration_to_start < threshold else avg_between / 2
    )
    extrapolate_to += (
        duration_to_end if duration_to_end < threshold else avg_between / 2
    )
    factor = extrapolate_to / sampled_interval
    if is_rate:
        factor /= (window_end_us - window_start_us) / 1e6
    return result * factor


def _instant_value(samples, *, is_rate):
    """promql/functions.go instantValue() (irate/idelta)."""
    if len(samples) < 2:
        return None
    last_ts, last_v = samples[-1]
    prev_ts, prev_v = samples[-2]
    if last_ts == prev_ts:
        return None
    if is_rate and last_v < prev_v:
        value = last_v
    else:
        value = last_v - prev_v
    if is_rate:
        return value / ((last_ts - prev_ts) / 1e6)
    return value


def _linear_regression(samples, intercept_ts_us):
    """promql/functions.go linearRegression()."""
    n = 0.0
    sum_x = sum_y = sum_xy = sum_x2 = 0.0
    const_y = True
    for ts_us, v in samples:
        if const_y and v != samples[0][1]:
            const_y = False
        x = (ts_us - intercept_ts_us) / 1e6
        n += 1
        sum_x += x
        sum_y += v
        sum_xy += x * v
        sum_x2 += x * x
    if const_y:
        return 0.0, samples[0][1]
    cov = sum_xy - sum_x * sum_y / n
    var = sum_x2 - sum_x * sum_x / n
    slope = cov / var
    intercept = sum_y / n - slope * sum_x / n
    return slope, intercept


def _double_exp_smoothing(samples, sf, tf):
    """promql/functions.go funcDoubleExponentialSmoothing()."""
    if len(samples) < 2:
        return None
    s0 = samples[0][1]
    s1 = s0
    b = samples[1][1] - samples[0][1]
    for i in range(1, len(samples)):
        x = sf * samples[i][1]
        if i - 1 == 0:
            trend = b
        else:
            trend = tf * (s1 - s0) + (1 - tf) * b
        b = trend
        y = (1 - sf) * (s1 + b)
        s0, s1 = s1, x + y
    return s1


def _absent_labels(sel) -> dict:
    if not isinstance(sel, ast.VectorSelector):
        return {}
    return {
        m.name: m.value
        for m in sel.matchers
        if m.op == "=" and m.name != "__name__" and m.value != ""
    }


def _range_of(node) -> int:
    if isinstance(node, ast.VectorSelector):
        return node.range_us or 0
    return getattr(node, "range_us", 0)


def _offset_of(node) -> int:
    return getattr(node, "offset_us", 0)


def _go_template_to_py(repl: str) -> str:
    """Go regexp.Expand $1 / ${name} → Python \\g<...>."""
    out = re.sub(r"\$\{(\w+)\}", r"\\g<\1>", repl)
    out = re.sub(r"\$(\d+)", r"\\g<\1>", out)
    out = re.sub(r"\$(\w+)", r"\\g<\1>", out)
    return out.replace("$$", "$")


def _format_float(v: float) -> str:
    """strconv.FormatFloat(v, 'g', -1, 64) — Go shortest round-trip,
    which is what count_values uses for its label values."""
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if math.isnan(v):
        return "NaN"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _utc(v: float) -> datetime:
    return datetime.fromtimestamp(v, tz=timezone.utc)


_DATE_FUNCS = {
    "minute": lambda v: float(_utc(v).minute),
    "hour": lambda v: float(_utc(v).hour),
    "day_of_week": lambda v: float(_utc(v).isoweekday() % 7),
    "day_of_month": lambda v: float(_utc(v).day),
    "day_of_year": lambda v: float(_utc(v).timetuple().tm_yday),
    "days_in_month": lambda v: float(
        (
            _utc(v).replace(
                year=_utc(v).year + (_utc(v).month == 12),
                month=_utc(v).month % 12 + 1,
                day=1,
            )
            - _utc(v).replace(day=1)
        ).days
    ),
    "month": lambda v: float(_utc(v).month),
    "year": lambda v: float(_utc(v).year),
}


def _safe(fn):
    def wrapped(v):
        try:
            return fn(v)
        except OverflowError:
            # Go's libm saturates instead of raising: exp/sinh/cosh of
            # a huge argument return ±Inf (sign follows the function's
            # limit; every overflowing fn here diverges to +Inf for
            # v→+∞ and exp→0 / ±Inf for v→-∞, which math handles
            # before overflowing)
            return INF if v > 0 else -INF
        except ValueError:
            return NAN

    return wrapped


# --- corpus comparison helpers (shared by tools/referee_compare.py and
# tests/test_referee_corpus.py) -----------------------------------------------


def build_referee(
    spark, sf_dir: str, lookback_us: int, include_counter: bool = False
) -> "Referee":
    """Referee over the SAME points the Spark engine reads: the
    collected counter_points_frame, split per metric/value column."""
    from .signals import counter_points_frame

    rows = counter_points_frame(spark, sf_dir).collect()
    series: dict[tuple, dict[str, list]] = {}
    for r in rows:
        key = (r["mtype"], r["instance"])
        d = series.setdefault(
            key, {"gauge": [], "counter_mod": [], "counter": []}
        )
        d["gauge"].append((r["ts_us"], float(r["gauge"])))
        d["counter_mod"].append((r["ts_us"], float(r["counter_mod"])))
        d["counter"].append((r["ts_us"], float(r["counter"])))
    metrics: dict[str, list[RefSeries]] = {
        "events_gauge": [],
        "events_value_total": [],
    }
    if include_counter:
        # the parsed-gate sweep also exercises events_counter_total;
        # the compliance corpus tests keep the two-metric universe the
        # engine side registers
        metrics["events_counter_total"] = []
    for (mtype, instance), d in sorted(series.items()):
        labels = {"mtype": mtype, "instance": instance}
        metrics["events_gauge"].append(RefSeries(labels, sorted(d["gauge"])))
        metrics["events_value_total"].append(
            RefSeries(labels, sorted(d["counter_mod"]))
        )
        if include_counter:
            metrics["events_counter_total"].append(
                RefSeries(labels, sorted(d["counter"]))
            )
    return Referee(metrics, lookback_us)


def engine_to_points(resp) -> dict:
    """Engine wire matrix → {labels_sig: {ts_us: float}}."""
    out: dict[tuple, dict] = {}
    for s in resp["data"]["result"]:
        labels = {k: v for k, v in s["metric"].items() if v != ""}
        sig = tuple(sorted(labels.items()))
        pts = {
            int(round(float(t) * 1e6)): float(v)
            for t, v in s.get("values", [])
        }
        out.setdefault(sig, {}).update(pts)
    return out


def referee_to_points(series) -> dict:
    return {
        tuple(sorted(labels.items())): dict(pts) for labels, pts in series
    }


def values_equal(a: float, b: float,
                 rel_tol: float = 1e-9, abs_tol: float = 1e-9) -> bool:
    if math.isnan(a) and math.isnan(b):
        return True
    if math.isinf(a) or math.isinf(b):
        return a == b
    return math.isclose(a, b, rel_tol=rel_tol, abs_tol=abs_tol)


def diff_points(eng: dict, ref: dict) -> str | None:
    """First difference between two point maps, or None if equal."""
    if set(eng) != set(ref):
        extra = [dict(s) for s in set(eng) - set(ref)][:2]
        missing = [dict(s) for s in set(ref) - set(eng)][:2]
        return f"series sets differ: engine-only={extra} referee-only={missing}"
    for sig in eng:
        e, r = eng[sig], ref[sig]
        if set(e) != set(r):
            return (
                f"{dict(sig)}: step sets differ "
                f"engine-only={sorted(set(e) - set(r))[:3]} "
                f"referee-only={sorted(set(r) - set(e))[:3]}"
            )
        for t in e:
            if not values_equal(e[t], r[t]):
                return f"{dict(sig)} @{t}: engine={e[t]!r} referee={r[t]!r}"
    return None


def compare_corpus_entry(peng, referee, q: str,
                         start_us: int, end_us: int, step_us: int):
    """Run one corpus query through both implementations.

    Returns (classification, detail): match | mismatch | both_error |
    engine_only_error | referee_only_error.  Two errors count as
    agreement — both implementations refused the query (Prometheus
    errors on e.g. many-to-many vector matches and invalid
    label_replace arguments; the engine mirrors that)."""
    eng_err = ref_err = None
    eng = ref = None
    try:
        eng = engine_to_points(peng.query_range(q, start_us, end_us, step_us))
    except Exception as ex:  # noqa: BLE001 — classified, not hidden
        eng_err = f"{type(ex).__name__}: {ex}"[:200]
    try:
        ref = referee_to_points(
            referee.query_range(q, start_us, end_us, step_us, keep_name=True)
        )
        # the engine's wire output carries __name__ only for name-less
        # (multi-metric) selectors; strip the referee's when absent.
        # Two referee series may collapse to one engine series after
        # the strip (e.g. `selector or rate(...)` where the name is
        # kept on one side): merge them when their step sets are
        # disjoint — that IS the engine's representation — and only
        # flag a conflict when the same step carries different values
        if eng is not None and not any(
            "__name__" in dict(sig) for sig in eng
        ):
            stripped: dict = {}
            for sig, pts in ref.items():
                s2 = tuple((k, v) for k, v in sig if k != "__name__")
                if s2 in stripped:
                    for t, v in pts.items():
                        if t in stripped[s2] and not values_equal(
                            stripped[s2][t], v
                        ):
                            raise ValueError(
                                "conflicting values collide after "
                                "__name__ strip"
                            )
                    stripped[s2].update(pts)
                else:
                    stripped[s2] = dict(pts)
            ref = stripped
    except Exception as ex:  # noqa: BLE001
        ref_err = f"{type(ex).__name__}: {ex}"[:200]
    if eng_err and ref_err:
        return "both_error", f"eng={eng_err} ref={ref_err}"
    if eng_err:
        return "engine_only_error", eng_err
    if ref_err:
        return "referee_only_error", ref_err
    d = diff_points(eng, ref)
    return ("mismatch", d) if d else ("match", "")


_SIMPLE_FUNCS = {
    "abs": abs,
    "ceil": lambda v: float(math.ceil(v)) if math.isfinite(v) else v,
    "floor": lambda v: float(math.floor(v)) if math.isfinite(v) else v,
    "exp": _safe(math.exp),
    "ln": _safe(lambda v: math.log(v) if v > 0 else (-INF if v == 0 else NAN)),
    "log2": _safe(lambda v: math.log2(v) if v > 0 else (-INF if v == 0 else NAN)),
    "log10": _safe(lambda v: math.log10(v) if v > 0 else (-INF if v == 0 else NAN)),
    "sqrt": _safe(lambda v: math.sqrt(v) if v >= 0 else NAN),
    "sgn": lambda v: v if math.isnan(v) else float((v > 0) - (v < 0)),
    "sin": _safe(math.sin),
    "cos": _safe(math.cos),
    "tan": _safe(math.tan),
    "asin": _safe(lambda v: math.asin(v) if -1 <= v <= 1 else NAN),
    "acos": _safe(lambda v: math.acos(v) if -1 <= v <= 1 else NAN),
    "atan": _safe(math.atan),
    "sinh": _safe(math.sinh),
    # cosh is even: overflow saturates to +Inf for BOTH signs — abs
    # must be applied OUTSIDE _safe so its OverflowError handler sees
    # the non-negative argument (cosh(-1000) = +Inf, not -Inf)
    "cosh": (lambda f: lambda v: f(abs(v)))(_safe(math.cosh)),
    "tanh": _safe(math.tanh),
    "asinh": _safe(math.asinh),
    "acosh": _safe(lambda v: math.acosh(v) if v >= 1 else NAN),
    "atanh": _safe(lambda v: math.atanh(v) if -1 < v < 1 else NAN),
    "deg": math.degrees,
    "rad": math.radians,
}
