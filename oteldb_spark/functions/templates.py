"""Go-template subset for LogQL ``line_format`` / ``label_format``.

Reference: ``logqlengine/template.go:33-170`` registers the deprecated
Loki function set (ToLower/ToUpper/Trim*/regexReplaceAll/count/
urlencode/bytes/duration/unixEpoch*/align*) plus a sprig subset
(lower/upper/title/trunc/substr/add/.../date/default) and the
text/template builtins (printf/len).  This compiler translates the
template action language into pure Spark Column expressions — no
per-row Python anywhere:

* literal text between actions
* ``{{ .field }}`` references (missingkey=zero — absent fields render
  empty, matching Loki's missingkey=zero option, template.go:27)
* pipelines ``{{ .field | fn arg ... | fn ... }}`` where the piped
  value becomes the function's LAST argument (Go template semantics)
* direct calls ``{{ fn arg1 arg2 }}`` with string/number literals,
  field refs, and parenthesized sub-pipelines as arguments
* ``__line__`` / ``__timestamp__`` bound by the LogQL compiler

Functions that would need a row-wise dynamic value where a compile-time
literal is required (e.g. a computed regex) raise ValueError at compile
time rather than silently degrading to a Python UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .parsers import parse_bytes, parse_duration_seconds

_BIG = 2_147_483_647

Arg = "Column | int | float | str"


def _col(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def _lit_int(v, fn: str) -> int:
    if isinstance(v, bool) or not isinstance(v, int):
        raise ValueError(f"template {fn}: literal int argument required")
    return v


def _lit_str(v, fn: str) -> str:
    if not isinstance(v, str):
        raise ValueError(f"template {fn}: literal string argument required")
    return v


# ---------------------------------------------------------------- strings


def _title(s) -> Column:
    # strings.Title semantics: uppercase the first rune of each word,
    # leave the rest untouched (NOT initcap, which lowercases the rest)
    word = lambda w: F.concat(  # noqa: E731
        F.upper(F.substring(w, 1, 1)), F.substring(w, 2, _BIG)
    )
    return F.array_join(F.transform(F.split(_col(s), " "), word), " ")


def _trunc(n, s) -> Column:
    n = _lit_int(n, "trunc")
    c = _col(s)
    if n >= 0:
        return F.substring(c, 1, n)
    # negative count: keep the last |n| characters (sprig trunc)
    return F.when(F.length(c) <= -n, c).otherwise(
        F.substring(c, F.length(c) + n + 1, -n)
    )


def _substr(start, end, s) -> Column:
    start, end = _lit_int(start, "substr"), _lit_int(end, "substr")
    c = _col(s)
    if start < 0:
        return F.substring(c, 1, max(end, 0))
    if end < 0:
        return F.substring(c, start + 1, _BIG)
    return F.substring(c, start + 1, max(end - start, 0))


def _replace_sprig(old, new, s) -> Column:
    return F.replace(_col(s), _col(old), _col(new))


def _replace_go(s, old, new, n) -> Column:
    # strings.Replace(s, old, new, n); n < 0 → replace all
    n = _lit_int(n, "Replace")
    if n < 0:
        return F.replace(_col(s), _col(old), _col(new))
    raise ValueError("template Replace: only n=-1 (replace all) is supported")


def _char_class(chars: str) -> str:
    return "[" + re.escape(chars) + "]"


def _trim_all(chars, s) -> Column:
    return F.btrim(_col(s), _col(chars))


def _trim_left(s, chars) -> Column:
    pat = "^" + _char_class(_lit_str(chars, "TrimLeft")) + "+"
    return F.regexp_replace(_col(s), pat, "")


def _trim_right(s, chars) -> Column:
    pat = _char_class(_lit_str(chars, "TrimRight")) + "+$"
    return F.regexp_replace(_col(s), pat, "")


def _trim_prefix(prefix, s) -> Column:
    c, p = _col(s), _col(prefix)
    return F.when(
        c.startswith(p), F.substring(c, F.length(p) + 1, _BIG)
    ).otherwise(c)


def _trim_suffix(suffix, s) -> Column:
    c, p = _col(s), _col(suffix)
    return F.when(c.endswith(p), F.substring(c, 1, F.length(c) - F.length(p))).otherwise(
        c
    )


def _regex_replace_all(pat, s, repl) -> Column:
    # Go RE2 replacement syntax ${1} → Java $1 (Java reserves ${name}
    # for named groups only)
    repl = re.sub(r"\$\{(\d+)\}", r"$\1", _lit_str(repl, "regexReplaceAll"))
    return F.regexp_replace(_col(s), _lit_str(pat, "regexReplaceAll"), repl)


def _regex_replace_literal(pat, s, repl) -> Column:
    # replacement is literal: escape backslashes and group refs
    lit = _lit_str(repl, "regexReplaceAllLiteral")
    lit = lit.replace("\\", "\\\\").replace("$", "\\$")
    return F.regexp_replace(_col(s), _lit_str(pat, "regexReplaceAllLiteral"), lit)


def _count(pat, s) -> Column:
    return F.regexp_count(_col(s), F.lit(_lit_str(pat, "count")))


def _indent(n, s) -> Column:
    pad = " " * _lit_int(n, "indent")
    return F.regexp_replace(_col(s), "(?m)^", pad)


def _nindent(n, s) -> Column:
    return F.concat(F.lit("\n"), _indent(n, s))


def _default(dflt, s) -> Column:
    c = _col(s)
    return F.when(c.isNull() | (c.cast("string") == ""), _col(dflt)).otherwise(c)


def _printf(fmt, *args) -> Column:
    # Go fmt verbs → java.lang.String.format: %v renders like %s here
    jfmt = re.sub(r"%([-+ 0#]*\d*(?:\.\d+)?)v", r"%\1s", _lit_str(fmt, "printf"))
    cast: list[Column] = []
    for verb, arg in zip(re.findall(r"%[-+ 0#]*\d*(?:\.\d+)?([a-zA-Z])", jfmt), args):
        c = _col(arg)
        if verb in "dxXob":
            c = c.cast("long")
        elif verb in "feEgG":
            c = c.cast("double")
        elif verb == "s":
            c = c.cast("string")
        cast.append(c)
    cast.extend(_col(a) for a in args[len(cast) :])
    return F.format_string(jfmt, *cast)


def _align_left(n, s) -> Column:
    # truncate to n, else right-pad with spaces (template.go alignLeft)
    return F.rpad(_col(s), _lit_int(n, "alignLeft"), " ")


def _align_right(n, s) -> Column:
    # keep the LAST n chars when longer, else left-pad (alignRight)
    n = _lit_int(n, "alignRight")
    c = _col(s)
    return F.when(F.length(c) > n, F.substring(c, F.length(c) - n + 1, n)).otherwise(
        F.lpad(c, n, " ")
    )


# ---------------------------------------------------------------- numbers


def _variadic(op, cast_t: str):
    def fn(*args):
        cols = [_col(a).cast(cast_t) for a in args]
        out = cols[0]
        for c in cols[1:]:
            out = op(out, c)
        return out

    return fn


def _round(v, places=0) -> Column:
    return F.round(_col(v).cast("double"), _lit_int(places, "round"))


# ------------------------------------------------------------------- time

# Go reference-layout fragments → JVM DateTimeFormatter pattern
_GO_LAYOUT = [
    ("2006", "yyyy"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("Jan", "MMM"),
    ("Mon", "EEE"),
    ("PM", "a"),
    (".000", ".SSS"),
    ("-0700", "Z"),
    ("Z07:00", "XXX"),
    ("MST", "zz"),
]


def _go_layout_to_jvm(layout: str) -> str:
    out = layout
    for go, jvm in _GO_LAYOUT:
        out = out.replace(go, jvm)
    return out


def _date(fmt, t) -> Column:
    return F.date_format(_col(t), _go_layout_to_jvm(_lit_str(fmt, "date")))


def _to_date(fmt, s) -> Column:
    return F.to_timestamp(_col(s), _go_layout_to_jvm(_lit_str(fmt, "toDate")))


def _to_date_in_zone(fmt, zone, s) -> Column:
    pat = _go_layout_to_jvm(_lit_str(fmt, "toDateInZone"))
    return F.to_utc_timestamp(F.to_timestamp(_col(s), pat), _lit_str(zone, "zone"))


def _unix_to_time(epoch) -> Column:
    # dispatch on digit count like template.go unixToTime: 5=days,
    # 10=sec, 13=ms, 16=us, 19=ns
    e = _col(epoch).cast("string")
    n = e.cast("long")
    return (
        F.when(F.length(e) == 5, F.timestamp_seconds(n * 86400))
        .when(F.length(e) == 10, F.timestamp_seconds(n))
        .when(F.length(e) == 13, F.timestamp_millis(n))
        .when(F.length(e) == 16, F.timestamp_micros(n))
        .when(
            # ns epochs exceed 2^53, so float division drops microseconds;
            # divide as decimal (exact) before the long cast
            F.length(e) == 19,
            F.timestamp_micros((n.cast("decimal(20,0)") / 1000).cast("long")),
        )
    )


_FUNCS: dict = {
    # deprecated Loki names (template.go:40-117)
    "ToLower": lambda s: F.lower(_col(s)),
    "ToUpper": lambda s: F.upper(_col(s)),
    "Replace": _replace_go,
    "Trim": lambda s, chars: F.btrim(_col(s), _col(chars)),
    "TrimLeft": _trim_left,
    "TrimRight": _trim_right,
    # Go stdlib argument order: TrimPrefix(s, prefix) — sprig's
    # trimPrefix below takes (prefix, s)
    "TrimPrefix": lambda s, p: _trim_prefix(p, s),
    "TrimSuffix": lambda s, suf: _trim_suffix(suf, s),
    "TrimSpace": lambda s: F.trim(_col(s)),
    "regexReplaceAll": _regex_replace_all,
    "regexReplaceAllLiteral": _regex_replace_literal,
    "count": _count,
    "urldecode": lambda s: F.url_decode(_col(s)),
    "urlencode": lambda s: F.url_encode(_col(s)),
    "bytes": lambda s: parse_bytes(_col(s)),
    "duration": lambda s: parse_duration_seconds(_col(s)),
    "duration_seconds": lambda s: parse_duration_seconds(_col(s)),
    "unixEpochMillis": lambda t: (F.unix_micros(_col(t)) / 1000).cast("long"),
    "unixEpochNanos": lambda t: F.unix_micros(_col(t)) * 1000,
    "toDateInZone": _to_date_in_zone,
    "unixToTime": _unix_to_time,
    "alignLeft": _align_left,
    "alignRight": _align_right,
    # sprig subset (template.go:119-166)
    "b64enc": lambda s: F.base64(_col(s).cast("binary")),
    "b64dec": lambda s: F.unbase64(_col(s)).cast("string"),
    "lower": lambda s: F.lower(_col(s)),
    "upper": lambda s: F.upper(_col(s)),
    "title": _title,
    "trunc": _trunc,
    "substr": _substr,
    "contains": lambda sub, s: _col(s).contains(_col(sub)),
    "hasPrefix": lambda p, s: _col(s).startswith(_col(p)),
    "hasSuffix": lambda suf, s: _col(s).endswith(_col(suf)),
    "indent": _indent,
    "nindent": _nindent,
    "replace": _replace_sprig,
    "repeat": lambda n, s: F.repeat(_col(s), _lit_int(n, "repeat")),
    "trim": lambda s: F.trim(_col(s)),
    "trimAll": _trim_all,
    "trimSuffix": _trim_suffix,
    "trimPrefix": _trim_prefix,
    "int": lambda v: _col(v).cast("long"),
    "float64": lambda v: _col(v).cast("double"),
    "add": _variadic(lambda a, b: a + b, "long"),
    "sub": _variadic(lambda a, b: a - b, "long"),
    "mul": _variadic(lambda a, b: a * b, "long"),
    "div": _variadic(lambda a, b: (a / b).cast("long"), "long"),
    "mod": lambda a, b: _col(a).cast("long") % _col(b).cast("long"),
    "addf": _variadic(lambda a, b: a + b, "double"),
    "subf": _variadic(lambda a, b: a - b, "double"),
    "mulf": _variadic(lambda a, b: a * b, "double"),
    "divf": _variadic(lambda a, b: a / b, "double"),
    "max": lambda *a: F.greatest(*[_col(x).cast("long") for x in a]),
    "min": lambda *a: F.least(*[_col(x).cast("long") for x in a]),
    "maxf": lambda *a: F.greatest(*[_col(x).cast("double") for x in a]),
    "minf": lambda *a: F.least(*[_col(x).cast("double") for x in a]),
    "ceil": lambda v: F.ceil(_col(v).cast("double")).cast("double"),
    "floor": lambda v: F.floor(_col(v).cast("double")).cast("double"),
    "round": _round,
    "date": _date,
    "toDate": _to_date,
    "now": lambda: F.current_timestamp(),
    "unixEpoch": lambda t: F.unix_seconds(_col(t)),
    "default": _default,
    # text/template builtins
    "printf": _printf,
    "len": lambda s: F.length(_col(s)),
}


# ------------------------------------------------------------- the parser

_TOK = re.compile(
    r"""\s*(?:
      (?P<pipe>\|)
    | (?P<lpar>\()
    | (?P<rpar>\))
    | (?P<field>\.[A-Za-z_][A-Za-z0-9_]*)
    | (?P<str>"(?:[^"\\]|\\.)*"|`[^`]*`)
    | (?P<num>-?\d+(?:\.\d+)?)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_TOKEN = re.compile(r"\{\{(.*?)\}\}", re.DOTALL)

_DOTTED_FIELD = re.compile(r"\.([A-Za-z_]\w*)")


def iter_actions(template: str):
    """Yield ``(start, end, body)`` for each ``{{ ... }}`` action,
    skipping ``}`` characters inside double-quoted (with backslash
    escapes) and backtick string literals — ``{{ printf "}}" }}``
    is ONE action with body ``printf "}}" ``."""
    pos = 0
    n = len(template)
    while True:
        start = template.find("{{", pos)
        if start < 0:
            return
        i = start + 2
        while i < n:
            c = template[i]
            if c == '"':
                i += 1
                while i < n and template[i] != '"':
                    i += 2 if template[i] == "\\" else 1
                i += 1
            elif c == "`":
                end_q = template.find("`", i + 1)
                i = n if end_q < 0 else end_q + 1
            elif c == "}" and template.startswith("}}", i):
                yield start, i + 2, template[start + 2 : i]
                pos = i + 2
                break
            else:
                i += 1
        else:
            return


def template_fields(template: str) -> set[str]:
    """Every ``.field`` name referenced anywhere in any action of the
    template — all dotted identifiers per action, not just the first
    (``{{ printf "%s-%s" .a .b }}`` yields ``{'a', 'b'}``)."""
    out: set[str] = set()
    for _, _, body in iter_actions(template):
        out.update(_DOTTED_FIELD.findall(body))
    return out


def _tokenize(src: str):
    pos, out = 0, []
    while pos < len(src):
        m = _TOK.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(f"template: cannot parse {src[pos:]!r}")
            break
        out.append((m.lastgroup, m.group(m.lastgroup)))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens, fields):
        self.toks = tokens
        self.i = 0
        self.fields = fields

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def pipeline(self):
        val = self.command(first=True)
        while self.peek()[0] == "pipe":
            self.next()
            val = self.command(first=False, piped=val)
        return val

    def command(self, first: bool, piped=None):
        kind, text = self.peek()
        if kind == "ident" and text in _FUNCS:
            self.next()
            args = []
            while self.peek()[0] in ("field", "str", "num", "lpar", "ident"):
                k, t = self.peek()
                if k == "ident" and t not in _FUNCS and t not in self.fields:
                    break
                if k == "ident" and t in _FUNCS:
                    # zero-arg function used as an argument (e.g. now)
                    self.next()
                    args.append(_FUNCS[t]())
                    continue
                args.append(self.primary())
            if piped is not None:
                args.append(piped)
            try:
                return _FUNCS[text](*args)
            except TypeError as e:
                raise ValueError(f"template {text}: bad arguments ({e})") from e
        if piped is not None:
            raise ValueError(f"template: {text!r} is not a function")
        return self.primary()

    def primary(self):
        kind, text = self.next()
        if kind == "field":
            return self.fields.get(text[1:], F.lit(""))
        if kind == "str":
            body = text[1:-1]
            if text[0] == '"':
                body = (
                    body.replace(r"\\", "\\")
                    .replace(r"\"", '"')
                    .replace(r"\n", "\n")
                    .replace(r"\t", "\t")
                )
            return body
        if kind == "num":
            return float(text) if "." in text else int(text)
        if kind == "lpar":
            val = self.pipeline()
            if self.next()[0] != "rpar":
                raise ValueError("template: unbalanced parenthesis")
            return val
        if kind == "ident":
            if text in self.fields:  # __line__ / __timestamp__ bindings
                return self.fields[text]
            if text in _FUNCS:
                return _FUNCS[text]()
            raise ValueError(f"template: unknown identifier {text!r}")
        raise ValueError(f"template: unexpected token {text!r}")


def compile_action(src: str, fields: dict[str, Column]) -> Column:
    """Compile one ``{{ ... }}`` action body into a Column."""
    p = _Parser(_tokenize(src), fields)
    out = p.pipeline()
    if p.peek()[0] is not None:
        raise ValueError(f"template: trailing tokens in {src!r}")
    return _col(out)


def compile_template(template: str, fields: dict[str, Column]) -> Column:
    """Compile a template into one string Column.

    ``fields`` maps template field names to source Columns (labels,
    ``__line__``, ``__timestamp__``).  Unknown field → empty string
    (Loki configures missingkey=zero).
    """
    parts: list[Column] = []
    pos = 0
    for start, end, body in iter_actions(template):
        if start > pos:
            parts.append(F.lit(template[pos:start]))
        parts.append(compile_action(body, fields).cast("string"))
        pos = end
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat_ws("", *parts)
