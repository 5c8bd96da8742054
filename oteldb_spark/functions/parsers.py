"""Scalar parsing/conversion functions used by LogQL pipeline stages.

All are pure Column expressions (JVM-side, codegen'd) — no UDFs.
Reference semantics:

* logfmt          — ``logqlengine/logfmt.go`` (key=val pairs)
* pattern parser  — ``logqlpattern/`` (``<field>`` captures, ``<_>``
  wildcards) — compiled to a regex with named-ish groups
* duration/bytes  — ``logqlengine/comparator.go`` label coercion:
  Go ``time.ParseDuration`` units (ns us µs ms s m h) and humanized
  bytes (b kb mb gb tb + KiB variants)
* ip matching     — ``logqlengine/ip_matcher.go``: literal, range,
  CIDR over IPv4
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import Column
from pyspark.sql import functions as F


# one valid logfmt token: key=value where the value is either a quoted
# string (backslash escapes) or a bare run; mirrors go-logfmt's scanner
# (ref logqlengine/logfmt.go:66 uses github.com/go-logfmt/logfmt)
_LOGFMT_TOKEN = r'([^\s="]+)=("(?:[^"\\]|\\.)*"|[^\s"]*)'
# an unterminated quoted value — the case go-logfmt's decoder reports as
# an error (ref logqlengine/logfmt.go:58-60 → set.SetError)
_LOGFMT_BAD = r'(?:^|\s)[^\s="]*="(?:[^"\\]|\\.)*$'


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE and pass it to ``fn`` as a bound lambda
    variable (single-element transform + element_at).

    Why: Catalyst inlines a Column expression at every MENTION, and a
    higher-order-function lambda re-evaluates every CAPTURED outer
    expression per array element — an expensive input (a parsed map, a
    regexp extraction) mentioned 5× inside an expression tree is built
    5× per row.  Binding turns those mentions into lambda-variable
    field accesses.  Null-transparent: a null input becomes [null] and
    ``fn`` sees null, same as direct evaluation."""
    return F.element_at(F.transform(F.array(col), fn), 1)


_BARRIER_SEQ = itertools.count()


def barrier_cols(df, cols: "dict[str, Column]"):
    """Materialize expensive expressions ONCE per row as real columns.

    ``_bind`` dedups mentions INSIDE one expression tree; this is the
    PLAN-level sibling: a one-element explode (Spark's expression
    barrier) evaluates the struct a single time per row, and every
    downstream operator references plain attributes.  Two problems it
    kills at once: (1) a filter and a projection both mentioning the
    expression evaluate it twice; (2) predicate pushdown happily drags
    the full expression below a repartition into a one-file scan
    stage, single-threading the whole parse (a filter cannot be pushed
    through a Generate).  Names in ``cols`` must not collide with
    existing columns."""
    name = f"__barrier_{next(_BARRIER_SEQ)}"
    st = F.struct(*[c.alias(k) for k, c in cols.items()])
    out = df.select("*", F.explode(F.array(st)).alias(name))
    return out.select(
        "*", *[F.col(f"{name}.{k}").alias(k) for k in cols]
    ).drop(name)


def logfmt_map(body: Column | str) -> Column:
    """Parse a logfmt line (``k=v`` space-separated) into a
    map<string,string>.  Quoted values (``k="a b"``) are unquoted and
    backslash-unescaped (``\\"`` → ``"``); duplicate keys keep the last
    occurrence, matching go-logfmt map-fill order
    (ref logqlengine/logfmt.go:86-100).  All JVM-side, no UDFs."""
    b = F.col(body) if isinstance(body, str) else body
    keys = F.regexp_extract_all(b, F.lit(_LOGFMT_TOKEN), F.lit(1))
    raw = F.regexp_extract_all(b, F.lit(_LOGFMT_TOKEN), F.lit(2))
    vals = F.transform(
        raw,
        lambda v: F.when(
            v.startswith('"'),
            F.regexp_replace(
                F.substring(v, F.lit(2), F.length(v) - F.lit(2)),
                r"\\(.)",
                "$1",
            ),
        ).otherwise(v),
    )
    # Last-win dedup WITHOUT per-token map allocation: keep only each
    # key's LAST occurrence (0-based index i == T − 1-based position of
    # the key in the REVERSED key array), then build the map once.  The
    # earlier map_concat/map_filter fold allocated ~2 maps per token
    # per row.  CRITICAL shape detail: everything runs inside _bind
    # scopes so keys/vals and the derived reverse/size are LAMBDA
    # VARIABLES — a Spark HOF re-evaluates any CAPTURED outer
    # expression per element, so a naive `rev = F.reverse(keys)`
    # captured in the filter lambda re-runs the regexp per token per
    # row (measured 3× slower than the fold it replaced; bound, this
    # is ~10% faster than the fold and allocation-free).  No duplicate
    # keys survive the filter, so map_from_entries is safe under the
    # default EXCEPTION dedup policy (the driver runs a plain session,
    # so no conf to lean on).
    def with_rev(s):
        return F.struct(
            s["ks"].alias("ks"),
            s["vs"].alias("vs"),
            F.reverse(s["ks"]).alias("rk"),
            F.size(s["ks"]).alias("n"),
        )

    def build(s):
        return F.map_from_entries(
            F.transform(
                F.filter(
                    F.arrays_zip(s["ks"].alias("k"), s["vs"].alias("v")),
                    lambda e, i: i == s["n"] - F.array_position(s["rk"], e["k"]),
                ),
                lambda e: F.struct(e["k"], e["v"]),
            )
        )

    return _bind(
        F.struct(keys.alias("ks"), vals.alias("vs")),
        lambda s: _bind(with_rev(s), build),
    )


def logfmt_error(body: Column | str) -> Column:
    """True when go-logfmt's decoder would report a parse error for the
    line (unterminated quoted value).  The reference then surfaces
    ``__error__="logfmt parsing error"`` and extracts no labels
    (ref logqlengine/logfmt.go:51-61: parsed map is discarded on error)."""
    b = F.col(body) if isinstance(body, str) else body
    return b.rlike(_LOGFMT_BAD)


def pattern_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile a LogQL pattern expression (``<field>`` captures,
    ``<_>`` anonymous wildcards) to an anchored regex + capture names.

    Mirrors logqlpattern parsing: literals are matched verbatim,
    captures are non-greedy ``(.*?)`` except a trailing capture which
    is greedy.
    """
    names: list[str] = []
    out: list[str] = ["^"]
    pos = 0
    tokens = list(re.finditer(r"<([A-Za-z_][A-Za-z0-9_]*|_)>", pattern))
    for i, m in enumerate(tokens):
        out.append(re.escape(pattern[pos : m.start()]))
        last = i == len(tokens) - 1 and m.end() == len(pattern)
        group = "(.*)" if last else "(.*?)"
        if m.group(1) == "_":
            group = ".*" if last else ".*?"
        else:
            names.append(m.group(1))
        out.append(group)
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    out.append("$")
    return "".join(out), names


def pattern_extract(body: Column | str, pattern: str) -> dict[str, Column]:
    """Apply a LogQL pattern, returning {field: Column}."""
    rx, names = pattern_to_regex(pattern)
    col = F.col(body) if isinstance(body, str) else body
    res = {}
    gi = 0
    # regexp_extract group indexes count only capturing groups
    for name in names:
        gi += 1
        res[name] = F.regexp_extract(col, rx, gi)
    return res


# Go time.ParseDuration units → seconds multiplier.  Longest units
# first so the regex prefers 'ms' over 'm'.
_DURATION_UNITS = [
    ("ns", 1e-9),
    ("us", 1e-6),
    ("µs", 1e-6),
    ("ms", 1e-3),
    ("s", 1.0),
    ("m", 60.0),
    ("h", 3600.0),
]


def _duration_component_seconds(x: Column) -> Column:
    # num/unit are _bind-scoped: the unit when-chain mentions each ~7×,
    # which would otherwise inline both regexps per mention
    def chain(s):
        expr = F.lit(None).cast("double")
        for u, mult in _DURATION_UNITS:
            expr = F.when(s["unit"] == u, s["num"] * F.lit(mult)).otherwise(
                expr
            )
        return expr

    return _bind(
        F.struct(
            F.regexp_extract(x, r"^([0-9]*\.?[0-9]+)", 1)
            .cast("double")
            .alias("num"),
            F.regexp_extract(x, r"([a-zµ]+)$", 1).alias("unit"),
        ),
        chain,
    )


def parse_duration_seconds(col: Column | str) -> Column:
    """Go ``time.ParseDuration`` → seconds (double): compound
    components like '1h2m3.5s' sum; optional leading '-'; a string
    that is not entirely duration components → null."""
    c = F.col(col) if isinstance(col, str) else col

    # _bind twice: the input (often a parsed-map extraction) is
    # mentioned 3× and the component array 3× — unbound, each mention
    # inlines the full upstream expression
    def compute(s):
        comps = F.regexp_extract_all(
            s, F.lit(r"([0-9]*\.?[0-9]+(?:ns|us|µs|ms|s|m|h))"), 1
        )
        body = F.regexp_replace(s, r"^[+-]", "")
        sign = F.when(s.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))

        def finish(t):
            total = F.aggregate(
                t["comps"],
                F.lit(0.0),
                lambda acc, x: acc + _duration_component_seconds(x),
            )
            return F.when(
                (F.size(t["comps"]) > 0)
                & (F.array_join(t["comps"], "") == t["body"]),
                t["sign"] * total,
            )

        return _bind(
            F.struct(
                comps.alias("comps"), body.alias("body"), sign.alias("sign")
            ),
            finish,
        )

    return _bind(c, compute)


_BYTES_UNITS = [
    ("b", 1.0),
    ("kb", 1e3),
    ("mb", 1e6),
    ("gb", 1e9),
    ("tb", 1e12),
    ("kib", 1024.0),
    ("mib", 1024.0**2),
    ("gib", 1024.0**3),
    ("tib", 1024.0**4),
]


def parse_bytes(col: Column | str) -> Column:
    """'1.5KB' → 1500.0 bytes (case-insensitive units, go-humanize).
    num/unit are _bind-scoped — the unit when-chain mentions each ~9×,
    and the input is often a parsed-map extraction."""
    c = F.col(col) if isinstance(col, str) else col

    def chain(s):
        num, unit = s["num"], s["unit"]
        expr = F.lit(None).cast("double")
        for u, mult in _BYTES_UNITS:
            expr = F.when(unit == u, num * F.lit(mult)).otherwise(expr)
        return expr

    return _bind(
        F.struct(
            F.regexp_extract(c, r"^([0-9]*\.?[0-9]+)", 1)
            .cast("double")
            .alias("num"),
            F.lower(F.regexp_extract(c, r"([A-Za-z]+)$", 1)).alias("unit"),
        ),
        chain,
    )


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad IPv4 string → uint32 as long (null if malformed).

    The input is _bind-scoped: it is often an expensive extraction (a
    parsed-map lookup), and the split/size/element_at tree would
    otherwise inline it 5×."""
    c = F.col(col) if isinstance(col, str) else col

    def convert(s):
        parts = F.split(s, r"\.")
        valid = F.size(parts) == 4
        total = F.lit(0).cast("long")
        for i in range(4):
            total = total * 256 + F.element_at(parts, i + 1).cast("long")
        return F.when(valid, total)

    return _bind(c, convert)


def ip_in_cidr(col: Column | str, cidr: str) -> Column:
    """LogQL ``ip("10.0.0.0/16")`` membership test as a Column."""
    base, _, bits = cidr.partition("/")
    bits = int(bits) if bits else 32
    base_parts = [int(x) for x in base.split(".")]
    base_long = (
        ((base_parts[0] * 256 + base_parts[1]) * 256 + base_parts[2]) * 256
        + base_parts[3]
    )
    mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
    return _bind(
        ipv4_to_long(col),
        lambda ip: ip.isNotNull()
        & (ip.bitwiseAND(F.lit(mask)) == F.lit(base_long & mask)),
    )


def ip_in_range(col: Column | str, lo: str, hi: str) -> Column:
    """LogQL ``ip("10.0.0.1-10.0.0.99")`` range test."""

    def s2l(s: str) -> int:
        p = [int(x) for x in s.split(".")]
        return ((p[0] * 256 + p[1]) * 256 + p[2]) * 256 + p[3]

    ip = ipv4_to_long(col)
    return ip.isNotNull() & ip.between(s2l(lo), s2l(hi))


def ip_pattern_pred(col: Column | str, pattern: str) -> Column:
    """One ip("...") pattern against an IP-string column: exact
    address, CIDR, or lo-hi range (logql/logqlengine ip matcher)."""
    if "-" in pattern:
        lo, _, hi = pattern.partition("-")
        return ip_in_range(col, lo.strip(), hi.strip())
    if "/" in pattern:
        return ip_in_cidr(col, pattern)
    return ip_in_range(col, pattern, pattern)


def ip_line_match(body: Column | str, patterns: list[str]) -> Column:
    """LogQL ``|= ip("...")`` line filter: true when ANY IPv4 token in
    the line matches ANY pattern.  Extraction + membership stay in
    whole-stage codegen (regexp_extract_all + exists)."""
    b = F.col(body) if isinstance(body, str) else body
    ips = F.regexp_extract_all(b, F.lit(r"((?:\d{1,3}\.){3}\d{1,3})"), 1)
    pred = None
    for p in patterns:
        cur = F.exists(ips, lambda x: ip_pattern_pred(x, p))
        pred = cur if pred is None else (pred | cur)
    return pred if pred is not None else F.lit(False)


ANSI_RE = r"\x1b\[[0-9;]*m"


def decolorize(col: Column | str) -> Column:
    """Strip ANSI color codes (decolorize.go)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ANSI_RE, "")
