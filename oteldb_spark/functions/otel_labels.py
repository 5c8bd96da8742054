"""OTel attribute-key ↔ Prometheus label-name translation surface.

The reference sanitizes dotted OTel attribute keys into Prometheus-safe
label names at ingest (``otelstorage/attrs.go:11-41`` ``KeyToLabel``:
``http.method`` → ``http_method``, leading digit → ``_`` prefix, every
non ``[A-Za-z0-9_]`` rune → one ``_``), persists a name↔key reverse
lookup table per signal (``chstorage/columns_logs.go:304-371``), and at
PromQL query time additionally understands the ``U__``-prefixed hex
escaping emitted by OTel-Prometheus translators
(``chstorage/querier_metrics.go:145-163`` ``DecodeUnicodeLabel``:
``U__k8s_2e_node_2e_name`` → ``k8s.node.name``).

Spark-first shape: query label names are compile-time literals, so
resolution against KNOWN columns is pure Python (zero runtime cost);
only the attrs-*map* fallback needs a Column expression, and that one
is a per-row ``map_keys`` filter — JVM-side, codegen'd, no shuffle and
no persisted lookup table required.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "key_to_label",
    "decode_unicode_label",
    "resolve_label_name",
    "map_attr_lookup",
]


def key_to_label(key: str) -> str:
    """``http.method`` → ``http_method``; ``0count`` → ``_0count``.

    Mirrors ``otelstorage.KeyToLabel``: a leading digit gets a ``_``
    prefix, then every code point outside ``[A-Za-z0-9_]`` becomes one
    ``_`` (per rune, so a multi-byte rune collapses to a single ``_``).
    """
    if not key:
        return key
    out = []
    if key[0].isdigit():
        out.append("_")
    for ch in key:
        out.append(ch if ("a" <= ch <= "z" or "A" <= ch <= "Z" or "0" <= ch <= "9" or ch == "_") else "_")
    return "".join(out)


def decode_unicode_label(name: str) -> str:
    """``U__k8s_2e_node_2e_name`` → ``k8s.node.name``.

    Mirrors ``chstorage.DecodeUnicodeLabel``: only acts on a ``U__``
    prefix; inside, any ``_XX_`` run with XX two hex digits decodes to
    that byte; everything else passes through.  A non-``U__`` name is
    returned unchanged.
    """
    if not name.startswith("U__"):
        return name
    s = name[3:]
    out = bytearray()
    i = 0
    while i < len(s):
        if s[i] == "_" and i + 3 < len(s) and s[i + 3] == "_":
            hx = s[i + 1 : i + 3]
            # reject int()'s underscore-separator leniency: XX must be
            # two hex digits exactly, like Go's ParseUint(hx, 16, 8)
            if all(c in "0123456789abcdefABCDEF" for c in hx):
                # Go WriteByte's raw byte — UTF-8 sequences may be
                # assembled across consecutive escapes
                out.append(int(hx, 16))
                i += 4
                continue
        out.extend(s[i].encode("utf-8"))
        i += 1
    return out.decode("utf-8", errors="surrogateescape")


def resolve_label_name(name: str, candidates) -> str | None:
    """Map a queried label name to the stored key it addresses.

    Resolution order (first hit wins), matching the reference's
    query-time behavior:

    1. exact key (``http.method`` queried as-is);
    2. ``U__`` hex decode (``U__k8s_2e_node_2e_name`` → the stored
       ``k8s.node.name`` column);
    3. the all-dots inverse (``http_method`` → a stored
       ``http.method``) — the canonical OTel spelling, and the same
       precedence :func:`map_attr_lookup`'s fast path gives it so the
       compile-time and runtime resolvers agree on exotic corpora
       holding e.g. both ``a-b`` and ``a.b``;
    4. reverse sanitization: the first (sorted) stored key whose
       ``key_to_label`` form equals the queried name — a Grafana
       dashboard emitting ``http_method`` finds the ``http.method``
       attr.

    Returns ``None`` when nothing matches (caller falls back to the
    absent-label-is-empty-string convention).
    """
    cands = list(candidates)
    if name in cands:
        return name
    decoded = decode_unicode_label(name)
    if decoded != name:
        if decoded in cands:
            return decoded
        # the store may itself hold the sanitized spelling (PromQL
        # surfaces dotted attrs under sanitized label names)
        slab = key_to_label(decoded)
        if slab in cands:
            return slab
    if "_" in name:
        dotted = name.replace("_", ".")
        if dotted in cands:
            return dotted
    for key in sorted(cands):
        if key != name and key_to_label(key) == name:
            return key
    return None


def _label_sanitize_col(key: Column) -> Column:
    """Column form of :func:`key_to_label` (Java regex works on code
    points, so each multi-byte rune collapses to one ``_`` exactly like
    the Go per-rune loop)."""
    sanitized = F.regexp_replace(key, "[^A-Za-z0-9_]", "_")
    return F.when(
        key.rlike("^[0-9]"), F.concat(F.lit("_"), sanitized)
    ).otherwise(sanitized)


def map_attr_lookup(map_col: Column, name: str) -> Column:
    """Sanitization-aware attrs-map lookup.

    ``coalesce(map[name], map[U__-decoded name], value of the first
    sorted map key whose sanitized form == name)`` — all per-row
    ``map_keys`` expressions inside codegen; no shuffle, no driver
    round-trip, no persisted reverse table (the reference needs its
    ReplacingMergeTree name↔key table only because ClickHouse cannot
    cheaply scan map keys per matcher; Spark can).
    """
    exact = map_col.getItem(name)
    branches = [exact]
    decoded = decode_unicode_label(name)
    if decoded != name:
        branches.append(map_col.getItem(decoded))
    if "_" in name:
        # fast path for the overwhelmingly common inverse: every `_`
        # was a `.` (http_method → http.method) — two O(1) lookups
        # instead of the per-row key scan; coalesce short-circuits so
        # the scan below only runs when this misses.  The all-dots
        # key also deliberately takes precedence over other
        # reverse-sanitized candidates (it is the canonical OTel
        # spelling; `.` additionally sorts before every other
        # sanitized-to-`_` character except none, so the winner
        # matches the sorted-first scan in all but exotic corpora).
        branches.append(map_col.getItem(name.replace("_", ".")))
    # general reverse-sanitized scan: smallest matching key wins
    matching = F.array_sort(
        F.filter(
            F.map_keys(map_col),
            lambda k: (_label_sanitize_col(k) == F.lit(name)) & (k != F.lit(name)),
        )
    )
    branches.append(
        F.when(F.size(matching) > 0, map_col.getItem(F.element_at(matching, 1)))
    )
    return F.coalesce(*branches)
