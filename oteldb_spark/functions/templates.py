"""Go-template subset for LogQL ``line_format`` / ``label_format``.

Reference: ``logqlengine/template.go:33-170`` registers sprig-style
functions (ToLower ToUpper Replace Trim* regexReplaceAll count
urlencode bytes duration unixEpoch align*).  This compiler handles the
template shapes that appear in LogQL pipelines — literal text,
``{{ .field }}`` references, and single-function pipelines
``{{ .field | ToUpper }}`` — as pure Column expressions.  Templates
beyond this subset would fall back to a Pandas UDF (not yet needed by
any compliance query we mirror).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .parsers import parse_bytes, parse_duration_seconds

_FUNCS = {
    "ToLower": F.lower,
    "ToUpper": F.upper,
    "TrimSpace": F.trim,
    "urlencode": F.url_encode,
    "urldecode": F.url_decode,
    "bytes": parse_bytes,
    "duration": parse_duration_seconds,
    "len": F.length,
}

_TOKEN = re.compile(r"\{\{\s*\.([A-Za-z_][A-Za-z0-9_]*)\s*(?:\|\s*(\w+)\s*)?\}\}")


def compile_template(template: str, fields: dict[str, Column]) -> Column:
    """Compile a template into one string Column.

    ``fields`` maps template field names to source Columns (labels /
    line).  Unknown field → empty string (Go template renders
    ``<no value>``; LogQL configures missingkey=zero).
    """
    parts: list[Column] = []
    pos = 0
    for m in _TOKEN.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        col = fields.get(m.group(1), F.lit(""))
        fn = m.group(2)
        if fn:
            if fn not in _FUNCS:
                raise ValueError(f"unsupported template function {fn!r}")
            col = _FUNCS[fn](col)
        parts.append(col.cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat_ws("", *parts)
