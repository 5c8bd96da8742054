"""ProfileQL render formats: flamebearer JSON, pprof, standalone HTML.

The reference renders a merged flamegraph tree three ways
(``profileqlengine/flamebearer.go``, ``pprof.go``, ``html.go``); here
the engine's merge result is a DataFrame of collapsed rows
``(stack 'a>b>c', value)`` and these helpers rebuild the tree
driver-side (merge output is small — one row per distinct stack) and
serialize the same shapes.  The pprof writer emits the public
``profile.proto`` wire format by hand (no codegen), gzip-compressed
exactly as ``profile.Write`` does.
"""

from __future__ import annotations

import gzip
import json

from pyspark.sql import DataFrame

from ..sources.prw import _enc_uvarint, _enc_len, _tag
from .serializers import DEFAULT_MAX_RESULT_ROWS, bounded_collect


class _Node:
    __slots__ = ("name", "self_v", "children")

    def __init__(self, name: str):
        self.name = name
        self.self_v = 0
        self.children: dict[str, _Node] = {}

    def total(self) -> int:
        return self.self_v + sum(c.total() for c in self.children.values())


def flame_tree(
    df: DataFrame,
    stack_col: str = "stack",
    value_col: str = "total_us",
    max_rows: int | None = DEFAULT_MAX_RESULT_ROWS,
) -> _Node:
    """Collapsed rows → flamegraph tree (profilestorage/flametree.go
    merge): each row's value is the SELF value of the node at that
    exact stack.  Children are kept name-sorted for determinism."""
    root = _Node("total")
    for r in bounded_collect(df, max_rows):
        node = root
        for part in r[stack_col].split(">"):
            nxt = node.children.get(part)
            if nxt is None:
                nxt = node.children[part] = _Node(part)
            node = nxt
        node.self_v += int(r[value_col])
    return root


def _min_value(root: _Node, max_nodes: int) -> int:
    """Smallest node total kept so ≤ max_nodes render; smaller
    siblings fold into 'other' (flamebearer.go minValue)."""
    if max_nodes <= 0:
        return 0
    totals: list[int] = []

    def collect(n: _Node):
        for c in n.children.values():
            totals.append(c.total())
            collect(c)

    collect(root)
    if len(totals) <= max_nodes:
        return 0
    totals.sort(reverse=True)
    return totals[max_nodes - 1]


_UNITS = {"cpu": "nanoseconds", "alloc_space": "bytes", "inuse_space": "bytes"}


def profile_flamebearer(
    df: DataFrame,
    stack_col: str = "stack",
    value_col: str = "total_us",
    sample_type: str = "cpu",
    max_nodes: int = 0,
) -> dict:
    """Flamegraph rows → Pyroscope FlamebearerProfileV1 'single'
    format (flamebearer.go:34-125): per level, chunks of four ints
    [xOffset (delta-encoded), total, self, nameIndex]; names[0] is the
    synthetic 'total' root."""
    root = flame_tree(df, stack_col, value_col)
    names: list[str] = []
    name_index: dict[str, int] = {}
    levels: list[list[int]] = []
    max_self = 0
    min_val = _min_value(root, max_nodes)

    def intern(name: str) -> int:
        if name in name_index:
            return name_index[name]
        i = len(names)
        if i == 0:
            name = "total"
        name_index[name] = i
        names.append(name)
        return i

    def walk(n: _Node, total: int, level: int, x: int):
        nonlocal max_self
        max_self = max(max_self, n.self_v)
        idx = intern(n.name)
        if level == len(levels):
            levels.append([])
        levels[level].extend([x, total, n.self_v, idx])
        child_x = x + n.self_v
        other = 0
        for c in sorted(n.children.values(), key=lambda c: c.name):
            ct = c.total()
            if min_val > 0 and ct < min_val:
                other += ct
                continue
            walk(c, ct, level + 1, child_x)
            child_x += ct
        if other > 0:
            o = _Node("other")
            o.self_v = other
            walk(o, other, level + 1, child_x)

    num_ticks = root.total()
    walk(root, num_ticks, 0, 0)
    # delta-encode x offsets per level relative to the previous
    # node's right edge (flamebearer.go deltaEncode)
    for lvl in levels:
        prev = 0
        for i in range(0, len(lvl), 4):
            abs_x = lvl[i]
            lvl[i] = abs_x - prev
            prev = abs_x + lvl[i + 1]

    units = _UNITS.get(sample_type, "samples")
    return {
        "version": 1,
        "flamebearer": {
            "names": names,
            "levels": levels,
            "numTicks": num_ticks,
            "maxSelf": max_self,
        },
        "metadata": {
            "name": sample_type,
            "spyName": "oteldb_spark",
            "sampleRate": 1_000_000_000 if sample_type == "cpu" else 100,
            "units": units,
            "format": "single",
        },
    }


# --- pprof ------------------------------------------------------------------


def _packed_uvarints(fno: int, values: list[int]) -> bytes:
    return _enc_len(fno, b"".join(_enc_uvarint(v) for v in values))


def profile_pprof(
    df: DataFrame,
    stack_col: str = "stack",
    value_col: str = "total_us",
    sample_type: str = "cpu",
    sample_unit: str = "nanoseconds",
    period_type: str = "cpu",
    period_unit: str = "nanoseconds",
) -> bytes:
    """Flamegraph rows → gzip-compressed Google pprof profile
    (pprof.go:17-44): each node with self > 0 becomes a sample whose
    location stack is leaf-first; the synthetic root is omitted.
    profile.proto field numbers: sample_type=1, sample=2, location=4,
    function=5, string_table=6, period_type=11."""
    root = flame_tree(df, stack_col, value_col)

    strings: list[str] = [""]
    str_index: dict[str, int] = {"": 0}

    def sidx(s: str) -> int:
        if s not in str_index:
            str_index[s] = len(strings)
            strings.append(s)
        return str_index[s]

    loc_ids: dict[str, int] = {}
    locations: list[bytes] = []
    functions: list[bytes] = []

    def location(name: str) -> int:
        if name in loc_ids:
            return loc_ids[name]
        fid = lid = len(locations) + 1
        functions.append(
            _tag(1, 0)
            + _enc_uvarint(fid)  # id
            + _tag(2, 0)
            + _enc_uvarint(sidx(name))  # name
            + _tag(3, 0)
            + _enc_uvarint(sidx(name))  # system_name
        )
        line = _tag(1, 0) + _enc_uvarint(fid)  # Line.function_id
        locations.append(
            _tag(1, 0) + _enc_uvarint(lid) + _enc_len(4, line)
        )
        loc_ids[name] = lid
        return lid

    samples: list[bytes] = []

    def walk(n: _Node, parents: list[int]):
        # leaf-first stack: this node's location precedes ancestors
        stack = [location(n.name), *parents]
        if n.self_v > 0:
            samples.append(
                _packed_uvarints(1, stack)
                + _packed_uvarints(2, [n.self_v])
            )
        for c in sorted(n.children.values(), key=lambda c: c.name):
            walk(c, stack)

    for c in sorted(root.children.values(), key=lambda c: c.name):
        walk(c, [])

    vt = _tag(1, 0) + _enc_uvarint(sidx(sample_type)) + _tag(2, 0) + _enc_uvarint(
        sidx(sample_unit)
    )
    pt = _tag(1, 0) + _enc_uvarint(sidx(period_type)) + _tag(2, 0) + _enc_uvarint(
        sidx(period_unit)
    )
    out = bytearray()
    out += _enc_len(1, vt)
    for s in samples:
        out += _enc_len(2, s)
    for loc in locations:
        out += _enc_len(4, loc)
    for fn in functions:
        out += _enc_len(5, fn)
    for s in strings:
        out += _enc_len(6, s.encode())
    out += _enc_len(11, pt)
    return gzip.compress(bytes(out), mtime=0)


# --- standalone HTML --------------------------------------------------------

_HTML_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>{title}</title>
<style>
  body {{ font: 12px monospace; margin: 0; padding: 8px; }}
  #flamegraph {{ position: relative; }}
  .frame {{
    position: absolute; height: 17px; line-height: 17px;
    overflow: hidden; white-space: nowrap; box-sizing: border-box;
    border: 1px solid #fff; background: #eb9; padding: 0 2px;
    font-size: 11px; cursor: default;
  }}
</style>
</head>
<body>
<h3>{title}</h3>
<div id="flamegraph"></div>
<script type="text/javascript">
window.flamegraph = {payload};
(function () {{
  var fb = window.flamegraph.flamebearer;
  var names = fb.names, levels = fb.levels, numTicks = fb.numTicks || 1;
  var root = document.getElementById("flamegraph");
  var rowH = 18;
  root.style.height = (levels.length * rowH) + "px";
  for (var d = 0; d < levels.length; d++) {{
    var lvl = levels[d], x = 0;
    for (var i = 0; i < lvl.length; i += 4) {{
      x += lvl[i];
      var total = lvl[i + 1], name = names[lvl[i + 3]];
      var el = document.createElement("div");
      el.className = "frame";
      el.style.left = (100 * x / numTicks) + "%";
      el.style.width = (100 * total / numTicks) + "%";
      el.style.top = (d * rowH) + "px";
      el.textContent = name;
      el.title = name + " (" + total + ")";
      root.appendChild(el);
      x += total;
    }}
  }}
}})();
</script>
</body>
</html>
"""


def profile_html(
    df: DataFrame,
    stack_col: str = "stack",
    value_col: str = "total_us",
    sample_type: str = "cpu",
) -> str:
    """Standalone HTML flamegraph page with the flamebearer profile
    embedded as JSON (html.go:12-27)."""
    payload = profile_flamebearer(df, stack_col, value_col, sample_type)
    return _HTML_PAGE.format(
        title=sample_type, payload=json.dumps(payload, sort_keys=True)
    )
