"""LogQL lexer — regex-based tokenizer mirroring the token set of the
reference's ``internal/lexerql`` (idents, strings, numbers, durations,
bytes, operators, parens/braces/brackets, pipe operators).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<string>"(?:\\.|[^"\\])*"|`[^`]*`)
  | (?P<duration>[0-9]+(?:\.[0-9]+)?(?:ns|us|µs|ms|s|m|h|d|w)(?:[0-9]+(?:\.[0-9]+)?(?:ns|us|µs|ms|s|m|h|d|w))*)
  | (?P<bytes>[0-9]+(?:\.[0-9]+)?(?:[KMGTP]i?B|b))
  | (?P<number>0[xX][0-9a-fA-F]+|(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)
  | (?P<op>\|\||&&|\|=|\|~|\|>|!=|!~|!>|<=|>=|==|=~|>>|<<|\band\b|\bor\b|\bunless\b|\bby\b|\bwithout\b|\bbool\b|\bon\b|\bignoring\b|\bgroup_left\b|\bgroup_right\b|\boffset\b|[{}()\[\],=<>+\-*/%^|.:!~&@])
  | (?P<ident>[a-zA-Z_][a-zA-Z0-9_]*)
""",
    re.VERBOSE,
)

# duration unit → seconds
_UNITS = {
    "ns": 1e-9,
    "us": 1e-6,
    "µs": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
    "w": 604800.0,
}

_DUR_PART = re.compile(r"([0-9]+(?:\.[0-9]+)?)(ns|us|µs|ms|s|m|h|d|w)")


def duration_to_us(text: str) -> int:
    total = 0.0
    for num, unit in _DUR_PART.findall(text):
        total += float(num) * _UNITS[unit]
    return int(round(total * 1e6))


@dataclass
class Token:
    kind: str  # string duration bytes number op ident eof
    text: str
    pos: int

    def number(self) -> float:
        """Numeric value of a number token (decimal, leading-dot,
        scientific, or 0x hex — promql/parser.go lexer numbers)."""
        t = self.text
        if t[:2].lower() == "0x":
            return float(int(t, 16))
        return float(t)

    def unquote(self) -> str:
        t = self.text
        if t.startswith("`"):
            return t[1:-1]
        if t.startswith('"'):
            body = t[1:-1]
            return (
                body.replace(r"\"", '"')
                .replace(r"\\", "\\")
                .replace(r"\n", "\n")
                .replace(r"\t", "\t")
            )
        return t


def lex(text: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    while pos < len(text):
        m = TOKEN_RE.match(text, pos)
        if not m:
            raise SyntaxError(f"LogQL: unexpected char {text[pos]!r} at {pos}")
        kind = m.lastgroup
        if kind != "ws":
            out.append(Token(kind, m.group(), pos))
        pos = m.end()
    out.append(Token("eof", "", pos))
    return out
