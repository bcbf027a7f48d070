"""SQL92 message-property filter (reference P2: MessageSelector.bySql).

The reference pushes an SQL92 predicate over user properties to the
broker, which evaluates it per message when `enablePropertyFilter=true`
(docker/conf/broker.conf:96; example
src/main/java/org/apache/rocketmq/flink/example/PropertyFilterExamples.java:24).
Our local broker simulation does the same: the `sql` source option is
compiled ONCE per scan into a predicate and evaluated against each
message's property bag inside the reader (the "broker side" of this
engine), before rows ever reach Spark.

Grammar (the subset RocketMQ's FilterSpi supports, per its public filter
documentation): comparisons (= <> != > >= < <=), AND/OR/NOT,
[NOT] IN (...), [NOT] BETWEEN x AND y, IS [NOT] NULL, parentheses,
numeric / single-quoted string / TRUE|FALSE literals, identifiers naming
properties. RocketMQ semantics are preserved: properties are strings;
a comparison is numeric when the literal side is numeric and the
property parses as a number; a missing property makes any comparison
(other than IS NULL) false.

Catalyst note: on the DataFrame surface the same predicate is simply
`df.filter("props['item'] = 'iphone 12'")` — full SQL92 for free. This
module exists for the option-driven path, where the filter must run
below the DataFrame layer (exactly where the reference's broker runs
it).
"""

from __future__ import annotations

import re
from collections.abc import Callable

__all__ = ["compile_sql92", "Sql92Error"]


class Sql92Error(ValueError):
    """Invalid SQL92 filter expression."""


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+(?:\.\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><>|!=|>=|<=|=|>|<)
      | (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL", "TRUE", "FALSE"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise Sql92Error(f"unexpected character at {pos}: {text[pos:pos+10]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "word":
            up = val.upper()
            if up in _KEYWORDS:
                out.append((up, up))
            else:
                out.append(("ident", val))
        elif kind == "str":
            out.append(("lit", val[1:-1].replace("''", "'")))
        elif kind == "num":
            out.append(("lit", float(val)))
        else:
            out.append((kind if kind != "op" else val, val))
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive-descent parser producing a closure dict->bool."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def take(self, kind: str | None = None) -> tuple[str, str]:
        tok = self.toks[self.i]
        if kind is not None and tok[0] != kind:
            raise Sql92Error(f"expected {kind}, got {tok[0]} ({tok[1]!r})")
        self.i += 1
        return tok

    # expr := and_expr (OR and_expr)*
    def expr(self):
        node = self.and_expr()
        while self.peek()[0] == "OR":
            self.take()
            rhs = self.and_expr()
            lhs = node
            node = (lambda l, r: lambda p: l(p) or r(p))(lhs, rhs)
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.peek()[0] == "AND":
            self.take()
            rhs = self.not_expr()
            lhs = node
            node = (lambda l, r: lambda p: l(p) and r(p))(lhs, rhs)
        return node

    def not_expr(self):
        if self.peek()[0] == "NOT":
            self.take()
            inner = self.not_expr()
            return lambda p: not inner(p)
        return self.primary()

    def primary(self):
        if self.peek()[0] == "lpar":
            self.take()
            node = self.expr()
            self.take("rpar")
            return node
        return self.comparison()

    def _operand(self):
        kind, val = self.peek()
        if kind == "ident":
            self.take()
            name = val
            return ("ident", name)
        if kind == "lit":
            self.take()
            return ("lit", val)
        if kind in ("TRUE", "FALSE"):
            self.take()
            return ("lit", kind == "TRUE")
        raise Sql92Error(f"expected identifier or literal, got {kind} ({val!r})")

    def comparison(self):
        left = self._operand()
        kind, _ = self.peek()

        negate = False
        if kind == "NOT":
            self.take()
            kind, _ = self.peek()
            if kind not in ("IN", "BETWEEN"):
                raise Sql92Error("NOT must precede IN or BETWEEN here")
            negate = True

        if kind == "IS":
            self.take()
            want_null = True
            if self.peek()[0] == "NOT":
                self.take()
                want_null = False
            self.take("NULL")
            return (
                lambda p: (_value(left, p) is None) == want_null
            )

        if kind == "IN":
            self.take()
            self.take("lpar")
            items = [self._literal()]
            while self.peek()[0] == "comma":
                self.take()
                items.append(self._literal())
            self.take("rpar")
            strs = {_as_str(v) for v in items}

            def in_fn(p, left=left, strs=strs, negate=negate):
                v = _value(left, p)
                if v is None:
                    return False
                hit = _as_str(v) in strs
                return (not hit) if negate else hit

            return in_fn

        if kind == "BETWEEN":
            self.take()
            lo = self._operand()
            self.take("AND")
            hi = self._operand()

            def between_fn(p, left=left, lo=lo, hi=hi, negate=negate):
                v, a, b = _value(left, p), _value(lo, p), _value(hi, p)
                if v is None or a is None or b is None:
                    return False
                ok = _compare(v, a) >= 0 and _compare(v, b) <= 0
                return (not ok) if negate else ok

            return between_fn

        if kind in ("=", "<>", "!=", ">", ">=", "<", "<="):
            op = self.take()[0]

            right = self._operand()

            def cmp_fn(p, left=left, right=right, op=op):
                a, b = _value(left, p), _value(right, p)
                if a is None or b is None:
                    return False
                c = _compare(a, b)
                return {
                    "=": c == 0, "<>": c != 0, "!=": c != 0,
                    ">": c > 0, ">=": c >= 0, "<": c < 0, "<=": c <= 0,
                }[op]

            return cmp_fn

        raise Sql92Error(f"expected comparison operator, got {kind}")

    def _literal(self):
        kind, val = self.take()
        if kind == "lit":
            return val
        if kind in ("TRUE", "FALSE"):
            return kind == "TRUE"
        raise Sql92Error(f"expected literal, got {kind} ({val!r})")


def _value(operand, props):
    tag, v = operand
    if tag == "lit":
        return v
    return props.get(v)


def _as_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def _compare(a, b) -> int:
    """RocketMQ-style comparison: numeric when both sides are numeric
    (property strings parse), else string; booleans compare as
    true/false strings."""
    an, bn = _as_num(a), _as_num(b)
    if an is not None and bn is not None:
        return (an > bn) - (an < bn)
    sa, sb = _as_str(a), _as_str(b)
    return (sa > sb) - (sa < sb)


def _as_num(v) -> float | None:
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    try:
        return float(str(v).strip())
    except (TypeError, ValueError):
        return None


def compile_sql92(expression: str) -> Callable[[dict], bool]:
    """Compile an SQL92 property-filter expression into a predicate over
    a {property: value} dict. Raises Sql92Error on malformed input (the
    factory-validation analog: fail at plan time, not per message)."""
    parser = _Parser(_tokenize(expression))
    fn = parser.expr()
    if parser.peek()[0] != "eof":
        raise Sql92Error(f"trailing input at token {parser.i}")
    return fn
