"""Lucene expressions-module analogue (JavascriptCompiler parity).

Lucene's expressions module compiles a small JavaScript-like
arithmetic language into a ``DoubleValuesSource`` that re-scores hits
from ``_score`` and per-doc value sources bound by name
(``SimpleBindings``). The reference engine inherits that surface from
Lucene 8.1 (the reference itself delegates all scoring to Lucene —
/root/reference/src/main/java/com/cloudant/fdblucene/FDBDirectory.java:52
is a byte store under it).

This module is the Spark-native equivalent, built from scratch:

* :func:`parse` — a Pratt parser over the Lucene expressions grammar
  (numbers, variables, ``+ - * / %``, unary ``- !``, comparisons,
  ``== !=``, ``&& ||``, ``?:``, function calls). Everything is a
  double, exactly like Lucene expressions: comparisons / logicals
  evaluate to 1.0 or 0.0, conditions treat non-zero as true.
* :func:`to_column` — compiles the AST to a Catalyst ``Column`` so
  the rescoring arithmetic runs JVM-side inside whole-stage codegen
  (never per-row Python).
* :func:`to_sql` — compiles the SAME AST to an ANSI/DuckDB SQL
  expression. The oracle twin of a query gate is generated from the
  identical parse tree the engine executes, so the two sides cannot
  drift.

Supported functions (each a Lucene expressions built-in): ``abs
ceil exp floor ln log10 log2 sqrt pow min max``. ``ceil``/``floor``
return doubles on both walkers (Spark's long result is cast back).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


class ExpressionError(ValueError):
    """Raised for syntax errors, unknown functions, or unbound vars."""


_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op><=|>=|==|!=|&&|\|\||[-+*/%()<>,?:!])"
    r")"
)

# (arity, spark builder, sql template) — sql templates take pre-rendered
# operand strings. ceil/floor: Spark returns LONG, DuckDB DOUBLE; both
# sides cast to double so the twin stays bit-parallel.
_FUNCS: dict[str, tuple[int, Callable[..., Column], Callable[..., str]]] = {
    "abs": (1, lambda a: F.abs(a), lambda a: f"abs({a})"),
    "ceil": (1, lambda a: F.ceil(a).cast("double"), lambda a: f"ceil({a})::DOUBLE"),
    "floor": (1, lambda a: F.floor(a).cast("double"), lambda a: f"floor({a})::DOUBLE"),
    "exp": (1, lambda a: F.exp(a), lambda a: f"exp({a})"),
    "ln": (1, lambda a: F.log(a), lambda a: f"ln({a})"),
    "log10": (1, lambda a: F.log10(a), lambda a: f"log10({a})"),
    "log2": (1, lambda a: F.log2(a), lambda a: f"log2({a})"),
    "sqrt": (1, lambda a: F.sqrt(a), lambda a: f"sqrt({a})"),
    "pow": (2, lambda a, b: F.pow(a, b), lambda a, b: f"pow({a}, {b})"),
    "min": (2, lambda a, b: F.least(a, b), lambda a, b: f"least({a}, {b})"),
    "max": (2, lambda a, b: F.greatest(a, b), lambda a, b: f"greatest({a}, {b})"),
}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            rest = src[pos:].strip()
            if not rest:
                break
            raise ExpressionError(f"unexpected character at {pos}: {rest[:10]!r}")
        pos = m.end()
        for kind in ("num", "name", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive-descent with C precedence: ternary < || < && <
    equality < relational < additive < multiplicative < unary < call."""

    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def take(self, op: str | None = None) -> tuple[str, str]:
        kind, v = self.toks[self.i]
        if op is not None and (kind != "op" or v != op):
            raise ExpressionError(f"expected {op!r}, found {v or kind!r}")
        self.i += 1
        return kind, v

    def parse(self) -> tuple:
        node = self.ternary()
        kind, v = self.peek()
        if kind != "eof":
            raise ExpressionError(f"trailing input at token {v!r}")
        return node

    def ternary(self) -> tuple:
        cond = self.or_()
        if self.peek() == ("op", "?"):
            self.take("?")
            then = self.ternary()
            self.take(":")
            other = self.ternary()
            return ("ter", cond, then, other)
        return cond

    def _binchain(self, sub, ops: set[str], tag: str) -> tuple:
        node = sub()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            _, op = self.take()
            node = (tag, op, node, sub())
        return node

    def or_(self) -> tuple:
        return self._binchain(self.and_, {"||"}, "logic")

    def and_(self) -> tuple:
        return self._binchain(self.equality, {"&&"}, "logic")

    def equality(self) -> tuple:
        return self._binchain(self.relational, {"==", "!="}, "cmp")

    def relational(self) -> tuple:
        return self._binchain(self.additive, {"<", "<=", ">", ">="}, "cmp")

    def additive(self) -> tuple:
        return self._binchain(self.multiplicative, {"+", "-"}, "bin")

    def multiplicative(self) -> tuple:
        return self._binchain(self.unary, {"*", "/", "%"}, "bin")

    def unary(self) -> tuple:
        kind, v = self.peek()
        if kind == "op" and v in ("-", "!"):
            self.take()
            return ("un", v, self.unary())
        return self.primary()

    def primary(self) -> tuple:
        kind, v = self.take()
        if kind == "num":
            return ("num", v)
        if kind == "name":
            if self.peek() == ("op", "("):
                self.take("(")
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.ternary())
                    while self.peek() == ("op", ","):
                        self.take(",")
                        args.append(self.ternary())
                self.take(")")
                spec = _FUNCS.get(v)
                if spec is None:
                    raise ExpressionError(f"unknown function {v!r}")
                if len(args) != spec[0]:
                    raise ExpressionError(
                        f"{v}() takes {spec[0]} argument(s), got {len(args)}"
                    )
                return ("call", v, args)
            return ("var", v)
        if (kind, v) == ("op", "("):
            node = self.ternary()
            self.take(")")
            return node
        raise ExpressionError(f"unexpected token {v or kind!r}")


def parse(src: str) -> tuple:
    """Parse a Lucene-expressions string into an AST (nested tuples)."""
    return _Parser(src).parse()


def variables(node: tuple) -> list[str]:
    """All variable names referenced by the AST, sorted, ``_score``
    included if present."""
    out: set[str] = set()

    def walk(n: tuple) -> None:
        tag = n[0]
        if tag == "var":
            out.add(n[1])
        elif tag == "call":
            for a in n[2]:
                walk(a)
        elif tag in ("bin", "cmp", "logic"):
            walk(n[2])
            walk(n[3])
        elif tag == "un":
            walk(n[2])
        elif tag == "ter":
            walk(n[1])
            walk(n[2])
            walk(n[3])

    walk(node)
    return sorted(out)


def to_column(node: tuple, bindings: dict[str, Column]) -> Column:
    """Compile the AST to a Catalyst Column. ``bindings`` maps every
    variable name to a double-typed Column (callers coalesce NULLs to
    0.0 first — Lucene's missing-value contract)."""
    tag = node[0]
    if tag == "num":
        return F.lit(float(node[1]))
    if tag == "var":
        col = bindings.get(node[1])
        if col is None:
            raise ExpressionError(f"unbound variable {node[1]!r}")
        return col
    if tag == "call":
        return _FUNCS[node[1]][1](*[to_column(a, bindings) for a in node[2]])
    if tag == "un":
        x = to_column(node[2], bindings)
        if node[1] == "-":
            return -x
        return (x == F.lit(0.0)).cast("double")
    if tag == "bin":
        left, right = to_column(node[2], bindings), to_column(node[3], bindings)
        op = node[1]
        if op == "+":
            return left + right
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "/":
            return left / right
        return left % right
    if tag == "cmp":
        left, right = to_column(node[2], bindings), to_column(node[3], bindings)
        op = node[1]
        cond = {
            "<": left < right, "<=": left <= right, ">": left > right,
            ">=": left >= right, "==": left == right, "!=": left != right,
        }[op]
        return cond.cast("double")
    if tag == "logic":
        left, right = to_column(node[2], bindings), to_column(node[3], bindings)
        lt, rt = left != F.lit(0.0), right != F.lit(0.0)
        cond = (lt & rt) if node[1] == "&&" else (lt | rt)
        return cond.cast("double")
    if tag == "ter":
        cond = to_column(node[1], bindings) != F.lit(0.0)
        return F.when(
            cond, to_column(node[2], bindings)
        ).otherwise(to_column(node[3], bindings))
    raise ExpressionError(f"bad node {tag!r}")


def to_sql(node: tuple, bindings: dict[str, str]) -> str:
    """Compile the SAME AST to a DuckDB/ANSI SQL scalar expression.
    ``bindings`` maps variable names to SQL fragments (already
    double-typed). Numeric literals are cast to DOUBLE so DuckDB's
    DECIMAL inference can't change the arithmetic type lattice."""
    tag = node[0]
    if tag == "num":
        return f"({node[1]})::DOUBLE"
    if tag == "var":
        frag = bindings.get(node[1])
        if frag is None:
            raise ExpressionError(f"unbound variable {node[1]!r}")
        return f"({frag})"
    if tag == "call":
        return _FUNCS[node[1]][2](*[to_sql(a, bindings) for a in node[2]])
    if tag == "un":
        x = to_sql(node[2], bindings)
        if node[1] == "-":
            return f"(-{x})"
        return f"(CASE WHEN {x} = 0.0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)"
    if tag == "bin":
        left, right = to_sql(node[2], bindings), to_sql(node[3], bindings)
        op = node[1]
        if op == "%":
            return f"fmod({left}, {right})"
        return f"({left} {op} {right})"
    if tag == "cmp":
        left, right = to_sql(node[2], bindings), to_sql(node[3], bindings)
        op = {"==": "=", "!=": "<>"}.get(node[1], node[1])
        return (
            f"(CASE WHEN {left} {op} {right} "
            f"THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)"
        )
    if tag == "logic":
        left, right = to_sql(node[2], bindings), to_sql(node[3], bindings)
        joiner = "AND" if node[1] == "&&" else "OR"
        return (
            f"(CASE WHEN ({left} <> 0.0) {joiner} ({right} <> 0.0) "
            f"THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)"
        )
    if tag == "ter":
        cond = to_sql(node[1], bindings)
        then = to_sql(node[2], bindings)
        other = to_sql(node[3], bindings)
        return f"(CASE WHEN {cond} <> 0.0 THEN {then} ELSE {other} END)"
    raise ExpressionError(f"bad node {tag!r}")
