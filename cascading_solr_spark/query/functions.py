"""Solr function queries — the FunctionQParser / ValueSource analogue.

The reference's embedded Solr registers the ``func`` QParser and ships the
standard ValueSource library (solrconfig.xml:1744-1750 "used as function
names when using the 'func' QParser"); the eDisMax handler the reference
configures (solrconfig.xml:872 ``defType=edismax``) accepts ``bf`` (additive
boost functions), ``boost`` (multiplicative), and ``bq`` (additive boost
queries), and ``sort`` accepts function expressions over stored/docValues
fields.  This module implements the expression language once and renders it
twice:

* :func:`func_column` — a Spark ``Column`` over the docs table (JVM-side,
  whole-stage-codegen arithmetic; never a Python UDF), and
* :func:`func_sql` — the equivalent ANSI-SQL string, used by the DuckDB
  oracle so every boosted/sorted query keeps a hash-checked twin.

Supported functions (the Solr 4.x core set over numeric fields):
``field(f)`` / bare field name, numeric literals, ``sum sub product div
pow abs sqrt min max`` (min/max are Solr's 2-arg scalar forms →
least/greatest), ``log`` (base 10, Lucene's ``LogFloatFunction``),
``recip(x,m,a,b)`` = a/(m·x+b), ``linear(x,m,c)`` = m·x+c,
``map(x,min,max,target[,default])``, and ``geodist(lat,lon,lat0,lon0)`` —
the spatial ValueSource (schema.xml:684 LatLonType; haversine over the
WGS84 mean radius, km, exactly Solr's geodist).  geodist takes the two
numeric stored fields holding the coordinate (our LatLonType analogue:
a ``store`` location splits into ``<f>_lat``/``<f>_lon`` columns) plus the
query point; sort-by-distance = :func:`sort_by_function` over it, and
geofilt (``{{!geofilt d=...}}``) is ``doc_filter=f"{{func_sql(node)}} <=
d"`` — the rendered SQL is valid in BOTH DuckDB and Spark SQL, so the
filter rides the existing stored-field machinery.  Index-order sources
(``ord``/``rord``) and ``query()`` embedding are not implemented — ord
depends on segment-local sort order, which has no stable analogue across
a sharded Parquet doc store (documented deviation).

Scale note: a function expression touches only the stored NUMERIC fields it
names.  Callers project the docs scan to ``(doc_id, *func_fields(node))``
so the text/content columns never leave the Parquet reader.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "FuncNode",
    "parse_function",
    "func_column",
    "func_sql",
    "func_fields",
]

# function name -> arity (None = variadic >= 2)
_FUNCS: dict[str, int | None] = {
    "sum": None,
    "sub": 2,
    "product": None,
    "div": 2,
    "pow": 2,
    "abs": 1,
    "sqrt": 1,
    "log": 1,
    "min": 2,
    "max": 2,
    "recip": 4,
    "linear": 3,
    "map": None,  # 4 or 5 args, checked explicitly
    "field": 1,
    "geodist": 4,
}

# Solr's geodist uses the WGS84 earth mean radius (Lucene GeoUtils /
# DistanceUtils.EARTH_MEAN_RADIUS_KM)
_EARTH_RADIUS_KM = 6371.0087714

_NUM_RE = re.compile(r"-?\d+(?:\.\d+)?")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


@dataclass(frozen=True)
class FuncNode:
    """One node of a parsed function expression.

    ``name`` is ``"const"`` (args = (float,)), ``"field"`` (args =
    (field_name,)), or a function name from the supported set (args =
    child FuncNodes).
    """

    name: str
    args: tuple


class FunctionParseError(ValueError):
    pass


def _tokenize(expr: str) -> list[str]:
    toks: list[str] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
            continue
        if c in "(),":
            toks.append(c)
            i += 1
            continue
        m = _NUM_RE.match(expr, i)
        # a '-' is a numeric sign only when it starts a number (Solr's
        # parser has no infix operators, so this is unambiguous)
        if m and (c.isdigit() or c == "-"):
            toks.append(m.group())
            i = m.end()
            continue
        m = _IDENT_RE.match(expr, i)
        if m:
            toks.append(m.group())
            i = m.end()
            continue
        raise FunctionParseError(f"bad character {c!r} in function {expr!r}")
    return toks


def parse_function(expr: str, fields: set[str] | frozenset[str]) -> FuncNode:
    """Parse a Solr function-query expression against the known stored
    fields.  Grammar: ``expr := NUMBER | FIELD | name '(' expr (',' expr)*
    ')'``.  Unknown field references and unknown/mis-ary functions raise
    loudly (Solr's 400 on a bad function)."""
    toks = _tokenize(expr)
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def take(expected: str | None = None) -> str:
        nonlocal pos
        if pos >= len(toks):
            raise FunctionParseError(f"unexpected end of function {expr!r}")
        t = toks[pos]
        if expected is not None and t != expected:
            raise FunctionParseError(
                f"expected {expected!r}, found {t!r} in {expr!r}"
            )
        pos += 1
        return t

    def parse_expr() -> FuncNode:
        t = take()
        if _NUM_RE.fullmatch(t):
            return FuncNode("const", (float(t),))
        if peek() == "(":
            name = t.lower()
            if name not in _FUNCS:
                raise FunctionParseError(
                    f"unknown function {t!r} in {expr!r} "
                    f"(supported: {sorted(_FUNCS)})"
                )
            take("(")
            args: list[FuncNode] = [parse_expr()]
            while peek() == ",":
                take(",")
                args.append(parse_expr())
            take(")")
            if name == "field":
                if len(args) != 1 or args[0].name != "field":
                    raise FunctionParseError(
                        f"field() takes exactly one field name in {expr!r}"
                    )
                return args[0]
            arity = _FUNCS[name]
            if name == "map":
                if len(args) not in (4, 5):
                    raise FunctionParseError(
                        f"map() takes 4 or 5 args, got {len(args)} in {expr!r}"
                    )
            elif arity is None:
                if len(args) < 2:
                    raise FunctionParseError(
                        f"{name}() takes >= 2 args in {expr!r}"
                    )
            elif len(args) != arity:
                raise FunctionParseError(
                    f"{name}() takes {arity} args, got {len(args)} in {expr!r}"
                )
            return FuncNode(name, tuple(args))
        # bare identifier = field reference (Solr treats `popularity` and
        # `field(popularity)` identically for simple numeric fields)
        if t not in fields:
            raise FunctionParseError(
                f"unknown field {t!r} in function {expr!r} "
                f"(stored fields: {sorted(fields)})"
            )
        return FuncNode("field", (t,))

    node = parse_expr()
    if pos != len(toks):
        raise FunctionParseError(
            f"trailing tokens {toks[pos:]!r} in function {expr!r}"
        )
    return node


def func_fields(node: FuncNode) -> set[str]:
    """Stored fields referenced by the expression — the docs-scan
    projection (column pruning reaches the Parquet reader)."""
    if node.name == "field":
        return {node.args[0]}
    if node.name == "const":
        return set()
    out: set[str] = set()
    for a in node.args:
        out |= func_fields(a)
    return out


def func_column(node: FuncNode) -> Column:
    """Render as a Spark Column (fields cast to double — Solr evaluates
    numeric ValueSources as float/double)."""
    n, a = node.name, node.args
    if n == "const":
        return F.lit(a[0])
    if n == "field":
        return F.col(a[0]).cast("double")
    cols = [func_column(c) for c in a]
    if n == "sum":
        out = cols[0]
        for c in cols[1:]:
            out = out + c
        return out
    if n == "sub":
        return cols[0] - cols[1]
    if n == "product":
        out = cols[0]
        for c in cols[1:]:
            out = out * c
        return out
    if n == "div":
        return cols[0] / cols[1]
    if n == "pow":
        return F.pow(cols[0], cols[1])
    if n == "abs":
        return F.abs(cols[0])
    if n == "sqrt":
        return F.sqrt(cols[0])
    if n == "log":
        return F.log10(cols[0])
    if n == "min":
        return F.least(cols[0], cols[1])
    if n == "max":
        return F.greatest(cols[0], cols[1])
    if n == "recip":
        x, m, aa, b = cols
        return aa / (m * x + b)
    if n == "linear":
        x, m, c = cols
        return m * x + c
    if n == "map":
        x, lo, hi, target = cols[:4]
        default = cols[4] if len(cols) == 5 else x
        return F.when((x >= lo) & (x <= hi), target).otherwise(default)
    if n == "geodist":
        lat1, lon1, lat2, lon2 = (F.radians(c) for c in cols)
        h = (
            F.pow(F.sin((lat2 - lat1) / 2), 2)
            + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin((lon2 - lon1) / 2), 2)
        )
        return F.lit(2.0 * _EARTH_RADIUS_KM) * F.asin(F.sqrt(h))
    raise AssertionError(f"unreachable: {n}")


def func_sql(node: FuncNode, qualifier: str = "") -> str:
    """Render as ANSI SQL (the DuckDB oracle twin).  ``qualifier`` prefixes
    field references (e.g. ``"d."``) for use inside joins."""
    n, a = node.name, node.args
    if n == "const":
        return repr(a[0])
    if n == "field":
        return f"CAST({qualifier}{a[0]} AS DOUBLE)"
    sqls = [func_sql(c, qualifier) for c in a]
    if n == "sum":
        return "(" + " + ".join(sqls) + ")"
    if n == "sub":
        return f"({sqls[0]} - {sqls[1]})"
    if n == "product":
        return "(" + " * ".join(sqls) + ")"
    if n == "div":
        return f"({sqls[0]} / {sqls[1]})"
    if n == "pow":
        return f"power({sqls[0]}, {sqls[1]})"
    if n == "abs":
        return f"abs({sqls[0]})"
    if n == "sqrt":
        return f"sqrt({sqls[0]})"
    if n == "log":
        return f"log10({sqls[0]})"
    if n == "min":
        return f"least({sqls[0]}, {sqls[1]})"
    if n == "max":
        return f"greatest({sqls[0]}, {sqls[1]})"
    if n == "recip":
        x, m, aa, b = sqls
        return f"({aa} / ({m} * {x} + {b}))"
    if n == "linear":
        x, m, c = sqls
        return f"({m} * {x} + {c})"
    if n == "map":
        x, lo, hi, target = sqls[:4]
        default = sqls[4] if len(sqls) == 5 else x
        return (
            f"(CASE WHEN {x} >= {lo} AND {x} <= {hi} "
            f"THEN {target} ELSE {default} END)"
        )
    if n == "geodist":
        la1, lo1, la2, lo2 = (f"radians({s})" for s in sqls)
        h = (
            f"(power(sin(({la2} - {la1}) / 2), 2) + cos({la1}) * cos({la2})"
            f" * power(sin(({lo2} - {lo1}) / 2), 2))"
        )
        return f"(2.0 * {_EARTH_RADIUS_KM!r} * asin(sqrt({h})))"
    raise AssertionError(f"unreachable: {n}")
