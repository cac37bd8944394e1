"""Resource filter DSL — the reference's "SELECT" frontend, Spark-first.

Grammar (ported behaviorally from the 42-line pyparsing grammar at
``/root/reference/yahoo_panoptes/framework/resources.py:660-701``; documented
semantics ``docs/Concepts.md`` "DSL" and class docstring ``resources.py:614-640``):

    query      :=  condition ((AND | OR) condition)*
    condition  :=  lval (= | != | eq | ne) rval
                |  lval [NOT] LIKE rval
                |  lval [NOT] IN '(' rval (',' rval)* ')'
    lval       :=  resource_site | resource_class | resource_subclass
                |  resource_type | resource_id | resource_endpoint
                |  resource_metadata '.' identifier
    rval       :=  '"' chars with \\ escape '"'

Keywords and field names are case-insensitive; values are always strings;
parenthesized grouping is NOT supported (parse error, as in the reference).

Where the reference compiles to SQLite over an EAV pair of tables with
INTERSECT/UNION re-correlation (``resources.py:714-787``) — an artifact of
SQLite lacking a map type — this compiler emits a single Spark SQL boolean
expression over the typed ``resources`` DataFrame, using ``element_at`` on
the MapType metadata column. Catalyst then gets filter pushdown, constant
folding and whole-stage codegen for free.

Null semantics match the EAV behavior: a resource lacking a metadata key
contributes no EAV row in the reference, so any predicate on that key is
false; in Spark ``element_at(map, key)`` is NULL and SQL three-valued logic
makes the predicate non-true. AND binds tighter than OR (SQL precedence,
matching the flat left-to-right SQL string the reference builds).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

RESOURCE_FIELDS = {
    "resource_site",
    "resource_class",
    "resource_subclass",
    "resource_type",
    "resource_id",
    "resource_endpoint",
}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<op>!=|=)
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "like", "eq", "ne"}


class ResourceFilterParseError(ValueError):
    """Raised on any malformed query (mirrors pyparsing's ParseException)."""


@dataclass
class Condition:
    field: str  # a resource field, or "resource_metadata.<key>"
    op: str  # '=', '!=', 'LIKE', 'NOT LIKE', 'IN', 'NOT IN'
    values: list  # one value, or N for IN


@dataclass
class Query:
    # flat alternation: [Condition, 'AND'|'OR', Condition, ...]
    items: list


class _Tokenizer:
    def __init__(self, text: str):
        self.tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                rest = text[pos:].strip()
                if not rest:
                    break
                raise ResourceFilterParseError(
                    f"unparseable input at position {pos}: {rest[:40]!r}"
                )
            pos = m.end()
            kind = m.lastgroup
            val = m.group(kind)
            if kind == "string":
                # unescape \" and \\
                inner = val[1:-1]
                val = re.sub(r"\\(.)", r"\1", inner)
                self.tokens.append(("string", val))
            elif kind == "word":
                self.tokens.append(("word", val))
            else:
                self.tokens.append((kind, val))
        self.i = 0

    def peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def done(self):
        return self.i >= len(self.tokens)


def parse(query: str) -> Query:
    """Parse a DSL query string into a flat condition/connector list."""
    if not query or not query.strip():
        raise ResourceFilterParseError("query must be a non-empty string")
    tz = _Tokenizer(query)
    items: list = []
    items.append(_parse_condition(tz))
    while not tz.done():
        kind, val = tz.next()
        if kind != "word" or val.lower() not in ("and", "or"):
            raise ResourceFilterParseError(f"expected AND/OR, got {val!r}")
        connector = val.upper()
        items.append(connector)
        items.append(_parse_condition(tz))
    return Query(items)


def _parse_condition(tz: _Tokenizer) -> Condition:
    kind, val = tz.next()
    if kind == "lparen":
        raise ResourceFilterParseError(
            "parenthesized grouping is not supported by this DSL"
        )
    if kind != "word":
        raise ResourceFilterParseError(f"expected a field name, got {val!r}")
    field = val.lower()
    if field.startswith("resource_metadata."):
        key = field.split(".", 1)[1]
        if not re.match(r"^[^\d\W]\w*$", key):
            raise ResourceFilterParseError(f"invalid metadata key {key!r}")
    elif field not in RESOURCE_FIELDS:
        raise ResourceFilterParseError(f"unknown field {field!r}")

    kind, val = tz.next()
    negated = False
    if kind == "word" and val.lower() == "not":
        negated = True
        kind, val = tz.next()

    if kind == "op" or (kind == "word" and val.lower() in ("eq", "ne")):
        if negated:
            raise ResourceFilterParseError("NOT may only precede LIKE or IN")
        op = {"=": "=", "!=": "!=", "eq": "=", "ne": "!="}[val.lower()]
        vkind, vval = tz.next()
        if vkind != "string":
            raise ResourceFilterParseError(
                f"right-hand side must be a double-quoted string, got {vval!r}"
            )
        return Condition(field, op, [vval])

    if kind == "word" and val.lower() == "like":
        vkind, vval = tz.next()
        if vkind != "string":
            raise ResourceFilterParseError(
                f"LIKE pattern must be a double-quoted string, got {vval!r}"
            )
        return Condition(field, "NOT LIKE" if negated else "LIKE", [vval])

    if kind == "word" and val.lower() == "in":
        vkind, _ = tz.next()
        if vkind != "lparen":
            raise ResourceFilterParseError("IN must be followed by (")
        values = []
        while True:
            vkind, vval = tz.next()
            if vkind != "string":
                raise ResourceFilterParseError(
                    f"IN list items must be double-quoted strings, got {vval!r}"
                )
            values.append(vval)
            vkind, vval = tz.next()
            if vkind == "rparen":
                break
            if vkind != "comma":
                raise ResourceFilterParseError("expected , or ) in IN list")
        return Condition(field, "NOT IN" if negated else "IN", values)

    raise ResourceFilterParseError(f"expected an operator, got {val!r}")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


class ResourceFilter:
    """A parsed resource DSL query, compilable to Spark SQL or oracle SQL.

    Usage::

        rf = ResourceFilter('resource_class = "network" AND '
                            'resource_metadata.make NOT LIKE "Arista%"')
        df.where(rf.to_spark_sql())                 # MapType metadata column
        rf.to_flat_sql(meta_prefix="meta_")         # flat-column oracle WHERE
    """

    def __init__(self, query: str):
        self.query = query
        self.ast = parse(query)

    # -- compilation ------------------------------------------------------

    def to_spark_sql(self, metadata_col: str = "resource_metadata") -> str:
        """Boolean Spark SQL expression; metadata via element_at on MapType."""

        def lval(field: str) -> str:
            if field.startswith("resource_metadata."):
                key = field.split(".", 1)[1]
                return f"element_at({metadata_col}, {_sql_quote(key)})"
            return field

        return self._build(lval)

    def to_flat_sql(self, meta_prefix: str = "meta_") -> str:
        """ANSI SQL over a flat view where metadata key k is column
        ``{meta_prefix}{k}`` (for DuckDB oracle comparison)."""

        def lval(field: str) -> str:
            if field.startswith("resource_metadata."):
                return meta_prefix + field.split(".", 1)[1]
            return field

        return self._build(lval)

    def _build(self, lval) -> str:
        parts = []
        for item in self.ast.items:
            if isinstance(item, str):
                parts.append(item)
                continue
            lhs = lval(item.field)
            if item.op in ("=", "!="):
                parts.append(f"({lhs} {'=' if item.op == '=' else '<>'} {_sql_quote(item.values[0])})")
            elif item.op in ("LIKE", "NOT LIKE"):
                parts.append(f"({lhs} {item.op} {_sql_quote(item.values[0])})")
            else:  # IN / NOT IN
                vals = ", ".join(_sql_quote(v) for v in item.values)
                parts.append(f"({lhs} {item.op} ({vals}))")
        return " ".join(parts)

    def metadata_keys(self) -> list[str]:
        """Metadata keys referenced by the query (for flat-view projection)."""
        keys = []
        for item in self.ast.items:
            if isinstance(item, Condition) and item.field.startswith(
                "resource_metadata."
            ):
                k = item.field.split(".", 1)[1]
                if k not in keys:
                    keys.append(k)
        return keys


def query_resources(df, filter_query: str, ordered: bool = True):
    """P3+O2: filter a resources DataFrame with the DSL and return it in
    the reference's result order.

    The reference's compiled SQL ends in ``ORDER BY resource_metadata.id``
    (``resources.py:770,786``), where ``id`` is the SQLite rowid shared by
    the ``resources`` row — i.e. results come back in stable per-resource
    order, not filter order. The engine's stable identity is
    ``resource_id`` (serialization key, ``resources.py:284-292`` equality),
    so the Spark twin orders by it. Pass ``ordered=False`` to skip the sort
    (a global sort is a range-exchange at scale; only the sink that needs
    canonical order should pay for it).
    """
    from pyspark.sql import functions as F

    out = df.where(F.expr(ResourceFilter(filter_query).to_spark_sql()))
    return out.orderBy("resource_id") if ordered else out
