"""Expression translator for the metric-computation DSL (§2.9).

The reference evaluates arbitrary Python strings per index with ``eval``
(``plugin_polling_generic_snmp.py:489-521`` — a sandboxing hazard we must not
reproduce). This module instead parses the expression with :mod:`ast` and
compiles the observed corpus to Spark SQL strings:

- literals, arithmetic (+ - * / % **), comparisons, and/or/not, ternary
- ``table.$index`` references (rewritten to join-column placeholders)
- casts ``int()`` / ``float()`` / ``str()``, ``round(x, n)``, ``abs``
- membership ``x in ['1','2']`` (literal list) and ``x in other_table``
  (key-set membership → semi-join flag column)
- aggregate form ``len([x for x in T.values() if pred])`` /
  ``len([(x,y) for (x,y) in T.items() if pred])`` → count-where over T
  (the A1 conditional-count aggregates)
- ``transform`` lambdas (``lambda x: ...``) applied to a computed column

Unsupported constructs raise :class:`UnsupportedExpression`; callers may fall
back to a pandas UDF (slow path) — never ``eval``.

Python semantic parity notes:
- ``int('4.5')`` raises in Python → per-index skip; Spark ``CAST('4.5' AS
  BIGINT)`` yields NULL → row dropped. Same observable result.
- ``int(3.9)`` truncates toward zero in both engines.
- division ``/`` is true division (Python 3) → cast operands to DOUBLE.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass, field


class UnsupportedExpression(ValueError):
    pass


_TABLE_REF_RE = re.compile(r"(\w+)\.\$index")


def table_col(name: str) -> str:
    return f"__t_{name}"


@dataclass
class ExprInfo:
    """What a compiled expression needs from the plan."""

    sql: str
    tables: set = field(default_factory=set)  # joined per-index tables
    member_tables: set = field(default_factory=set)  # key-membership semi-join flags
    uses_index: bool = False
    is_aggregate: bool = False
    agg_table: str | None = None  # table the count-comprehension iterates
    agg_filter_sql: str | None = None  # filter over (index,value) of agg_table
    # per-row hazards inside the comprehension filter: in python, a raise
    # for ANY element aborts the whole len([...]) -> the aggregate is
    # poisoned for that device, not just the row
    agg_row_hazards: list = field(default_factory=list)
    # table SUBSCRIPTS (``pmt[x]`` — python dict lookup of another table
    # by a computed key): (table, key_sql) -> joined column alias. The
    # compiler left-joins each entry on (device_id, key) and a NULL
    # column models python's KeyError (hazard-scoped, so a lookup behind
    # a lazy ``k in pmt and pmt[k] ...`` guard never poisons)
    subscripts: dict = field(default_factory=dict)
    # Error-poison fragments: in the reference, ANY python error while
    # evaluating an expression skips the whole index — including errors
    # inside a ternary CONDITION, where SQL three-valued logic would
    # otherwise swallow the NULL into the ELSE branch. Each fragment is a
    # SQL expr that is NULL exactly when the corresponding python
    # sub-expression would raise; the compiler ORs their IS NULLs into a
    # poison guard around the final value.
    hazards: list = field(default_factory=list)


def _q(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


class _Translator:
    """ast -> Spark SQL. ``env`` maps python variable names to SQL exprs."""

    def __init__(self, known_tables: set, scalar_oids: set, env: dict | None = None):
        self.known_tables = known_tables
        self.scalar_oids = scalar_oids
        self.env = env or {}
        self.info = ExprInfo(sql="")
        # hazard scoping: python's ternary is LAZY — an error in the
        # un-taken branch does not raise. Hazards collect into the current
        # scope; IfExp opens one per arm and absorbs them locally.
        self._scopes: list[list[str]] = [self.info.hazards]

    def _add_hazard(self, sql: str):
        self._scopes[-1].append(sql)

    def _scoped(self, node) -> tuple[str, list]:
        self._scopes.append([])
        try:
            sql = self.translate(node)
        finally:
            hz = self._scopes.pop()
        return sql, hz

    @staticmethod
    def _wrap_poison(sql: str, hazards: list) -> str:
        if not hazards:
            return sql
        cond = " OR ".join(f"({h}) IS NULL" for h in hazards)
        return f"(CASE WHEN {cond} THEN NULL ELSE ({sql}) END)"

    def translate(self, node: ast.AST) -> str:
        m = getattr(self, f"_t_{type(node).__name__}", None)
        if m is None:
            raise UnsupportedExpression(
                f"unsupported syntax: {ast.dump(node)[:80]}"
            )
        return m(node)

    # -- leaves ----------------------------------------------------------

    def _t_Constant(self, node):
        v = node.value
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, str):
            return _q(v)
        if v is None:
            return "NULL"
        raise UnsupportedExpression(f"constant {v!r}")

    def _t_Name(self, node):
        if node.id in self.env:
            sql = self.env[node.id]
            # a table.$index placeholder: missing key -> KeyError in the
            # reference -> poison (scoped, so un-taken branches are exempt)
            if isinstance(sql, str) and sql.startswith("__t_"):
                self._add_hazard(sql)
            return sql
        if node.id in self.scalar_oids:
            # a `get`-method scalar oid: joined per-device
            self.info.tables.add(node.id)
            self._add_hazard(table_col(node.id))
            return table_col(node.id)
        raise UnsupportedExpression(f"unknown name {node.id!r}")

    def _t_Attribute(self, node):
        raise UnsupportedExpression("attribute access outside table.$index")

    def _t_Subscript(self, node):
        # python dict lookup of a table by a computed key (the juniper
        # power program's ``power_module_types[x]``): resolves to a
        # column left-joined by the compiler; NULL = KeyError (hazard)
        if not (
            isinstance(node.value, ast.Name)
            and node.value.id in self.known_tables
        ):
            raise UnsupportedExpression("subscript of non-table")
        tname = node.value.id
        sl = node.slice
        key_sql = self.translate(sl)
        col = self.info.subscripts.get((tname, key_sql))
        if col is None:
            col = f"__sub_{tname}_{len(self.info.subscripts)}"
            self.info.subscripts[(tname, key_sql)] = col
        self._add_hazard(col)
        return col

    # -- operators -------------------------------------------------------

    _BINOPS = {
        ast.Add: "+",
        ast.Sub: "-",
        ast.Mult: "*",
        ast.Mod: "%",
    }

    # operand SQLs with these prefixes are STRING-typed table cells /
    # subscript lookups. The reference's static maps keep their JSON
    # number types (int/float) and arithmetic on them is numeric; Spark
    # stores every cell as string, and its implicit string coercion is a
    # STRICT cast under ANSI — '1.0' * bigint is job-fatal (cisco 6509-E
    # temp_sensor_scales) — so coerce explicitly with TRY_CAST and
    # register the hazard: a non-numeric string maps to python's
    # TypeError/ValueError, skipping the index.
    #
    # DEVIATION (documented): python `str * int` REPEATS and
    # `str + str` CONCATENATES ('42' * 2 -> '4242'); we interpret both
    # numerically ('42' * 2 -> 84). No reference program applies
    # arithmetic to a bare walked string (they cast first or multiply
    # against numeric statics) — all 14 polling goldens replay exactly —
    # and the numeric reading is the sane one for a metrics DSL.
    _STR_OPERAND = ("__t_", "__sub_", "__agg_value")

    def _num(self, sql: str) -> str:
        if sql.startswith(self._STR_OPERAND):
            out = f"TRY_CAST({sql} AS DOUBLE)"
            self._add_hazard(out)
            return out
        return sql

    def _t_BinOp(self, node):
        l, r = self.translate(node.left), self.translate(node.right)
        if isinstance(node.op, ast.Div):
            # python3 true division; try_divide: ZeroDivisionError -> row skip
            sql = f"try_divide(CAST({l} AS DOUBLE), CAST({r} AS DOUBLE))"
            self._add_hazard(sql)
            return sql
        if isinstance(node.op, ast.Pow):
            return f"POWER({l}, {r})"
        if isinstance(node.op, ast.FloorDiv):
            return f"FLOOR(CAST({l} AS DOUBLE) / CAST({r} AS DOUBLE))"
        op = self._BINOPS.get(type(node.op))
        if not op:
            raise UnsupportedExpression(f"operator {node.op}")
        return f"({self._num(l)} {op} {self._num(r)})"

    def _t_UnaryOp(self, node):
        v = self.translate(node.operand)
        if isinstance(node.op, ast.USub):
            # negating a string cell: python raises; ANSI's implicit
            # strict cast would kill the job — same coercion as BinOp
            return f"(- {self._num(v)})"
        if isinstance(node.op, ast.Not):
            return f"(NOT {v})"
        raise UnsupportedExpression(f"unary {node.op}")

    def _t_BoolOp(self, node):
        # python and/or are LAZY: in `a and b` an error in b never raises
        # when a is falsy (and vice versa for or). Scope-translate each
        # operand and compose a CASE chain so a hazard only propagates when
        # the operand would actually be evaluated under short-circuiting.
        is_and = isinstance(node.op, ast.And)
        parts = [self._scoped(v) for v in node.values]
        if not any(hz for _, hz in parts):
            op = " AND " if is_and else " OR "
            return "(" + op.join(sql for sql, _ in parts) + ")"
        sql, hz = parts[-1]
        acc = self._wrap_poison(sql, hz)
        for sql, hz in reversed(parts[:-1]):
            if is_and:
                acc = f"(CASE WHEN NOT ({sql}) THEN FALSE ELSE {acc} END)"
            else:
                acc = f"(CASE WHEN ({sql}) THEN TRUE ELSE {acc} END)"
            if hz:
                cond = " OR ".join(f"({h}) IS NULL" for h in hz)
                acc = f"(CASE WHEN {cond} THEN NULL ELSE {acc} END)"
        # NULL result <=> an actually-evaluated operand raised
        self._add_hazard(acc)
        return acc

    _CMPOPS = {ast.Eq: "=", ast.NotEq: "<>", ast.Lt: "<", ast.LtE: "<=",
               ast.Gt: ">", ast.GtE: ">="}

    def _t_Compare(self, node):
        if len(node.ops) != 1:
            raise UnsupportedExpression("chained comparison")
        op, right = node.ops[0], node.comparators[0]
        left_sql = self.translate(node.left)
        if isinstance(op, (ast.In, ast.NotIn)):
            neg = "NOT " if isinstance(op, ast.NotIn) else ""
            if isinstance(right, (ast.List, ast.Tuple, ast.Set)):
                items = ", ".join(self.translate(e) for e in right.elts)
                return f"({left_sql} {neg}IN ({items}))"
            if isinstance(right, ast.Name) and right.id in self.known_tables:
                # membership against another table's KEY set (python dict
                # `in` semantics) -> semi-join flag column; record the key
                # expression so the compiler can build the join
                self.info.member_tables.add((right.id, left_sql))
                flag = f"__in_{right.id}"
                return f"({neg}({flag}))" if neg else f"({flag})"
            # python `in` on a STRING value (e.g. a table cell:
            # `'Routing Engine' in cpu_name.$index`, juniper cpu_type)
            # is substring containment -> JVM instr, no py fallback
            right_sql = self.translate(right)
            return f"({neg}(instr({right_sql}, {left_sql}) > 0))"
        if type(op) not in self._CMPOPS:
            raise UnsupportedExpression(f"comparison {op}")
        right_sql = self.translate(right)
        if not isinstance(op, (ast.Eq, ast.NotEq)):
            # ORDERING comparison with exactly one string-cell side and a
            # non-string other side: Spark's implicit coercion is a
            # STRICT cast under ANSI ('1.0' > 1 is job-fatal), so coerce
            # the cell with TRY_CAST + hazard. ==/<> and cell-vs-quoted /
            # cell-vs-cell comparisons stay raw: string equality and
            # lexicographic string ordering agree across both engines.
            # (python would RAISE on str-vs-int ordering; same documented
            # numeric-reading deviation as _num's arithmetic note.)
            l_cell = left_sql.startswith(self._STR_OPERAND)
            r_cell = right_sql.startswith(self._STR_OPERAND)
            l_str = left_sql.startswith("'")
            r_str = right_sql.startswith("'")
            if l_cell and not (r_cell or r_str):
                left_sql = self._num(left_sql)
            elif r_cell and not (l_cell or l_str):
                right_sql = self._num(right_sql)
        return f"({left_sql} {self._CMPOPS[type(op)]} {right_sql})"

    def _t_IfExp(self, node):
        # python laziness: only the test plus the TAKEN branch can raise.
        test_sql, test_hz = self._scoped(node.test)
        body_sql, body_hz = self._scoped(node.body)
        else_sql, else_hz = self._scoped(node.orelse)
        body_w = self._wrap_poison(body_sql, body_hz)
        else_w = self._wrap_poison(else_sql, else_hz)
        if test_hz:
            cond = " OR ".join(f"({h}) IS NULL" for h in test_hz)
            composed = (
                f"(CASE WHEN {cond} THEN NULL WHEN {test_sql} THEN {body_w}"
                f" ELSE {else_w} END)"
            )
        else:
            composed = (
                f"(CASE WHEN {test_sql} THEN {body_w} ELSE {else_w} END)"
            )
        # NULL result <=> some evaluated part raised -> poison for parents
        self._add_hazard(composed)
        return composed

    # -- calls -----------------------------------------------------------

    def _t_Call(self, node):
        if not isinstance(node.func, ast.Name):
            raise UnsupportedExpression("call on non-name")
        fname = node.func.id
        args = node.args
        # TRY_CAST(string AS BIGINT): '4'->4, '4.5'->NULL (python int()
        # raises -> per-index skip); double->BIGINT truncates toward zero
        # like int(); plain CAST under ANSI mode would fail the whole job
        if fname == "int" and len(args) == 1:
            sql = f"TRY_CAST({self.translate(args[0])} AS BIGINT)"
            self._add_hazard(sql)
            return sql
        if fname == "float" and len(args) == 1:
            sql = f"TRY_CAST({self.translate(args[0])} AS DOUBLE)"
            self._add_hazard(sql)
            return sql
        if fname == "str" and len(args) == 1:
            return f"CAST({self.translate(args[0])} AS STRING)"
        if fname == "abs" and len(args) == 1:
            return f"ABS({self.translate(args[0])})"
        if fname == "round":
            inner = self.translate(args[0])
            nd = self.translate(args[1]) if len(args) > 1 else "0"
            return f"ROUND({inner}, {nd})"
        if fname == "len" and len(args) == 1 and isinstance(args[0], ast.ListComp):
            return self._aggregate_count(args[0])
        raise UnsupportedExpression(f"call {fname}()")

    def _aggregate_count(self, comp: ast.ListComp):
        """len([... for ... in T.values()/.items() if pred]) -> count-where."""
        if self.info.is_aggregate:
            raise UnsupportedExpression("nested aggregate")
        if len(comp.generators) != 1:
            raise UnsupportedExpression("multiple generators")
        gen = comp.generators[0]
        it = gen.iter
        if not (
            isinstance(it, ast.Call)
            and isinstance(it.func, ast.Attribute)
            and isinstance(it.func.value, ast.Name)
            and it.func.attr in ("values", "items", "keys")
        ):
            raise UnsupportedExpression("comprehension iterates non-table")
        tname = it.func.value.id
        if tname not in self.known_tables:
            raise UnsupportedExpression(f"unknown table {tname}")
        env = {}
        if it.func.attr == "values":
            if not isinstance(gen.target, ast.Name):
                raise UnsupportedExpression("values() target")
            env[gen.target.id] = "__agg_value"
        elif it.func.attr == "keys":
            if not isinstance(gen.target, ast.Name):
                raise UnsupportedExpression("keys() target")
            env[gen.target.id] = "__agg_index"
        else:  # items
            if not (isinstance(gen.target, ast.Tuple) and len(gen.target.elts) == 2):
                raise UnsupportedExpression("items() target")
            k, v = gen.target.elts
            env[k.id] = "__agg_index"
            env[v.id] = "__agg_value"
        # $index inside the filter = the DRIVING index of an indexed
        # aggregate target (juniper power_units_on)
        env["__IDX__"] = "index"
        sub = _Translator(self.known_tables, self.scalar_oids, env)
        if gen.ifs:
            cond = " AND ".join(sub.translate(i) for i in gen.ifs)
        else:
            cond = "TRUE"
        self.info.is_aggregate = True
        self.info.agg_table = tname
        self.info.agg_filter_sql = cond
        self.info.agg_row_hazards = list(sub.info.hazards)
        self.info.member_tables |= sub.info.member_tables
        self.info.tables |= sub.info.tables
        self.info.subscripts.update(sub.info.subscripts)
        return "__agg_count"  # placeholder; compiler builds the agg plan


def _rewrite_index_refs(expr: str) -> tuple[str, set]:
    """Replace ``table.$index`` with placeholder identifiers parseable by
    ast; a bare ``$index`` becomes the index variable itself (reference
    ``_parse_expression`` rewrites it to ``index``)."""
    tables = set(_TABLE_REF_RE.findall(expr))
    out = _TABLE_REF_RE.sub(lambda m: table_col(m.group(1)), expr)
    out = out.replace("$index", "__IDX__")
    return out, tables


def compile_value_expr(
    raw: object, known_tables: set, scalar_oids: set
) -> ExprInfo:
    """Compile a DSL ``value`` into an ExprInfo.

    ``raw`` may be a literal (int/float/str constant per shorthand rules,
    ``plugin_polling_generic_snmp.py:378-397``) or an expression string.
    String literals that are valid expressions referencing nothing are kept
    as expressions (matches the reference's eval, where '"'"'ctrl'"'"' evals
    to a string but ``ctrl`` would NameError).
    """
    if isinstance(raw, bool):
        # reference: isinstance(True, int) -> type 'integer'; True -> 1
        return ExprInfo(sql="TRUE" if raw else "FALSE")
    if isinstance(raw, (int, float)):
        return ExprInfo(sql=repr(raw))
    if not isinstance(raw, str):
        raise UnsupportedExpression(f"value of type {type(raw)}")

    rewritten, idx_tables = _rewrite_index_refs(raw)
    try:
        tree = ast.parse(rewritten, mode="eval")
    except SyntaxError as e:
        raise UnsupportedExpression(f"syntax error: {e}")

    tr = _Translator(known_tables, scalar_oids)
    # table.$index placeholders resolve as plain names
    for t in idx_tables:
        tr.env[table_col(t)] = table_col(t)
    tr.env["__IDX__"] = "index"
    sql = tr.translate(tree.body)
    info = tr.info
    info.sql = sql
    info.tables |= idx_tables
    info.uses_index = bool(idx_tables) or "__IDX__" in rewritten
    return info


def compile_transform(
    raw: str,
    inner_sql: str,
    known_tables: set,
    scalar_oids: set,
    info: ExprInfo | None = None,
) -> str:
    """Compile a ``lambda x: ...`` transform applied to ``inner_sql``.

    Hazard fragments from the transform body are appended to ``info`` when
    given (the transform runs under the same error-skip semantics)."""
    try:
        tree = ast.parse(raw, mode="eval")
    except SyntaxError as e:
        raise UnsupportedExpression(f"transform syntax error: {e}")
    fn = tree.body
    if not isinstance(fn, ast.Lambda) or len(fn.args.args) != 1:
        raise UnsupportedExpression("transform must be a 1-arg lambda")
    var = fn.args.args[0].arg
    tr = _Translator(known_tables, scalar_oids, env={var: inner_sql})
    sql = tr.translate(fn.body)
    if info is not None:
        info.hazards.extend(tr.info.hazards)
        info.tables |= tr.info.tables
        info.member_tables |= tr.info.member_tables
    return sql


CAST_SQL = {
    # reference _TYPE_MAPPING (plugin_polling_generic_snmp.py:22-44)
    "Integer": "BIGINT", "Integer32": "BIGINT", "UInteger32": "BIGINT",
    "Counter32": "BIGINT", "Counter64": "BIGINT", "Gauge32": "BIGINT",
    "TimeTicks": "BIGINT", "integer": "BIGINT", "int": "BIGINT",
    "long": "BIGINT",
    "float": "DOUBLE", "double": "DOUBLE",
    "Octet String": "STRING", "Object Identifier": "STRING",
    "Bit String": "STRING", "IpAddress": "STRING", "Opaque": "STRING",
    "NsapAddress": "STRING", "string": "STRING", "str": "STRING",
}


def cast_sql(inner_sql: str, type_name: str) -> str:
    t = CAST_SQL.get(type_name)
    if t is None:
        raise UnsupportedExpression(f"unknown type {type_name!r}")
    return f"TRY_CAST({inner_sql} AS {t})"
