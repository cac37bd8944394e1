"""Safe fallback interpreter for DSL expressions the SQL translator rejects.

The reference ``eval``s arbitrary Python per index
(``plugin_polling_generic_snmp.py:489-521``) — a sandboxing hazard. This
module provides the escape hatch WITHOUT eval: a whitelist AST interpreter
(arithmetic, comparisons, comprehensions, str methods, a fixed builtin set)
executed inside an Arrow-batched pandas UDF. Slow path by design — the
translator handles the observed corpus; this catches the tail.
"""

from __future__ import annotations

import ast

_ALLOWED_BUILTINS = {
    "int": int, "float": float, "str": str, "len": len, "round": round,
    "abs": abs, "min": min, "max": max, "sum": sum, "sorted": sorted,
    "any": any, "all": all,
}

_ALLOWED_STR_METHODS = {
    "lower", "upper", "strip", "split", "startswith", "endswith", "replace",
    "join", "zfill",
}
_ALLOWED_DICT_METHODS = {"values", "items", "keys", "get"}


class SafeEvalError(ValueError):
    pass


class SafeEvaluator(ast.NodeVisitor):
    """Evaluate a restricted Python expression AST against an environment."""

    def __init__(self, env: dict):
        self.env = env

    def eval(self, node):
        return self.visit(node)

    def generic_visit(self, node):
        raise SafeEvalError(f"disallowed syntax: {type(node).__name__}")

    def visit_Expression(self, node):
        return self.visit(node.body)

    def visit_Constant(self, node):
        if isinstance(node.value, (int, float, str, bool)) or node.value is None:
            return node.value
        raise SafeEvalError("disallowed constant")

    def visit_Name(self, node):
        if node.id in self.env:
            return self.env[node.id]
        if node.id in _ALLOWED_BUILTINS:
            return _ALLOWED_BUILTINS[node.id]
        raise SafeEvalError(f"unknown name {node.id}")

    def visit_BinOp(self, node):
        l, r = self.visit(node.left), self.visit(node.right)
        ops = {
            ast.Add: lambda: l + r, ast.Sub: lambda: l - r,
            ast.Mult: lambda: l * r, ast.Div: lambda: l / r,
            ast.Mod: lambda: l % r, ast.Pow: lambda: l ** r,
            ast.FloorDiv: lambda: l // r,
        }
        fn = ops.get(type(node.op))
        if fn is None:
            raise SafeEvalError("disallowed operator")
        return fn()

    def visit_UnaryOp(self, node):
        v = self.visit(node.operand)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.Not):
            return not v
        raise SafeEvalError("disallowed unary op")

    def visit_BoolOp(self, node):
        if isinstance(node.op, ast.And):
            out = True
            for v in node.values:
                out = self.visit(v)
                if not out:
                    return out
            return out
        out = False
        for v in node.values:
            out = self.visit(v)
            if out:
                return out
        return out

    def visit_Compare(self, node):
        left = self.visit(node.left)
        for op, comp in zip(node.ops, node.comparators):
            right = self.visit(comp)
            ok = {
                ast.Eq: lambda: left == right, ast.NotEq: lambda: left != right,
                ast.Lt: lambda: left < right, ast.LtE: lambda: left <= right,
                ast.Gt: lambda: left > right, ast.GtE: lambda: left >= right,
                ast.In: lambda: left in right,
                ast.NotIn: lambda: left not in right,
            }.get(type(op))
            if ok is None:
                raise SafeEvalError("disallowed comparison")
            if not ok():
                return False
            left = right
        return True

    def visit_IfExp(self, node):
        return self.visit(node.body) if self.visit(node.test) else self.visit(node.orelse)

    def visit_List(self, node):
        return [self.visit(e) for e in node.elts]

    def visit_Tuple(self, node):
        return tuple(self.visit(e) for e in node.elts)

    def visit_Set(self, node):
        return {self.visit(e) for e in node.elts}

    def visit_Dict(self, node):
        return {self.visit(k): self.visit(v) for k, v in zip(node.keys, node.values)}

    def visit_Subscript(self, node):
        obj = self.visit(node.value)
        return obj[self.visit(node.slice)]

    def visit_Call(self, node):
        fn = None
        if isinstance(node.func, ast.Name):
            fn = self.visit(node.func)
        elif isinstance(node.func, ast.Attribute):
            obj = self.visit(node.func.value)
            name = node.func.attr
            allowed = (
                _ALLOWED_STR_METHODS if isinstance(obj, str) else
                _ALLOWED_DICT_METHODS if isinstance(obj, dict) else set()
            )
            if name not in allowed:
                raise SafeEvalError(f"disallowed method .{name}()")
            fn = getattr(obj, name)
        else:
            raise SafeEvalError("disallowed call")
        args = [self.visit(a) for a in node.args]
        if node.keywords:
            raise SafeEvalError("kwargs disallowed")
        return fn(*args)

    def visit_ListComp(self, node):
        return list(self._comp(node.generators, node.elt))

    def visit_GeneratorExp(self, node):
        return list(self._comp(node.generators, node.elt))

    def _comp(self, generators, elt):
        def rec(gens):
            if not gens:
                yield self.visit(elt)
                return
            gen = gens[0]
            iterable = self.visit(gen.iter)
            for item in iterable:
                saved = dict(self.env)
                self._bind(gen.target, item)
                if all(self.visit(i) for i in gen.ifs):
                    yield from rec(gens[1:])
                self.env = saved
        yield from rec(list(generators))

    def visit_Lambda(self, node):
        raise SafeEvalError("nested lambda disallowed")

    def _bind(self, target, value):
        if isinstance(target, ast.Name):
            self.env[target.id] = value
        elif isinstance(target, ast.Tuple):
            for t, v in zip(target.elts, value):
                self._bind(t, v)
        else:
            raise SafeEvalError("disallowed binding target")


def safe_eval(expr: str, env: dict):
    tree = ast.parse(expr, mode="eval")
    return SafeEvaluator(dict(env)).eval(tree.body)


def compile_safe_lambda(src: str):
    """'lambda x: ...' -> a python callable running under the interpreter."""
    tree = ast.parse(src, mode="eval")
    fn = tree.body
    if not isinstance(fn, ast.Lambda) or len(fn.args.args) != 1:
        raise SafeEvalError("transform must be a 1-arg lambda")
    var = fn.args.args[0].arg

    def call(x):
        return SafeEvaluator({var: x}).eval(fn.body)

    return call
