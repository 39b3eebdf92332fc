"""Expression engine: parse SphinxQL expressions -> hashable tree -> device eval.

Behavioral model: the reference's expression VM (ExprParser_t,
/root/reference/src/sphinxexpr.cpp — 70+ functions at :3550-3631). This
implementation covers the numeric/conditional subset that runs on-device over
SoA attribute columns (arithmetic, comparisons, boolean ops, IF/IN/INTERVAL,
ABS/MIN/MAX/..., GEODIST) — the subset the reference itself evaluates in its
early/filter/sort stages. String/JSON functions are host-side, applied to
final top-k rows only (mirroring the reference's final-stage calc split,
sphinx.cpp:15905).

Trees are nested tuples (hashable) so they can live inside PlanSig and key
the jit cache:
    ("num", 2.5) ("attr", "price") ("weight",) ("id",)
    ("neg", x) ("add"|"sub"|"mul"|"div"|"mod", a, b)
    ("cmp_eq"|"cmp_ne"|"cmp_lt"|"cmp_le"|"cmp_gt"|"cmp_ge", a, b)
    ("and", a, b) ("or", a, b) ("not", a)
    ("call", NAME, (args...))
"""
from __future__ import annotations

import math
import re

import jax.numpy as jnp


class ExprError(ValueError):
    pass


_TOK = re.compile(r"""
    (?P<num>\d+\.\d*|\.\d+|\d+)
  | (?P<name>[A-Za-z_@][A-Za-z_0-9@.]*)
  | (?P<str>'(?:[^'\\]|\\.)*')
  | (?P<op><=|>=|<>|!=|==|=|<|>|\+|-|\*|/|%|\(|\)|,|\{|\})
  | (?P<ws>\s+)
""", re.VERBOSE)

_FUNCS_1 = {"ABS", "CEIL", "FLOOR", "SIN", "COS", "LN", "LOG2", "LOG10",
            "EXP", "SQRT", "BIGINT", "SINT", "INTEGER", "DOUBLE", "UINT"}
_FUNCS_N = {"MIN", "MAX", "POW", "IDIV", "IF", "IN", "INTERVAL", "GEODIST",
            "BITDOT", "MADD", "MUL3", "SUM", "TOP", "BM25A", "BM25F",
            "MAX_WINDOW_HITS"}
KNOWN_FUNCS = _FUNCS_1 | _FUNCS_N


def tokenize(s: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(s):
        m = _TOK.match(s, i)
        if not m:
            raise ExprError(f"bad char {s[i]!r} in expression")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    return out


class ExprParser:
    """Pratt parser with SQL-ish precedence: OR < AND < NOT < cmp < add < mul."""

    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, text):
        k, v = self.next()
        if v != text:
            raise ExprError(f"expected {text!r}, got {v!r}")

    def parse(self) -> tuple:
        e = self.parse_or()
        if self.i != len(self.toks):
            raise ExprError(f"unexpected {self.peek()[1]!r}")
        return e

    def parse_or(self):
        left = self.parse_and()
        while self.peek() == ("name", "OR") or (
                self.peek()[0] == "name" and self.peek()[1].upper() == "OR"):
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.peek()[0] == "name" and self.peek()[1].upper() == "AND":
            self.next()
            left = ("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.peek()[0] == "name" and self.peek()[1].upper() == "NOT":
            self.next()
            return ("not", self.parse_not())
        return self.parse_cmp()

    _CMP = {"=": "cmp_eq", "==": "cmp_eq", "<>": "cmp_ne", "!=": "cmp_ne",
            "<": "cmp_lt",
            "<=": "cmp_le", ">": "cmp_gt", ">=": "cmp_ge"}

    def parse_cmp(self):
        left = self.parse_add()
        k, v = self.peek()
        if k == "op" and v in self._CMP:
            self.next()
            return (self._CMP[v], left, self.parse_add())
        if k == "name" and v.upper() == "BETWEEN":
            self.next()
            lo = self.parse_add()
            if not (self.peek()[0] == "name" and self.peek()[1].upper() == "AND"):
                raise ExprError("BETWEEN needs AND")
            self.next()
            hi = self.parse_add()
            return ("and", ("cmp_ge", left, lo), ("cmp_le", left, hi))
        return left

    def parse_add(self):
        left = self.parse_mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                left = ("add" if v == "+" else "sub", left, self.parse_mul())
            else:
                return left

    def parse_mul(self):
        left = self.parse_unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.next()
                op = {"*": "mul", "/": "div", "%": "mod"}[v]
                left = (op, left, self.parse_unary())
            else:
                return left

    def parse_unary(self):
        k, v = self.peek()
        if k == "op" and v == "-":
            self.next()
            return ("neg", self.parse_unary())
        if k == "op" and v == "+":
            self.next()
            return self.parse_unary()
        return self.parse_atom()

    def parse_atom(self):
        k, v = self.next()
        if k == "num":
            return ("num", float(v))
        if k == "str":
            return ("str", re.sub(r"\\(.)", r"\1", v[1:-1]))
        if k == "op" and v == "{":
            # {field=weight, ...} map argument (bm25f)
            pairs = []
            while True:
                nk, nv = self.next()
                if nk != "name":
                    raise ExprError("expected field name in {...} map")
                self.expect("=")
                vk, vv = self.next()
                if vk != "num":
                    raise ExprError("expected number in {...} map")
                pairs.append((nv, float(vv)))
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
            self.expect("}")
            return ("fieldmap", tuple(pairs))
        if k == "op" and v == "(":
            e = self.parse_or()
            self.expect(")")
            return e
        if k == "name":
            up = v.upper()
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.parse_or())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.parse_or())
                self.expect(")")
                if up == "WEIGHT":
                    return ("weight",)
                if up not in KNOWN_FUNCS:
                    from ..plugins import get_udf
                    if get_udf(up) is None:
                        raise ExprError(f"unknown function {v}()")
                return ("call", up, tuple(args))
            if up in ("WEIGHT", "@WEIGHT"):
                return ("weight",)
            if v == "@weight":
                return ("weight",)
            if v in ("id", "@id"):
                return ("id",)
            return ("attr", v)
        raise ExprError(f"unexpected token {v!r}")


def parse_expr(text: str) -> tuple:
    return ExprParser(text).parse()


def expr_attrs(tree: tuple) -> set[str]:
    op = tree[0]
    if op == "attr":
        return {tree[1]}
    if op in ("num", "weight", "id"):
        return set()
    if op == "call":
        out: set[str] = set()
        for a in tree[2]:
            out |= expr_attrs(a)
        return out
    out = set()
    for child in tree[1:]:
        if isinstance(child, tuple):
            out |= expr_attrs(child)
    return out


def eval_expr(tree: tuple, attrs: dict, weight=None, doc_ids=None):
    """Evaluate on device: returns a jnp array broadcast over rows [N+1] (or
    a scalar for constant expressions)."""
    op = tree[0]
    if op == "num":
        v = tree[1]
        if float(v).is_integer() and abs(v) < 2**31:
            return jnp.int32(int(v))
        return jnp.float32(v)
    if op == "attr":
        if tree[1] not in attrs:
            raise ExprError(f"unknown attribute {tree[1]!r} in expression")
        return attrs[tree[1]]
    if op == "weight":
        if weight is None:
            raise ExprError("weight() not available in this context")
        return weight
    if op == "id":
        if doc_ids is None:
            raise ExprError("id not available on device in expressions")
        return doc_ids
    if op == "neg":
        return -eval_expr(tree[1], attrs, weight, doc_ids)
    if op == "not":
        return (eval_expr(tree[1], attrs, weight, doc_ids) == 0).astype(jnp.int32)
    if op in ("add", "sub", "mul", "div", "mod", "and", "or",
              "cmp_eq", "cmp_ne", "cmp_lt", "cmp_le", "cmp_gt", "cmp_ge"):
        a = eval_expr(tree[1], attrs, weight, doc_ids)
        b = eval_expr(tree[2], attrs, weight, doc_ids)
        if op == "add":
            return a + b
        if op == "sub":
            return a - b
        if op == "mul":
            return a * b
        if op == "div":
            # reference '/' is plain float division (Expr_Div_c)
            return a.astype(jnp.float32) / b.astype(jnp.float32)
        if op == "mod":
            return a % b
        if op == "and":
            return ((a != 0) & (b != 0)).astype(jnp.int32)
        if op == "or":
            return ((a != 0) | (b != 0)).astype(jnp.int32)
        table = {"cmp_eq": lambda: a == b, "cmp_ne": lambda: a != b,
                 "cmp_lt": lambda: a < b, "cmp_le": lambda: a <= b,
                 "cmp_gt": lambda: a > b, "cmp_ge": lambda: a >= b}
        return table[op]().astype(jnp.int32)
    if op == "call":
        name, args = tree[1], tree[2]
        vals = [eval_expr(a, attrs, weight, doc_ids) for a in args]
        return _call(name, vals, args)
    raise ExprError(f"bad expr node {op!r}")


def _call(name: str, vals, raw_args):
    if name == "ABS":
        return jnp.abs(vals[0])
    if name == "CEIL":
        return jnp.ceil(vals[0].astype(jnp.float32)).astype(jnp.int32)
    if name == "FLOOR":
        return jnp.floor(vals[0].astype(jnp.float32)).astype(jnp.int32)
    if name in ("SIN", "COS", "EXP", "SQRT"):
        f = {"SIN": jnp.sin, "COS": jnp.cos, "EXP": jnp.exp,
             "SQRT": jnp.sqrt}[name]
        return f(vals[0].astype(jnp.float32))
    if name == "LN":
        return jnp.log(vals[0].astype(jnp.float32))
    if name == "LOG2":
        return jnp.log2(vals[0].astype(jnp.float32))
    if name == "LOG10":
        return jnp.log10(vals[0].astype(jnp.float32))
    if name in ("BIGINT", "SINT", "INTEGER", "UINT"):
        return vals[0].astype(jnp.int32)
    if name == "DOUBLE":
        return vals[0].astype(jnp.float32)
    if name == "MIN":
        return jnp.minimum(vals[0], vals[1])
    if name == "MAX":
        return jnp.maximum(vals[0], vals[1])
    if name == "POW":
        return jnp.power(vals[0].astype(jnp.float32),
                         vals[1].astype(jnp.float32))
    if name == "IDIV":
        return (vals[0] // vals[1]).astype(jnp.int32)
    if name == "IF":
        return jnp.where(vals[0] != 0, vals[1], vals[2])
    if name == "IN":
        # IN(expr, v1, v2, ...) -> 1/0  (Expr_In_c)
        acc = None
        for v in vals[1:]:
            hit = vals[0] == v
            acc = hit if acc is None else (acc | hit)
        return acc.astype(jnp.int32)
    if name == "INTERVAL":
        # INTERVAL(expr, p1, .., pN): index of largest point <= expr
        # (sphinxexpr Expr_Interval_c semantics: returns 0 if expr < p1)
        acc = jnp.zeros_like(vals[0], dtype=jnp.int32)
        for v in vals[1:]:
            acc = acc + (vals[0] >= v).astype(jnp.int32)
        return acc
    if name == "GEODIST":
        # GEODIST(lat1, lon1, lat2, lon2) in meters over WGS84-ish sphere
        # (reference default: haversine on sphere R=6384km? uses
        # EARTH_RADIUS=6384000 adaptive; we use the documented default
        # radius 6371km TODO: match CalcGeodist exactly)
        lat1, lon1, lat2, lon2 = [v.astype(jnp.float32) if hasattr(v, "astype")
                                  else jnp.float32(v) for v in vals]
        r = jnp.float32(6371000.0)
        dlat = (lat2 - lat1) * 0.5
        dlon = (lon2 - lon1) * 0.5
        a = jnp.sin(dlat) ** 2 + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(dlon) ** 2
        return 2 * r * jnp.arcsin(jnp.sqrt(a))
    if name == "BITDOT":
        acc = jnp.zeros_like(vals[0], dtype=jnp.float32)
        for i, v in enumerate(vals[1:]):
            acc = acc + ((vals[0] >> i) & 1) * v
        return acc
    if name == "MADD":
        return vals[0] * vals[1] + vals[2]
    if name == "MUL3":
        return vals[0] * vals[1] * vals[2]
    raise ExprError(f"unimplemented function {name}()")


def eval_expr_host(tree: tuple, row: dict, weight: int = 0, docid: int = 0):
    """Host-side scalar evaluation over one result row (the reference's
    final-stage calc split, sphinx.cpp:15905 — presentation expressions run
    on the final top-k only)."""
    op = tree[0]
    if op == "str":
        return tree[1]
    if op == "num":
        v = tree[1]
        return int(v) if float(v).is_integer() else v
    if op == "attr":
        if tree[1] not in row:
            name = tree[1]
            if "." in name:
                # JSON path access (sphinxjson.cpp sphJsonFindByKey analog)
                base, _, path = name.partition(".")
                if base in row:
                    import json as _json
                    obj = row[base]
                    if isinstance(obj, str):
                        try:
                            obj = _json.loads(obj) if obj.strip() else None
                        except ValueError:
                            obj = None
                    from .planner import json_path_get
                    return json_path_get(obj, path)
            raise ExprError(f"unknown attribute {tree[1]!r}")
        return row[tree[1]]
    if op == "weight":
        return weight
    if op == "id":
        return docid
    if op == "neg":
        return -eval_expr_host(tree[1], row, weight, docid)
    if op == "not":
        return int(eval_expr_host(tree[1], row, weight, docid) == 0)
    if op in ("add", "sub", "mul", "div", "mod", "and", "or",
              "cmp_eq", "cmp_ne", "cmp_lt", "cmp_le", "cmp_gt", "cmp_ge"):
        a = eval_expr_host(tree[1], row, weight, docid)
        b = eval_expr_host(tree[2], row, weight, docid)
        if op == "add":
            return a + b
        if op == "sub":
            return a - b
        if op == "mul":
            return a * b
        if op == "div":
            if b == 0:
                return (float("inf") if a > 0 else
                        float("-inf") if a < 0 else float("nan"))
            return float(a) / float(b)
        if op == "mod":
            return a % b
        if op == "and":
            return int(bool(a) and bool(b))
        if op == "or":
            return int(bool(a) or bool(b))
        import operator as _o
        t = {"cmp_eq": _o.eq, "cmp_ne": _o.ne, "cmp_lt": _o.lt,
             "cmp_le": _o.le, "cmp_gt": _o.gt, "cmp_ge": _o.ge}
        return int(t[op](a, b))
    if op == "call":
        name, args = tree[1], tree[2]
        vals = [eval_expr_host(a, row, weight, docid) for a in args]
        return _call_host(name, vals)
    raise ExprError(f"bad expr node {op!r}")


def _call_host(name: str, vals):
    if name == "ABS":
        return abs(vals[0])
    if name == "CEIL":
        return int(math.ceil(vals[0]))
    if name == "FLOOR":
        return int(math.floor(vals[0]))
    if name in ("SIN", "COS", "EXP", "SQRT"):
        return {"SIN": math.sin, "COS": math.cos, "EXP": math.exp,
                "SQRT": math.sqrt}[name](vals[0])
    if name == "LN":
        return math.log(vals[0])
    if name == "LOG2":
        return math.log2(vals[0])
    if name == "LOG10":
        return math.log10(vals[0])
    if name in ("BIGINT", "SINT", "INTEGER", "UINT"):
        return int(vals[0])
    if name == "DOUBLE":
        return float(vals[0])
    if name == "MIN":
        return min(vals[0], vals[1])
    if name == "MAX":
        return max(vals[0], vals[1])
    if name == "POW":
        return math.pow(vals[0], vals[1])
    if name == "IDIV":
        return int(vals[0] // vals[1])
    if name == "IF":
        return vals[1] if vals[0] else vals[2]
    if name == "IN":
        return int(vals[0] in vals[1:])
    if name == "INTERVAL":
        return sum(1 for v in vals[1:] if vals[0] >= v)
    if name == "GEODIST":
        lat1, lon1, lat2, lon2 = map(float, vals)
        r = 6371000.0
        dlat = (lat2 - lat1) * 0.5
        dlon = (lon2 - lon1) * 0.5
        a = math.sin(dlat) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin(dlon) ** 2
        return 2 * r * math.asin(math.sqrt(a))
    if name == "MADD":
        return vals[0] * vals[1] + vals[2]
    if name == "MUL3":
        return vals[0] * vals[1] * vals[2]
    from ..plugins import get_udf
    udf = get_udf(name)
    if udf is not None:
        return udf(*vals)
    raise ExprError(f"unimplemented function {name}() on host")


def infer_is_float(tree: tuple, schema) -> bool:
    """Rough result-type inference (float vs int) for sort-key handling."""
    op = tree[0]
    if op == "num":
        return not float(tree[1]).is_integer()
    if op == "attr":
        ad = schema.attr(tree[1])
        return ad is not None and ad.type.value == "float"
    if op in ("weight", "id"):
        return False
    if op == "div":
        return True
    if op == "call":
        if tree[1] in ("DOUBLE", "SIN", "COS", "LN", "LOG2", "LOG10", "EXP",
                       "SQRT", "POW", "GEODIST", "BITDOT"):
            return True
        if tree[1] in ("BIGINT", "SINT", "INTEGER", "UINT", "CEIL", "FLOOR",
                       "IDIV", "IN", "INTERVAL"):
            return False
        return any(infer_is_float(a, schema) for a in tree[2])
    return any(infer_is_float(c, schema) for c in tree[1:]
               if isinstance(c, tuple))
