"""Interpreter + harness bindings for the reference golden suite's
<custom_test> PHP blocks.

The reference harness eval()s each block with `$client` (a SphinxAPI
client), `$ql` (a SphinxQL client returning formatted row strings) and a
by-ref `$results`; whatever lands in `$results` is recorded to model.bin
and compared with PHP `==` after CompareResultSetFixup
(helpers.inc:2590-2631, 2703-2727). This module interprets the PHP subset
those blocks use — assignment, for/foreach/while, user functions, assoc
arrays, method calls, the sphinxapi/mysql_*/harness helper functions —
against a GoldenEnv, then compares `[results]` to the recorded model.

PHP semantics replicated here (by-ref foreach, array auto-index push,
loose ==) follow the reference harness's observable behavior, not any
reference source file.
"""
from __future__ import annotations

import os
import re
import shutil

from .runner import (GoldenEnv, GoldenUnsupported, fixup, loose_eq,
                     mysql_to_sqlite, _unescape_mysql_strings, _split_sql,
                     _render_cell)


class PhpError(ValueError):
    pass


# --------------------------------------------------------------------------
# lexer

_TOKEN = re.compile(r"""
    (?P<dstr>"(?:[^"\\]|\\.)*")
  | (?P<sstr>'(?:[^'\\]|\\.)*')
  | (?P<num>\d+\.\d+|\d+)
  | (?P<var>\$\w+)
  | (?P<name>[A-Za-z_]\w*)
  | (?P<op>\+\+|--|\.=|\+=|-=|\*=|===|!==|==|!=|<=|>=|\|\||&&|->|=>
        |\[\]|[-+*/%.<>=(),;{}\[\]!?:&@])
  | (?P<ws>\s+)
""", re.VERBOSE)


def _strip_comments(src: str) -> str:
    out, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if c in "'\"":
            j = i + 1
            while j < n and src[j] != c:
                j += 2 if src[j] == "\\" else 1
            out.append(src[i:j + 1])
            i = j + 1
        elif src.startswith("//", i) or src[i] == "#":
            j = src.find("\n", i)
            i = n if j < 0 else j
        elif src.startswith("/*", i):
            j = src.find("*/", i)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _lex(src: str):
    out, i = [], 0
    src = _strip_comments(src)
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise PhpError(f"php lex error at {src[i:i+30]!r}")
        i = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    return out


_DQ_ESC = {"n": "\n", "t": "\t", "r": "\r", "v": "\v", "f": "\f",
           "\\": "\\", "$": "$", '"': '"'}


def _unescape(body: str, dquote: bool) -> str:
    if not dquote:
        return body.replace("\\'", "'").replace("\\\\", "\\")

    def sub(m):
        s = m.group(1)
        if s[0] == "x":
            return chr(int(s[1:], 16))
        return _DQ_ESC.get(s, "\\" + s)
    return re.sub(r"\\(x[0-9a-fA-F]{1,2}|.)", sub, body)


def _php_str(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "1" if v else ""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if isinstance(v, dict):
        return "Array"
    return str(v)


def _truthy(v) -> bool:
    if isinstance(v, str):
        return v not in ("", "0")
    if isinstance(v, dict):
        return bool(v)
    return bool(v)


class PA(dict):
    """PHP array: ordered dict with auto-increment integer push keys."""

    def push(self, v):
        nxt = -1
        for k in self:
            if isinstance(k, int) and k > nxt:
                nxt = k
        self[nxt + 1] = v
        return v

    @staticmethod
    def of(items) -> "PA":
        p = PA()
        for it in items:
            p.push(it)
        return p


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class Closure:
    def __init__(self, params, body):
        self.params = params
        self.body = body


_CONSTS = {
    "true": True, "TRUE": True, "True": True,
    "false": False, "FALSE": False, "False": False,
    "null": None, "NULL": None,
    "PHP_INT_MAX": 2**63 - 1, "PHP_EOL": "\n",
    # sphinxapi constants the custom tests use
    "SPH_UPDATE_INT": 0, "SPH_UPDATE_MVA": 1, "SPH_UPDATE_STRING": 2,
    "SPH_ATTR_FLOAT": 5,
}


class Interp:
    def __init__(self, harness: "Harness"):
        self.h = harness
        self.globals: dict = dict(harness.global_vars())
        self.funcs: dict[str, tuple] = {}   # name -> (params, body toks)
        self.scopes = [self.globals]        # top frame IS globals
        self.frame_globals: list[set] = [set()]

    # -- variable access ---------------------------------------------------
    @property
    def vars(self):
        return self.scopes[-1]

    def getvar(self, nm):
        if len(self.scopes) > 1 and nm in self.frame_globals[-1]:
            return self.globals.get(nm)
        return self.vars.get(nm)

    def setvar(self, nm, v):
        if len(self.scopes) > 1 and nm in self.frame_globals[-1]:
            self.globals[nm] = v
        else:
            self.vars[nm] = v

    # -- expression parsing (precedence climbing) ---------------------------
    def expr(self, t, i):
        v, i = self._or(t, i)
        if i < len(t) and t[i] == ("op", "?"):
            a, i = self.expr(t, i + 1)
            if t[i] != ("op", ":"):
                raise PhpError("ternary needs :")
            b, i = self.expr(t, i + 1)
            return (a if _truthy(v) else b), i
        return v, i

    def _bin(self, t, i, ops, nxt):
        v, i = nxt(t, i)
        while i < len(t) and t[i][0] == "op" and t[i][1] in ops:
            op = t[i][1]
            r, i = nxt(t, i + 1)
            v = self._apply(op, v, r)
        return v, i

    def _or(self, t, i):
        return self._bin(t, i, ("||",), self._and)

    def _and(self, t, i):
        return self._bin(t, i, ("&&",), self._cmp)

    def _cmp(self, t, i):
        return self._bin(t, i, ("==", "!=", "===", "!==",
                                "<", ">", "<=", ">="), self._cat)

    def _cat(self, t, i):
        return self._bin(t, i, (".",), self._add)

    def _add(self, t, i):
        return self._bin(t, i, ("+", "-"), self._mul)

    def _mul(self, t, i):
        return self._bin(t, i, ("*", "/", "%"), self._unary)

    @staticmethod
    def _apply(op, a, b):
        if op == ".":
            return _php_str(a) + _php_str(b)
        if op == "||":
            return _truthy(a) or _truthy(b)
        if op == "&&":
            return _truthy(a) and _truthy(b)
        if op == "===":
            return type(a) is type(b) and a == b
        if op == "!==":
            return not (type(a) is type(b) and a == b)
        if op in ("==", "!="):
            eq = loose_eq(a, b) if isinstance(a, (dict, list)) \
                or isinstance(b, (dict, list)) else _loose_scalar_eq(a, b)
            return eq if op == "==" else not eq
        if op == "+" and isinstance(a, dict) and isinstance(b, dict):
            out = PA(b)
            out.update(a)
            return out
        if op in ("<", ">", "<=", ">="):
            an, bn = _num_or(a), _num_or(b)
            if an is not None and bn is not None:
                a, b = an, bn
            else:
                a, b = _php_str(a), _php_str(b)
            return {"<": a < b, ">": a > b,
                    "<=": a <= b, ">=": a >= b}[op]
        a = _num_or(a) or 0
        b = _num_or(b) or 0
        r = {"+": a + b, "-": a - b, "*": a * b,
             "/": a / b if b else 0, "%": (int(a) % int(b)) if b else 0}[op]
        if isinstance(a, int) and isinstance(b, int) and op != "/":
            return int(r)
        return r

    def _unary(self, t, i):
        k, v = t[i]
        if k == "op" and v == "-":
            r, i = self._unary(t, i + 1)
            return -(_num_or(r) or 0), i
        if k == "op" and v == "!":
            r, i = self._unary(t, i + 1)
            return not _truthy(r), i
        if k == "op" and v == "@":
            return self._unary(t, i + 1)
        if k == "op" and v == "&":
            return self._unary(t, i + 1)   # &$x in call args: by-value here
        if k == "op" and v == "++" and t[i + 1][0] == "var":
            nm = t[i + 1][1]
            self.setvar(nm, (_num_or(self.getvar(nm)) or 0) + 1)
            return self.getvar(nm), i + 2
        return self._postfix(t, i)

    def _postfix(self, t, i):
        v, i = self._atom(t, i)
        while i < len(t):
            if t[i] == ("op", "["):
                close = self._find_close(t, i, "[", "]")
                key, _ = self.expr(t, i + 1)
                v = self._index(v, key)
                i = close + 1
            elif t[i] == ("op", "(") and isinstance(v, Closure):
                args, i = self._args(t, i + 1)
                v = self._call_closure(v, args)
            elif t[i] == ("op", "->") and i + 1 < len(t) \
                    and t[i + 1][0] == "name":
                meth = t[i + 1][1]
                if i + 2 < len(t) and t[i + 2] == ("op", "("):
                    args, i = self._args(t, i + 3)
                    v = self.h.method(v, meth, args)
                else:
                    v = self.h.prop(v, meth)
                    i += 2
            else:
                break
        return v, i

    @staticmethod
    def _index(v, key):
        if isinstance(v, dict):
            if key in v:
                return v[key]
            ks = str(key)
            for k in v:
                if str(k) == ks:
                    return v[k]
            return None
        if isinstance(v, str):
            try:
                return v[int(key)]
            except (IndexError, ValueError):
                return ""
        if isinstance(v, list):
            try:
                return v[int(key)]
            except (IndexError, ValueError):
                return None
        return None

    def _atom(self, t, i):
        k, v = t[i]
        if k == "num":
            return (float(v) if "." in v else int(v)), i + 1
        if k == "sstr":
            return _unescape(v[1:-1], False), i + 1
        if k == "dstr":
            return self._interp(_unescape(v[1:-1], True)), i + 1
        if k == "var":
            val = self.getvar(v)
            i += 1
            if i < len(t) and t[i] == ("op", "++"):
                self.setvar(v, (_num_or(val) or 0) + 1)
                return val, i + 1
            if i < len(t) and t[i] == ("op", "--"):
                self.setvar(v, (_num_or(val) or 0) - 1)
                return val, i + 1
            return val, i
        if k == "op" and v == "(":
            r, i = self.expr(t, i + 1)
            if t[i] != ("op", ")"):
                raise PhpError("expected )")
            return r, i + 1
        if k == "name":
            if v.lower() == "function" and i + 1 < len(t) \
                    and t[i + 1] == ("op", "("):
                close = self._find_close(t, i + 1, "(", ")")
                params = []
                j = i + 2
                while j < close:
                    if t[j] == ("op", "&"):
                        j += 1
                        params.append((t[j][1], True))
                    elif t[j][0] == "var":
                        params.append((t[j][1], False))
                    j += 1
                bstart = close + 1
                bclose = self._find_close(t, bstart, "{", "}")
                return Closure(params, t[bstart + 1:bclose]), bclose + 1
            if v in _CONSTS:
                return _CONSTS[v], i + 1
            if i + 1 < len(t) and t[i + 1] == ("op", "("):
                if v.lower() == "array":
                    return self._array_lit(t, i + 2)
                if v.lower() == "isset":
                    args, j = self._raw_args(t, i + 2)
                    return self._isset(args), j
                if v in self.funcs:
                    args, j = self._args(t, i + 2)
                    return self._user_call(v, args), j
                return self._builtin_call(v, t, i + 2)
            return v, i + 1        # bareword constant (SPH_*)
        raise PhpError(f"unexpected php token {v!r}")

    def _array_lit(self, t, i):
        p = PA()
        if t[i] == ("op", ")"):
            return p, i + 1
        while True:
            v, i = self.expr(t, i)
            if i < len(t) and t[i] == ("op", "=>"):
                key, v_ = v, None
                v, i = self.expr(t, i + 1)
                p[_arr_key(key)] = v
            else:
                p.push(v)
            if t[i] == ("op", ","):
                i += 1
                if t[i] == ("op", ")"):
                    return p, i + 1
                continue
            if t[i] == ("op", ")"):
                return p, i + 1
            raise PhpError("bad array literal")

    def _args(self, t, i):
        args = []
        if t[i] == ("op", ")"):
            return args, i + 1
        while True:
            v, i = self.expr(t, i)
            args.append(v)
            if t[i] == ("op", ","):
                i += 1
                continue
            if t[i] == ("op", ")"):
                return args, i + 1
            raise PhpError("expected , or ) in call")

    def _raw_args(self, t, i):
        """Arg token slices (for by-ref params / isset)."""
        out, depth, start = [], 0, i
        while True:
            k, v = t[i]
            if (k, v) == ("op", "("):
                depth += 1
            elif (k, v) == ("op", ")"):
                if depth == 0:
                    if i > start:
                        out.append(t[start:i])
                    return out, i + 1
                depth -= 1
            elif (k, v) == ("op", "[",):
                depth += 1
            elif (k, v) == ("op", "]"):
                depth -= 1
            elif (k, v) == ("op", ",") and depth == 0:
                out.append(t[start:i])
                start = i + 1
            i += 1

    def _isset(self, raw_args) -> bool:
        for ra in raw_args:
            try:
                v, _ = self.expr(ra, 0)
            except PhpError:
                return False
            if v is None:
                return False
        return True

    def _call_closure(self, c: "Closure", args):
        return self._frame_call(c.params, c.body, args)

    def _user_call(self, name, args):
        params, body = self.funcs[name]
        return self._frame_call(params, body, args)

    def _frame_call(self, params, body, args):
        frame = {}
        for (pname, _byref), a in zip(params, args):
            frame[pname] = a
        self.scopes.append(frame)
        self.frame_globals.append(set())
        try:
            self.run(body)
            rv = None
        except _Return as r:
            rv = r.value
        finally:
            # write back by-ref params that alias caller vars is skipped:
            # mutable PAs alias naturally; scalar by-ref is handled by the
            # builtin layer for harness helpers
            self.scopes.pop()
            self.frame_globals.pop()
        return rv

    def _builtin_call(self, name, t, i):
        lname = name.lower()
        # by-ref-aware builtins need the raw arg expressions
        if lname in ("exec", "runindexer", "preg_match", "sort", "ksort"):
            raw, j = self._raw_args(t, i)
            return self.h.builtin_ref(self, lname, raw), j
        args, j = self._args(t, i)
        return self.h.builtin(self, lname, args), j

    def _interp(self, s: str) -> str:
        def sub(m):
            nm = "$" + (m.group(1) or m.group(2))
            idx = m.group(3)
            v = self.getvar(nm)
            if idx is not None:
                key = (self.getvar(idx) if idx.startswith("$")
                       else _arr_key(idx))
                v = self._index(v, key)
            return _php_str(v)
        return re.sub(
            r"\$\{(\w+)\}|\$(\w+)(?:\[['\"]?(\$?\w+)['\"]?\])?", sub, s)

    # -- statements ----------------------------------------------------------
    def run(self, t, i=0, end=None):
        end = len(t) if end is None else end
        while i < end:
            i = self.stmt(t, i)
        return i

    def _find_close(self, t, i, o, c):
        depth = 0
        while i < len(t):
            if t[i] == ("op", o):
                depth += 1
            elif t[i] == ("op", c):
                depth -= 1
                if depth == 0:
                    return i
            i += 1
        raise PhpError(f"unbalanced {o}")

    def _stmt_end(self, t, i):
        """Index just past a single statement starting at i."""
        depth = 0
        while i < len(t):
            if t[i][0] == "op" and t[i][1] in ("(", "{", "["):
                depth += 1
            elif t[i][0] == "op" and t[i][1] in (")", "}", "]"):
                depth -= 1
            elif t[i] == ("op", ";") and depth == 0:
                return i + 1
            i += 1
        return i

    def _body(self, t, i):
        """(start, end, after) of a {...} or single-statement body at i."""
        if i < len(t) and t[i] == ("op", "{"):
            close = self._find_close(t, i, "{", "}")
            return i + 1, close, close + 1
        j = self._stmt_end(t, i)
        return i, j, j

    def stmt(self, t, i):
        k, v = t[i]
        if k == "op" and v == ";":
            return i + 1
        if k == "op" and v == "{":
            close = self._find_close(t, i, "{", "}")
            self.run(t, i + 1, close)
            return close + 1
        if k == "name":
            lv = v.lower()
            if lv == "for":
                return self._for(t, i)
            if lv == "foreach":
                return self._foreach(t, i)
            if lv == "while":
                return self._while(t, i)
            if lv == "if":
                return self._if(t, i)
            if lv == "function":
                return self._function(t, i)
            if lv == "global":
                j = i + 1
                while t[j] != ("op", ";"):
                    if t[j][0] == "var":
                        self.frame_globals[-1].add(t[j][1])
                        if len(self.scopes) == 1:
                            pass
                    j += 1
                return j + 1
            if lv == "break":
                raise _Break()
            if lv == "continue":
                raise _Continue()
            if lv == "return":
                j = self._stmt_end(t, i + 1)
                if t[i + 1] == ("op", ";"):
                    raise _Return(None)
                val, _ = self.expr(t[i + 1:j - 1] + [("op", ";")], 0)
                raise _Return(val)
            if lv == "unset":
                raw, j = self._raw_args(t, i + 2)
                for ra in raw:
                    self._unset(ra)
                return self._semi(t, j)
            if lv == "echo" or lv == "print":
                j = self._stmt_end(t, i + 1)
                return j
        if k == "var":
            j = self._lvalue_assign(t, i)
            if j is not None:
                return j
        _, j = self.expr(t, i)
        return self._semi(t, j)

    @staticmethod
    def _semi(t, i):
        if i < len(t) and t[i] == ("op", ";"):
            return i + 1
        return i

    def _lvalue_assign(self, t, i):
        """Handle $v [index-chain] (=|.=|+=|-=|[]=|++|--); None if not an
        assignment statement."""
        nm = t[i][1]
        j = i + 1
        idx_chain = []   # list of (kind, token-slice) for [expr] / []
        while j < len(t):
            if t[j] == ("op", "[]"):
                idx_chain.append(None)
                j += 1
            elif t[j] == ("op", "["):
                close = self._find_close(t, j, "[", "]")
                idx_chain.append(t[j + 1:close])
                j = close + 1
            else:
                break
        if j >= len(t) or t[j][0] != "op" \
                or t[j][1] not in ("=", ".=", "+=", "-=", "*=", "++", "--"):
            return None
        op = t[j][1]
        if op in ("++", "--"):
            cur = self._read_chain(nm, idx_chain)
            nv = (_num_or(cur) or 0) + (1 if op == "++" else -1)
            self._write_chain(nm, idx_chain, nv)
            return self._semi(t, j + 1)
        val, j2 = self.expr(t, j + 1)
        if op != "=":
            cur = self._read_chain(nm, idx_chain)
            if op == ".=":
                val = _php_str(cur) + _php_str(val)
            elif op == "+=":
                val = self._apply("+", cur, val)
            elif op == "-=":
                val = self._apply("-", cur or 0, val)
            else:
                val = self._apply("*", cur or 0, val)
        self._write_chain(nm, idx_chain, val)
        return self._semi(t, j2)

    def _read_chain(self, nm, chain):
        v = self.getvar(nm)
        for c in chain:
            if c is None:
                return None
            key, _ = self.expr(list(c) + [("op", ";")], 0)
            v = self._index(v, key)
        return v

    def _write_chain(self, nm, chain, val):
        if not chain:
            self.setvar(nm, val)
            return
        root = self.getvar(nm)
        if not isinstance(root, dict):
            root = PA()
            self.setvar(nm, root)
        cur = root
        for ci, c in enumerate(chain):
            last = ci == len(chain) - 1
            if c is None:
                if last:
                    cur.push(val)
                    return
                nxt = PA()
                cur.push(nxt)
                cur = nxt
                continue
            key, _ = self.expr(list(c) + [("op", ";")], 0)
            key = _arr_key(key)
            if last:
                if isinstance(cur, dict):
                    # match existing stringified key if present
                    for kk in cur:
                        if str(kk) == str(key):
                            key = kk
                            break
                cur[key] = val
                return
            nxt = self._index(cur, key)
            if not isinstance(nxt, dict):
                nxt = PA()
                cur[key] = nxt
            cur = nxt

    def _unset(self, raw):
        if raw[0][0] != "var":
            return
        nm = raw[0][1]
        chain = []
        j = 1
        while j < len(raw):
            if raw[j] == ("op", "["):
                close = self._find_close(raw, j, "[", "]")
                chain.append(raw[j + 1:close])
                j = close + 1
            else:
                j += 1
        if not chain:
            if len(self.scopes) > 1 and nm in self.frame_globals[-1]:
                self.globals.pop(nm, None)
            else:
                self.vars.pop(nm, None)
            return
        v = self.getvar(nm)
        for c in chain[:-1]:
            key, _ = self.expr(list(c) + [("op", ";")], 0)
            v = self._index(v, key)
        if isinstance(v, dict):
            key, _ = self.expr(list(chain[-1]) + [("op", ";")], 0)
            for kk in list(v):
                if str(kk) == str(_arr_key(key)):
                    del v[kk]
                    return

    def _function(self, t, i):
        name = t[i + 1][1]
        close = self._find_close(t, i + 2, "(", ")")
        params = []
        j = i + 3
        while j < close:
            if t[j] == ("op", "&"):
                j += 1
                params.append((t[j][1], True))
            elif t[j][0] == "var":
                params.append((t[j][1], False))
            j += 1
        bstart = close + 1
        bclose = self._find_close(t, bstart, "{", "}")
        self.funcs[name] = (params, t[bstart + 1:bclose])
        return bclose + 1

    def _loop_body(self, t, s, e):
        try:
            self.run(t, s, e)
        except _Continue:
            pass

    def _for(self, t, i):
        close = self._find_close(t, i + 1, "(", ")")
        head = t[i + 2:close]
        semis = [j for j, x in enumerate(head)
                 if x == ("op", ";") and _depth0(head[:j])]
        if len(semis) != 2:
            raise PhpError("for head needs 2 ';'")
        init = head[:semis[0]]
        cond = head[semis[0] + 1:semis[1]]
        step = head[semis[1] + 1:]
        bs, be, after = self._body(t, close + 1)
        if init:
            self.run(list(init) + [("op", ";")])
        guard = 0
        while True:
            if cond:
                cv, _ = self.expr(list(cond) + [("op", ";")], 0)
                if not _truthy(cv):
                    break
            try:
                self._loop_body(t, bs, be)
            except _Break:
                break
            if step:
                self.run(list(step) + [("op", ";")])
            guard += 1
            if guard > 1_000_000:
                raise PhpError("php loop guard")
        return after

    def _while(self, t, i):
        close = self._find_close(t, i + 1, "(", ")")
        cond = t[i + 2:close]
        bs, be, after = self._body(t, close + 1)
        guard = 0
        while True:
            cv, _ = self.expr(list(cond) + [("op", ";")], 0)
            if not _truthy(cv):
                break
            try:
                self._loop_body(t, bs, be)
            except _Break:
                break
            guard += 1
            if guard > 1_000_000:
                raise PhpError("php loop guard")
        return after

    def _foreach(self, t, i):
        close = self._find_close(t, i + 1, "(", ")")
        head = t[i + 2:close]
        # $arr as [ $k => ] [&] $v
        as_pos = next(j for j, x in enumerate(head)
                      if x == ("name", "as"))
        coll, _ = self.expr(list(head[:as_pos]) + [("op", ";")], 0)
        rest = head[as_pos + 1:]
        kvar = vvar = None
        byref = False
        arrow = [j for j, x in enumerate(rest) if x == ("op", "=>")]
        if arrow:
            kvar = rest[0][1]
            rest = rest[arrow[0] + 1:]
        if rest and rest[0] == ("op", "&"):
            byref = True
            rest = rest[1:]
        vvar = rest[0][1]
        bs, be, after = self._body(t, close + 1)
        items = []
        if isinstance(coll, dict):
            items = list(coll.items())
        elif isinstance(coll, list):
            items = list(enumerate(coll))
        for key, val in items:
            if kvar:
                self.setvar(kvar, key)
            self.setvar(vvar, val)
            try:
                self._loop_body(t, bs, be)
            except _Break:
                break
            if byref and isinstance(coll, dict):
                coll[key] = self.getvar(vvar)
        return after

    def _if(self, t, i):
        close = self._find_close(t, i + 1, "(", ")")
        cv, _ = self.expr(t[i + 2:close] + [("op", ";")], 0)
        bs, be, after = self._body(t, close + 1)
        branches = [(cv, bs, be)]
        while after < len(t) and t[after][0] == "name" \
                and t[after][1].lower() in ("else", "elseif"):
            if t[after][1].lower() == "elseif" or (
                    after + 1 < len(t)
                    and t[after + 1] == ("name", "if")):
                j = after + (1 if t[after][1].lower() == "elseif" else 2)
                cl2 = self._find_close(t, j, "(", ")")
                cv2, _ = self.expr(t[j + 1:cl2] + [("op", ";")], 0)
                bs2, be2, after = self._body(t, cl2 + 1)
                branches.append((cv2, bs2, be2))
            else:
                bs2, be2, after = self._body(t, after + 1)
                branches.append((True, bs2, be2))
                break
        for cond, s, e in branches:
            if _truthy(cond):
                self.run(t, s, e)
                break
        return after


def _depth0(prefix) -> bool:
    d = 0
    for x in prefix:
        if x[0] == "op" and x[1] in ("(", "[", "{"):
            d += 1
        elif x[0] == "op" and x[1] in (")", "]", "}"):
            d -= 1
    return d == 0


def _num_or(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        m = re.match(r"\s*-?\d+\.\d+|\s*-?\d+", v)
        if m:
            s = m.group()
            return float(s) if "." in s else int(s)
        return 0
    return None


def _loose_scalar_eq(a, b):
    na, nb = _num_or(a), _num_or(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if na is not None and nb is not None:
        return na == nb
    return _php_str(a) == _php_str(b)


def _arr_key(k):
    if isinstance(k, bool):
        return int(k)
    if isinstance(k, float) and k.is_integer():
        return int(k)
    if isinstance(k, str):
        try:
            return int(k)
        except ValueError:
            return k
    return k


# ==========================================================================
# harness bindings: $client / $ql / mysql_* / helper functions

from .phpapi import (_MATCH_MODES, _SORT_MODES, _GROUP_FUNCS,  # noqa: E402
                     _RANKERS, _Client)
from .testcase import ApiQuery  # noqa: E402

# sphinxapi BuildExcerpts option name -> SnippetOptions field
_EXC_OPTS = {
    "before_match": "before_match", "after_match": "after_match",
    "chunk_separator": "chunk_separator", "limit": "limit",
    "around": "around", "exact_phrase": "exact_phrase",
    "use_boundaries": "use_boundaries", "weight_order": "weight_order",
    "query_mode": "query_mode", "force_all_words": "force_all_words",
    "limit_passages": "limit_passages", "limit_words": "limit_words",
    "start_passage_id": "start_passage_id", "allow_empty": "allow_empty",
    "passage_boundary": "passage_boundary",
    "html_strip_mode": "html_strip_mode",
}


class ApiClient:
    """PHP sphinxapi client bound to a GoldenEnv: Query/RunQueries results
    are shaped exactly as the x32 PHP client records them (full arrays
    with error/warning/status/fields/attrs/matches/total/total_found/
    time/words)."""

    def __init__(self, h: "Harness"):
        self.h = h
        self.cl = _Client()
        self.last_error = ""
        self.last_warning = ""

    def _shape_full(self, spec: dict) -> "PA":
        env = self.h.env
        q = ApiQuery(spec["query"], spec["attrs"])
        res = env.run_api_query(q)
        out = PA()
        err = res.get("error", "")
        out["error"] = err
        out["warning"] = res.get("warning", "")
        if err:
            out["status"] = 1
            return out
        out["status"] = 3 if res.get("warning") else 0
        # fields come from the first resolved index's schema
        fields = PA()
        try:
            names = env.resolve_indexes(spec["attrs"].get("index", "*"))
            t = env.agents[names[0][0]].catalog.get(names[0][1])
            for f in t.schema.fields:
                fields.push(f)
        except Exception:
            pass
        out["fields"] = fields
        out["attrs"] = _to_pa(res.get("attrs", {}))
        if "matches" in res:
            out["matches"] = _to_pa(res["matches"])
        out["total"] = res.get("total", "0")
        out["total_found"] = res.get("total_found", "0")
        out["time"] = "0.000"
        if res.get("words"):
            out["words"] = _to_pa(res["words"])
        return out

    def method(self, name: str, args: list):
        l = name.lower()
        cl = self.cl
        if l in ("open", "close", "connect"):
            return True
        if l == "disconnect":
            return True
        if l == "getlasterror":
            return self.last_error
        if l == "getlastwarning":
            return self.last_warning
        if l == "setmatchmode":
            cl.mode = _MATCH_MODES.get(str(args[0]), "")
            return None
        if l == "setrankingmode":
            cl.ranker = _RANKERS.get(str(args[0]), "")
            return None
        if l == "setsortmode":
            cl.sortmode = _SORT_MODES.get(str(args[0]), "")
            cl.sortby = str(args[1]) if len(args) > 1 else ""
            return None
        if l == "setfilter":
            vals = (list(args[1].values()) if isinstance(args[1], dict)
                    else args[1] if isinstance(args[1], list)
                    else [args[1]])
            cl.filters.append({"name": str(args[0]), "kind": "values",
                               "values": [int(v) for v in vals],
                               "exclude": bool(_num_or(args[2]))
                               if len(args) > 2 else False})
            return None
        if l == "setfilterrange":
            cl.filters.append({"name": str(args[0]), "kind": "range",
                               "lo": int(args[1]), "hi": int(args[2]),
                               "exclude": bool(_num_or(args[3]))
                               if len(args) > 3 else False})
            return None
        if l == "setfilterfloatrange":
            cl.filters.append({"name": str(args[0]), "kind": "range_f",
                               "lo": float(args[1]), "hi": float(args[2]),
                               "exclude": bool(_num_or(args[3]))
                               if len(args) > 3 else False})
            return None
        if l == "setselect":
            cl.select = str(args[0])
            return None
        if l == "setlimits":
            lim = [int(a) for a in args] + [0] * (4 - len(args))
            cl.limits = tuple(lim[:4])
            return None
        if l == "setgroupby":
            cl.group = (str(args[0]),
                        _GROUP_FUNCS.get(str(args[1]), "attr"),
                        str(args[2]) if len(args) > 2 else "")
            return None
        if l == "resetgroupby":
            cl.group = None
            cl.group_distinct = ""
            return None
        if l == "setarrayresult":
            cl.resarray = bool(args[0]) if args else True
            return None
        if l == "resetfilters":
            cl.filters = []
            cl.geoanchor = None
            return None
        if l == "addquery":
            q = _php_str(args[0]) if args else ""
            idx = _php_str(args[1]) if len(args) > 1 else "*"
            cl.batch.append(cl.snapshot(q, idx or "*"))
            return len(cl.batch) - 1
        if l == "runqueries":
            batch, cl.batch = cl.batch, []
            out = PA()
            for spec in batch:
                out.push(self._shape_full(spec))
            return out
        if l in ("query", "xquery"):
            q = _php_str(args[0]) if args else ""
            idx = _php_str(args[1]) if len(args) > 1 else "*"
            res = self._shape_full(cl.snapshot(q, idx or "*"))
            self.last_error = res.get("error", "")
            self.last_warning = res.get("warning", "")
            if res.get("status") == 1:
                if l == "xquery":
                    return self.last_error
                return False
            if l == "xquery":
                res.pop("time", None)
            return res
        if l == "buildexcerpts":
            return self.h.build_excerpts(args, self)
        if l == "buildkeywords":
            return self.h.build_keywords(args, self)
        if l in ("updateattributes", "xupdateattributes"):
            n = self.h.update_attributes(args, self)
            if l == "xupdateattributes" and n == -1:
                return self.last_error
            return n
        if l == "flushattributes":
            return 1
        if l in ("setserver", "setconnecttimeout", "setmaxquerytime",
                 "resetoverrides", "setretries", "setids", "setidrange",
                 "setoverride", "status", "setfieldweights",
                 "setindexweights"):
            return None
        raise GoldenUnsupported(f"custom_test api method {name}()")


class QlClient:
    """QLClient replica (helpers.inc:1033): Query returns 'ERROR: ...',
    'OK', or 'v | v\\n...\\nN rows'."""

    def __init__(self, h: "Harness", aid: int = 0):
        self.h = h
        self.aid = aid

    def method(self, name: str, args: list):
        l = name.lower()
        if l in ("reconnect", "connect"):
            return True
        if l == "disconnect":
            return True
        if l == "query":
            return self.query(_php_str(args[0]))
        raise GoldenUnsupported(f"custom_test ql method {name}()")

    def query(self, q: str) -> str:
        try:
            results = self.h.env.agents[self.aid].session.execute(q)
        except Exception as e:   # session-internal crash = server error
            return f"ERROR: {e}"
        if not results:
            return "OK"
        r = results[0]
        if r.error:
            return "ERROR: " + r.error
        if not r.columns:
            return "OK"
        out = []
        for row in r.rows:
            out.append(" | ".join(_php_str(_render_cell(v))
                                  for v in row))
        out.append(f"{len(r.rows)} rows")
        return "\n".join(out)


def _to_pa(v):
    if isinstance(v, dict):
        p = PA()
        for k, vv in v.items():
            p[_arr_key(k)] = _to_pa(vv)
        return p
    if isinstance(v, list):
        return PA.of([_to_pa(x) for x in v])
    return v


class Harness:
    """One custom_test run: the interpreter's window onto a GoldenEnv."""

    def __init__(self, env: GoldenEnv, gt, tmpdir: str):
        self.env = env
        self.gt = gt
        self.tmpdir = tmpdir
        self.testdir = os.path.join("/root/reference/test", gt.dirname) \
            if hasattr(gt, "dirname") else tmpdir
        from .runner import open_db
        self.con = open_db(gt)
        self.db_error = ""
        self.db_affected = 0
        self.client = ApiClient(self)
        self.ql = QlClient(self)

    def global_vars(self) -> dict:
        g = PA()
        g["indexer"] = "indexer"
        g["searchd"] = "searchd"
        g["testdir"] = self.testdir + "/"
        g["data_path"] = self.tmpdir
        return {
            "$client": self.client, "$ql": self.ql,
            "$results": False,
            "$g_locals": g,
            "$this_test": self.testdir,
            "$index_data_path": self.tmpdir,
            "$sd_address": "localhost", "$sd_port": 7700,
            "$agents": PA(),
            "$action_retries": 1, "$action_wait_timeout": 0,
            "$g_id64": True,
        }

    # -- object dispatch ---------------------------------------------------
    def method(self, obj, name, args):
        if isinstance(obj, (ApiClient, QlClient)):
            return obj.method(name, args)
        raise GoldenUnsupported(f"method call {name}() on {type(obj)}")

    def prop(self, obj, name):
        raise GoldenUnsupported(f"property read ->{name}")

    # -- API helpers ---------------------------------------------------------
    def build_excerpts(self, args, client: ApiClient):
        from manticoresearch_tpu.exec.snippets import (SnippetOptions,
                                                       build_snippet)
        from manticoresearch_tpu.text.dictionary import Dictionary
        from manticoresearch_tpu.text.tokenizer import Tokenizer
        docs = args[0]
        index = _php_str(args[1])
        words = _php_str(args[2])
        popts = args[3] if len(args) > 3 and isinstance(args[3], dict) \
            else {}
        texts = list(docs.values()) if isinstance(docs, dict) else \
            list(docs) if isinstance(docs, list) else [docs]
        if not texts:
            # the daemon rejects a 0-entry snippet request
            # (searchd.cpp excerpt handler)
            client.last_error = "searchd error: invalid entries count 0"
            return False
        try:
            t = self.env.catalog.get(index)
        except Exception:
            client.last_error = f"unknown local index '{index}' " \
                                f"in search request"
            return False
        opts = SnippetOptions()
        load_files = False
        for k, v in popts.items():
            k = _php_str(k)
            if k == "load_files":
                load_files = _truthy(v)
                continue
            if k == "single_passage":
                if _truthy(v):
                    opts.limit_passages = 1
                continue
            if k == "emit_zones":
                continue
            f = _EXC_OPTS.get(k)
            if f is None:
                continue
            cur = getattr(opts, f)
            if isinstance(cur, bool):
                setattr(opts, f, _truthy(v))
            elif isinstance(cur, int):
                setattr(opts, f, int(v))
            else:
                setattr(opts, f, _php_str(v))
        tok = Tokenizer(t.tok_settings)
        dic = Dictionary(t.dict_settings)
        out = PA()
        for x in texts:
            text = _php_str(x)
            if load_files:
                if not text:
                    client.last_error = ("searchd error: snippet file "
                                         "name is empty")
                    return False
                path = text if os.path.isabs(text) \
                    else os.path.join(self.testdir, text)
                try:
                    with open(path, errors="replace") as f:
                        text = f.read()
                except OSError:
                    client.last_error = (f"searchd error: failed to open "
                                         f"{path}: No such file or "
                                         f"directory")
                    return False
            out.push(build_snippet(text, words, tok, dic, opts))
        return out

    def build_keywords(self, args, client: ApiClient):
        query = _php_str(args[0])
        index = _php_str(args[1])
        hits = _truthy(args[2]) if len(args) > 2 else False
        esc = query.replace("\\", "\\\\").replace("'", "\\'")
        stmt = f"CALL KEYWORDS('{esc}', '{index}'" \
               + (", 1 AS stats" if hits else "") + ")"
        rs = self.env.session.execute(stmt)
        if not rs or rs[0].error:
            client.last_error = rs[0].error if rs else "keywords failed"
            return False
        r = rs[0]
        out = PA()
        cols = {c: i for i, c in enumerate(r.columns)}
        for row in r.rows:
            d = PA()
            d["tokenized"] = row[cols.get("tokenized", 0)]
            d["normalized"] = row[cols.get("normalized", 1)]
            if hits:
                d["docs"] = int(row[cols["docs"]])
                d["hits"] = int(row[cols["hits"]])
            out.push(d)
        return out

    def update_attributes(self, args, client: ApiClient) -> int:
        index = _php_str(args[0])
        attrs = [_php_str(a) for a in
                 (args[1].values() if isinstance(args[1], dict)
                  else args[1])]
        values = args[2]
        is_mva = len(args) > 3 and args[3] in (1, "SPH_UPDATE_MVA")
        total = 0
        for docid, vals in (values.items()
                            if isinstance(values, dict) else []):
            vlist = list(vals.values()) if isinstance(vals, dict) \
                else list(vals)
            sets = []
            for a, v in zip(attrs, vlist):
                if is_mva or isinstance(v, (dict, list)):
                    items = (list(v.values()) if isinstance(v, dict)
                             else list(v))
                    sets.append(f"{a}=({','.join(str(int(x)) for x in items)})")
                elif isinstance(v, float):
                    sets.append(f"{a}={v!r}")
                else:
                    sets.append(f"{a}={int(_num_or(v) or 0)}")
            stmt = f"UPDATE {index} SET {', '.join(sets)} " \
                   f"WHERE id={int(docid)}"
            rs = self.env.session.execute(stmt)
            if not rs:
                continue
            if rs[0].error:
                client.last_error = rs[0].error
                return -1
            total += rs[0].affected
        return total

    # -- reindex (RunIndexer / exec indexer) ---------------------------------
    def env_reindex(self, names=None) -> list[str]:
        """Rebuild plain indexes from the live (possibly mutated) DB."""
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.index.rt import rt_from_packed
        from .runner import read_source
        from .testcase import section_dict, section_pairs
        warnings: list[str] = []
        env = self.env
        for (aid, name), (schema, tok, dic, _docs, o) in \
                list(env._plain_build.items()):
            if aid != 0:
                continue
            if names is not None and name not in names:
                continue
            idx = section_dict(env.sections, "index", name)
            srcnames = ",".join(idx.get("source", [])).split(",")
            docs: list[dict] = []
            ok = True
            for srcname in srcnames:
                src = section_dict(env.sections, "source", srcname.strip())
                styp = (src.get("type") or [""])[-1]
                if styp not in ("mysql", "pgsql", "sqlite"):
                    ok = False
                    break
                src["__pairs__"] = section_pairs(env.sections, "source",
                                                 srcname.strip())
                docs.extend(read_source(src, self.con).docs)
            if not ok:
                continue
            b = IndexBuilder(schema, tok, dic)
            b.add_documents(docs)
            rt = rt_from_packed(name, b.build())
            rt.options = dict(o)
            env.agents[0].catalog.tables[name] = rt
            env._plain_build[(aid, name)] = (schema, tok, dic, docs, o)
        return warnings

    # -- builtins --------------------------------------------------------------
    def builtin_ref(self, it: Interp, name: str, raw: list):
        """Builtins with by-ref out-params: get raw arg token slices."""
        def argval(k):
            v, _ = it.expr(list(raw[k]) + [("op", ";")], 0)
            return v

        def setref(k, v):
            if raw[k] and raw[k][0][0] == "var":
                it.setvar(raw[k][0][1], v)
        if name == "runindexer":
            params = _php_str(argval(1))
            toks = [x for x in params.split() if not x.startswith("--")]
            names = None if "--all" in params else (toks or None)
            self.env_reindex(names)
            setref(0, "")
            return 0
        if name == "exec":
            cmd = _php_str(argval(0))
            if "indexer" in cmd:
                m = re.findall(r"(?:conf\s+|config\.conf['\"]?\s+)(.*)$",
                               cmd)
                rest = (m[0] if m else "").replace("--rotate", "").split()
                names = None if "--all" in cmd else \
                    ([x for x in rest if not x.startswith("-")] or None)
                self.env_reindex(names)
                setref(1, PA())
                if len(raw) > 2:
                    setref(2, 0)
                return None
            raise GoldenUnsupported(f"exec({cmd[:40]!r})")
        if name == "preg_match":
            pat = _php_str(argval(0))
            body, delim = pat[1:], pat[0]
            rx, _, flags = body.rpartition(delim)
            f = re.I if "i" in flags else 0
            m = re.search(rx, _php_str(argval(1)), f)
            if len(raw) > 2 and m:
                setref(2, PA.of([m.group(0)] + list(m.groups())))
            return 1 if m else 0
        if name == "sort":
            v = argval(0)
            if isinstance(v, dict):
                setref(0, PA.of(sorted(v.values(),
                                       key=lambda x: (_num_or(x) is None,
                                                      _num_or(x) or 0,
                                                      _php_str(x)))))
            return True
        if name == "ksort":
            v = argval(0)
            if isinstance(v, dict):
                p = PA()
                for k in sorted(v, key=lambda x: (not isinstance(x, int),
                                                  x if isinstance(x, int)
                                                  else 0, str(x))):
                    p[k] = v[k]
                setref(0, p)
            return True
        raise GoldenUnsupported(f"builtin_ref {name}")

    def builtin(self, it: Interp, name: str, args: list):
        h = self
        if name == "count":
            return len(args[0]) if isinstance(args[0], (dict, list, str)) \
                else (0 if args[0] in (None, False) else 1)
        if name == "is_array":
            return isinstance(args[0], (dict, list))
        if name == "is_string":
            return isinstance(args[0], str)
        if name == "is_int" or name == "is_numeric":
            if name == "is_numeric" and isinstance(args[0], str):
                return bool(re.fullmatch(r"\s*-?\d+(\.\d+)?\s*", args[0]))
            return isinstance(args[0], int) and \
                not isinstance(args[0], bool)
        if name == "array_key_exists":
            k = _arr_key(args[0])
            d = args[1]
            return isinstance(d, dict) and (
                k in d or any(str(kk) == str(k) for kk in d))
        if name == "array_merge":
            out = PA()
            for a in args:
                if not isinstance(a, dict):
                    continue
                for k, v in a.items():
                    if isinstance(k, int):
                        out.push(v)
                    else:
                        out[k] = v
            return out
        if name == "array_push":
            if isinstance(args[0], PA):
                for v in args[1:]:
                    args[0].push(v)
                return len(args[0])
            return 0
        if name == "array_keys":
            return PA.of(list(args[0].keys())) \
                if isinstance(args[0], dict) else PA()
        if name == "array_values":
            return PA.of(list(args[0].values())) \
                if isinstance(args[0], dict) else PA()
        if name == "array_slice":
            if isinstance(args[0], dict):
                vals = list(args[0].values())
                off = int(args[1])
                ln = int(args[2]) if len(args) > 2 and args[2] is not None \
                    else None
                return PA.of(vals[off:off + ln] if ln is not None
                             else vals[off:])
            return PA()
        if name == "in_array":
            return any(loose_eq(args[0], v) for v in
                       (args[1].values() if isinstance(args[1], dict)
                        else args[1] or []))
        if name == "sprintf":
            return _sprintf(args)
        if name in ("join", "implode"):
            sep, arr = (args[0], args[1]) if len(args) > 1 \
                else ("", args[0])
            vals = arr.values() if isinstance(arr, dict) else arr
            return _php_str(sep).join(_php_str(x) for x in vals)
        if name == "explode":
            return PA.of(_php_str(args[1]).split(_php_str(args[0])))
        if name == "substr":
            s = _php_str(args[0])
            st = int(args[1])
            if st < 0:
                st += len(s)
            if len(args) > 2:
                ln = int(args[2])
                return s[st:st + ln] if ln >= 0 else s[st:ln]
            return s[st:]
        if name == "strlen":
            return len(_php_str(args[0]))
        if name == "strstr":
            s, n = _php_str(args[0]), _php_str(args[1])
            p = s.find(n)
            return s[p:] if p >= 0 else False
        if name in ("strpos", "stripos"):
            s, n = _php_str(args[0]), _php_str(args[1])
            if name == "stripos":
                s, n = s.lower(), n.lower()
            p = s.find(n, int(args[2]) if len(args) > 2 else 0)
            return p if p >= 0 else False
        if name == "str_replace":
            return _php_str(args[2]).replace(_php_str(args[0]),
                                             _php_str(args[1]))
        if name == "str_repeat":
            return _php_str(args[0]) * int(args[1])
        if name == "trim":
            return _php_str(args[0]).strip()
        if name == "strtolower":
            return _php_str(args[0]).lower()
        if name == "strtoupper":
            return _php_str(args[0]).upper()
        if name == "preg_replace":
            pat = _php_str(args[0])
            body, delim = pat[1:], pat[0]
            rx, _, flags = body.rpartition(delim)
            f = re.I if "i" in flags else 0
            rep = re.sub(r"\$(\d+)", r"\\\1", _php_str(args[1]))
            return re.sub(rx, rep, _php_str(args[2]), flags=f)
        if name in ("intval", "int"):
            return int(_num_or(args[0]) or 0)
        if name == "floatval":
            return float(_num_or(args[0]) or 0)
        if name == "strval":
            return _php_str(args[0])
        if name in ("min", "max"):
            vals = list(args[0].values()) \
                if len(args) == 1 and isinstance(args[0], dict) else args
            return (min if name == "min" else max)(
                vals, key=lambda x: _num_or(x) or 0)
        if name in ("sleep", "usleep"):
            return None        # in-process engine: nothing to wait for
        if name == "testdir":
            p = _php_str(args[0])
            if not p:
                return h.testdir + "/"
            if p.startswith("/"):
                return p
            return os.path.join(h.testdir, p)
        if name == "file":
            path = h._path(args[0])
            try:
                with open(path, errors="replace") as f:
                    return PA.of([ln for ln in f.read().splitlines(True)])
            except OSError:
                return False
        if name == "file_get_contents":
            try:
                with open(h._path(args[0]), errors="replace") as f:
                    return f.read()
            except OSError:
                return False
        if name == "file_put_contents":
            path = h._path(args[0], write=True)
            with open(path, "w") as f:
                f.write(_php_str(args[1]))
            return len(_php_str(args[1]))
        if name == "file_exists":
            return os.path.exists(h._path(args[0]))
        if name == "unlink":
            try:
                os.unlink(h._path(args[0], write=True))
                return True
            except OSError:
                return False
        if name == "copy":
            try:
                shutil.copy(h._path(args[0]),
                            h._path(args[1], write=True))
                return True
            except OSError:
                return False
        if name == "crc32":
            import zlib
            return zlib.crc32(_php_str(args[0]).encode())
        # mysql_* act on the harness's sqlite stand-in source DB
        if name == "mysql_connect" or name == "mysql_select_db" \
                or name == "mysql_close" or name == "mysql_free_result":
            return True
        if name == "mysql_query":
            return h._mysql_query(_php_str(args[0]))
        if name == "mysql_error":
            return h.db_error
        if name == "mysql_errno":
            return 1064 if h.db_error else 0
        if name == "mysql_affected_rows":
            return h.db_affected
        if name == "mysql_num_rows":
            return len(args[0]) if isinstance(args[0], list) else 0
        if name in ("mysql_fetch_array", "mysql_fetch_assoc",
                    "mysql_fetch_row"):
            rows = args[0]
            if isinstance(rows, list) and rows:
                row = rows.pop(0)
                p = PA()
                if name != "mysql_fetch_assoc":
                    for i2, v in enumerate(row):
                        p[i2] = v
                if name != "mysql_fetch_row":
                    for k, v in zip(row.keys(), tuple(row)):
                        p[k] = v
                return p
            return False
        if name in ("startsearchd", "stopsearchd", "restartdaemon",
                    "killsearchd"):
            from manticoresearch_tpu.utils import uid as _uid
            _uid.reset()
            return 0
        if name == "comparresultsetfixup" or name == "compareresultsetfixup":
            return None
        if name in ("rand", "srand", "mt_rand", "str_shuffle",
                    "create_function", "eval", "curl_init"):
            raise GoldenUnsupported(f"custom_test uses {name}()")
        raise GoldenUnsupported(f"custom_test php function {name}()")

    def _path(self, p, write: bool = False) -> str:
        p = _php_str(p)
        if os.path.isabs(p):
            return p
        return os.path.join(self.tmpdir if write else self.testdir, p)

    def _mysql_query(self, sql: str):
        import sqlite3
        self.db_error = ""
        try:
            stmts = _split_sql(mysql_to_sqlite(sql))
            rows = None
            for one in stmts:
                cur = self.con.execute(_unescape_mysql_strings(one))
                if re.match(r"\s*(SELECT|SHOW|PRAGMA)", one, re.I):
                    rows = cur.fetchall()
                else:
                    self.db_affected = cur.rowcount
            self.con.commit()
            return rows if rows is not None else True
        except sqlite3.Error as e:
            self.db_error = str(e)
            return False


def _sprintf(args) -> str:
    fmt = _php_str(args[0])
    fmt = re.sub(r"%(0?\d*)d", lambda m: "%" + (m.group(1) or "") + "d",
                 fmt)
    out = []
    ai = 1
    i = 0
    vals = []
    for m in re.finditer(r"%[-+0 ']*\d*(?:\.\d+)?[bcdeEfFgGosuxX%]", fmt):
        spec = m.group()
        if spec.endswith("%"):
            continue
        v = args[ai] if ai < len(args) else ""
        ai += 1
        if spec[-1] in "dxXbou":
            v = int(_num_or(v) or 0)
            if spec[-1] == "u":
                v &= 0xFFFFFFFF
        elif spec[-1] in "eEfFgG":
            v = float(_num_or(v) or 0)
        else:
            v = _php_str(v)
        vals.append(v)
    fmt2 = re.sub(r"%([-+0 ']*\d*(?:\.\d+)?)u", r"%\1d", fmt)
    try:
        return fmt2 % tuple(vals)
    except (TypeError, ValueError) as e:
        raise PhpError(f"sprintf: {e}")


# ==========================================================================
# entry point

def run_custom_subtest(gt, subtest: int, model_subtest, tmpdir: str) \
        -> list[str]:
    """Run one variant's <custom_test> block; returns failure strings
    (empty = pass). Comparison follows helpers.inc:2698-2727: the single
    recorded element is the block's final $results value."""
    if isinstance(model_subtest, list) and model_subtest == ["failed"]:
        return []
    from manticoresearch_tpu.utils import uid as _uid
    _uid.reset()
    env = GoldenEnv(gt, subtest, tmpdir)
    h = Harness(env, gt, tmpdir)
    it = Interp(h)
    try:
        it.run(_lex(gt.custom_test))
    except _Return:
        pass
    except PhpError as e:
        raise GoldenUnsupported(f"custom php: {e}")
    except RecursionError:
        raise GoldenUnsupported("custom php: recursion")
    results = it.globals.get("$results", False)
    model = model_subtest[0] if isinstance(model_subtest, list) \
        and model_subtest else model_subtest
    ours = _plainify(results)
    theirs = _plainify(model)
    _fix_sets(ours)
    _fix_sets(theirs)
    if loose_eq(ours, theirs):
        return []
    return [_first_diff(ours, theirs)]


def _plainify(v):
    if isinstance(v, dict):
        return {k: _plainify(x) for k, x in v.items()}
    if isinstance(v, list):
        return {i: _plainify(x) for i, x in enumerate(v)}
    return v


def _fix_sets(v):
    """CompareResultSetFixup on every nested array: trim sphinxql keys."""
    if not isinstance(v, dict):
        return
    if isinstance(v.get("sphinxql"), str):
        v["sphinxql"] = v["sphinxql"].strip()
    for x in v.values():
        _fix_sets(x)


def _first_diff(a, b, path="$results") -> str:
    if isinstance(a, dict) and isinstance(b, dict):
        for k in b:
            ks = [kk for kk in a if str(kk) == str(k)]
            if not ks:
                return f"{path}: missing key {k!r} (ours has {list(a)[:8]})"
            if not loose_eq(a[ks[0]], b[k]):
                return _first_diff(a[ks[0]], b[k], f"{path}[{k!r}]")
        for k in a:
            if not any(str(kk) == str(k) for kk in b):
                return f"{path}: extra key {k!r}"
        return f"{path}: differs"
    ra, rb = repr(a)[:120], repr(b)[:120]
    return f"{path}: ours={ra} model={rb}"
