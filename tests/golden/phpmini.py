"""Mini-interpreter for the reference test suite's <custom_insert> PHP
snippets (test/*/test.xml). The snippets are data generators using a tiny
language subset: variable assignment/concat, for loops, if conditions,
sprintf/join/array push, and mysql_query(INSERT ...). Interpreting that
subset lets the harness materialize the same fixtures the reference's
ubertest.php generates, without PHP."""
from __future__ import annotations

import re


class PhpError(ValueError):
    pass


_TOKEN = re.compile(r"""
    (?P<dstr>"(?:[^"\\]|\\.)*")
  | (?P<sstr>'(?:[^'\\]|\\.)*')
  | (?P<num>\d+\.\d+|\d+)
  | (?P<var>\$\w+)
  | (?P<name>[A-Za-z_]\w*)
  | (?P<op>\+\+|--|\.=|\+=|-=|==|!=|<=|>=|\|\||&&|\[\]|[-+*/%.<>=(),;{}\[\]!])
  | (?P<ws>\s+)
""", re.VERBOSE)


def _lex(src: str):
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise PhpError(f"php lex error at {src[i:i+20]!r}")
        i = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    return out


def _unescape(body: str, dquote: bool) -> str:
    if dquote:
        return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t",
                                           "r": "\r"}.get(m.group(1),
                                                          m.group(1)),
                      body)
    return body.replace("\\'", "'").replace("\\\\", "\\")


def _php_str(v) -> str:
    if isinstance(v, bool):
        return "1" if v else ""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


class _Interp:
    def __init__(self, sink):
        self.vars: dict = {}
        self.sink = sink          # callable(sql_text)

    # --- expressions (precedence: || < && < cmp < . < add < mul < unary)
    def parse_expr(self, toks, i):
        return self._or(toks, i)

    def _bin(self, toks, i, ops, nxt):
        v, i = nxt(toks, i)
        while i < len(toks) and toks[i][0] == "op" and toks[i][1] in ops:
            op = toks[i][1]
            r, i = nxt(toks, i + 1)
            v = self._apply(op, v, r)
        return v, i

    def _or(self, toks, i):
        return self._bin(toks, i, ("||",), self._and)

    def _and(self, toks, i):
        return self._bin(toks, i, ("&&",), self._cmp)

    def _cmp(self, toks, i):
        return self._bin(toks, i, ("==", "!=", "<", ">", "<=", ">="),
                         self._cat)

    def _cat(self, toks, i):
        return self._bin(toks, i, (".",), self._add)

    def _add(self, toks, i):
        return self._bin(toks, i, ("+", "-"), self._mul)

    def _mul(self, toks, i):
        return self._bin(toks, i, ("*", "/", "%"), self._unary)

    @staticmethod
    def _apply(op, a, b):
        if op == ".":
            return _php_str(a) + _php_str(b)
        if op == "||":
            return bool(a) or bool(b)
        if op == "&&":
            return bool(a) and bool(b)
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op == "<":
            return a < b
        if op == ">":
            return a > b
        if op == "<=":
            return a <= b
        if op == ">=":
            return a >= b
        a = float(a) if not isinstance(a, (int, float)) else a
        b = float(b) if not isinstance(b, (int, float)) else b
        r = {"+": a + b, "-": a - b, "*": a * b,
             "/": a / b if b else 0, "%": (int(a) % int(b)) if b else 0}[op]
        if isinstance(a, int) and isinstance(b, int) and op != "/":
            return int(r)
        return r

    def _unary(self, toks, i):
        k, v = toks[i]
        if k == "op" and v == "-":
            r, i = self._unary(toks, i + 1)
            return -r, i
        if k == "op" and v == "!":
            r, i = self._unary(toks, i + 1)
            return not r, i
        if k == "op" and v == "++":
            # pre-increment
            if toks[i + 1][0] != "var":
                raise PhpError("++ needs a variable")
            nm = toks[i + 1][1]
            self.vars[nm] = self.vars.get(nm, 0) + 1
            return self.vars[nm], i + 2
        return self._atom(toks, i)

    def _atom(self, toks, i):
        k, v = toks[i]
        if k == "num":
            return (float(v) if "." in v else int(v)), i + 1
        if k == "sstr":
            return _unescape(v[1:-1], False), i + 1
        if k == "dstr":
            return self._interp(_unescape(v[1:-1], True)), i + 1
        if k == "var":
            val = self.vars.get(v, "")
            i += 1
            if i < len(toks) and toks[i] == ("op", "++"):
                self.vars[v] = (val if isinstance(val, (int, float))
                                else 0) + 1
                return val, i + 1
            return val, i
        if k == "op" and v == "(":
            r, i = self.parse_expr(toks, i + 1)
            if toks[i] != ("op", ")"):
                raise PhpError("expected )")
            return r, i + 1
        if k == "name":
            fn = v.lower()
            if i + 1 < len(toks) and toks[i + 1] == ("op", "("):
                args, i = self._args(toks, i + 2)
                return self._call(fn, args), i
            if fn == "array":
                return [], i + 1
            raise PhpError(f"unknown php name {v!r}")
        raise PhpError(f"unexpected php token {v!r}")

    def _args(self, toks, i):
        args = []
        if toks[i] == ("op", ")"):
            return args, i + 1
        while True:
            v, i = self.parse_expr(toks, i)
            args.append(v)
            if toks[i] == ("op", ","):
                i += 1
                continue
            if toks[i] == ("op", ")"):
                return args, i + 1
            raise PhpError("expected , or ) in call")

    def _call(self, fn, args):
        if fn == "sprintf":
            fmt = re.sub(r"%(0?\d*)d",
                         lambda m: "%" + (m.group(1) or "") + "d",
                         str(args[0]))
            return fmt % tuple(args[1:])
        if fn == "mysql_query":
            self.sink(str(args[0]))
            return True
        if fn == "join" or fn == "implode":
            sep, arr = args[0], args[1]
            return _php_str(sep).join(_php_str(x) for x in arr)
        if fn == "array":
            return list(args)
        if fn == "count":
            return len(args[0])
        if fn == "strlen":
            return len(_php_str(args[0]))
        if fn == "intval":
            return int(float(args[0] or 0))
        if fn == "str_repeat":
            return _php_str(args[0]) * int(args[1])
        if fn == "rand":
            return args[0] if args else 4   # deterministic stand-in
        if fn == "crc32":
            import zlib
            return zlib.crc32(_php_str(args[0]).encode())
        raise PhpError(f"unsupported php function {fn}()")

    def _interp(self, s: str) -> str:
        # "$var" interpolation inside double-quoted strings ({$var} too)
        def sub(m):
            nm = "$" + (m.group(1) or m.group(2))
            return _php_str(self.vars.get(nm, ""))
        return re.sub(r"\$\{(\w+)\}|\$(\w+)", sub, s)

    # --- statements
    def run(self, toks, i=0, end=None):
        end = len(toks) if end is None else end
        while i < end:
            i = self.stmt(toks, i)
        return i

    def _find_close(self, toks, i, open_s, close_s):
        depth = 0
        while i < len(toks):
            if toks[i] == ("op", open_s):
                depth += 1
            elif toks[i] == ("op", close_s):
                depth -= 1
                if depth == 0:
                    return i
            i += 1
        raise PhpError(f"unbalanced {open_s}")

    def stmt(self, toks, i):
        k, v = toks[i]
        if k == "op" and v == ";":
            return i + 1
        if k == "name" and v.lower() == "for":
            return self._for(toks, i)
        if k == "name" and v.lower() == "if":
            return self._if(toks, i)
        if k == "op" and v == "{":
            close = self._find_close(toks, i, "{", "}")
            self.run(toks, i + 1, close)
            return close + 1
        if k == "var":
            nm = v
            nxt = toks[i + 1]
            if nxt == ("op", "[]"):
                if toks[i + 2] != ("op", "="):
                    raise PhpError("expected = after []")
                val, j = self.parse_expr(toks, i + 3)
                self.vars.setdefault(nm, []).append(val)
                return self._semi(toks, j)
            if nxt[0] == "op" and nxt[1] in ("=", ".=", "+=", "-="):
                val, j = self.parse_expr(toks, i + 2)
                if nxt[1] == "=":
                    self.vars[nm] = val
                elif nxt[1] == ".=":
                    self.vars[nm] = _php_str(self.vars.get(nm, "")) \
                        + _php_str(val)
                elif nxt[1] == "+=":
                    self.vars[nm] = self.vars.get(nm, 0) + val
                else:
                    self.vars[nm] = self.vars.get(nm, 0) - val
                return self._semi(toks, j)
            if nxt == ("op", "++"):
                self.vars[nm] = self.vars.get(nm, 0) + 1
                return self._semi(toks, i + 2)
        # bare expression statement (mysql_query(...) etc.)
        _, j = self.parse_expr(toks, i)
        return self._semi(toks, j)

    @staticmethod
    def _semi(toks, i):
        if i < len(toks) and toks[i] == ("op", ";"):
            return i + 1
        return i

    def _for(self, toks, i):
        if toks[i + 1] != ("op", "("):
            raise PhpError("for needs (")
        close = self._find_close(toks, i + 1, "(", ")")
        # split head on ';' at depth 1
        head = toks[i + 2:close]
        semis = [j for j, t in enumerate(head)
                 if t == ("op", ";") and self._depth0(head[:j])]
        if len(semis) != 2:
            raise PhpError("for head needs 2 ';'")
        init, cond, step = (head[:semis[0]],
                            head[semis[0] + 1:semis[1]],
                            head[semis[1] + 1:])
        body_start = close + 1
        if toks[body_start] == ("op", "{"):
            body_end = self._find_close(toks, body_start, "{", "}")
            body = (body_start + 1, body_end)
            after = body_end + 1
        else:
            # single statement: run to its ';'
            j = body_start
            depth = 0
            while j < len(toks):
                if toks[j] == ("op", "("):
                    depth += 1
                elif toks[j] == ("op", ")"):
                    depth -= 1
                elif toks[j] == ("op", ";") and depth == 0:
                    break
                j += 1
            body = (body_start, j + 1)
            after = j + 1
        if init:
            self.run(list(init) + [("op", ";")])
        guard = 0
        while True:
            if cond:
                cv, _ = self.parse_expr(list(cond) + [("op", ";")], 0)
                if not cv:
                    break
            self.run(toks, body[0], body[1])
            if step:
                self.run(list(step) + [("op", ";")])
            guard += 1
            if guard > 2_000_000:
                raise PhpError("php loop guard tripped")
        return after

    @staticmethod
    def _depth0(prefix) -> bool:
        d = 0
        for t in prefix:
            if t == ("op", "("):
                d += 1
            elif t == ("op", ")"):
                d -= 1
        return d == 0

    def _if(self, toks, i):
        close = self._find_close(toks, i + 1, "(", ")")
        cv, _ = self.parse_expr(toks[i + 2:close] + [("op", ";")], 0)
        body_start = close + 1
        if toks[body_start] == ("op", "{"):
            body_end = self._find_close(toks, body_start, "{", "}")
            if cv:
                self.run(toks, body_start + 1, body_end)
            return body_end + 1
        # single statement
        j = body_start
        depth = 0
        while j < len(toks):
            if toks[j] == ("op", "("):
                depth += 1
            elif toks[j] == ("op", ")"):
                depth -= 1
            elif toks[j] == ("op", ";") and depth == 0:
                break
            j += 1
        if cv:
            self.run(toks, body_start, j + 1)
        return j + 1


def run_custom_insert(src: str, sink) -> None:
    """Execute a <custom_insert> PHP snippet; `sink(sql)` receives each
    mysql_query statement's text."""
    interp = _Interp(sink)
    interp.run(_lex(src))
