"""Interpreter for <query_settings> PHP blocks in the reference golden
tests: sequences of sphinxapi $client->Method(...) calls (helpers.inc:2516
eval's them with $client/$query/$index bound). Eight tests drive queries
this way; the interpreter maps client state onto the harness's ApiQuery
attrs and runs them through GoldenEnv.run_api_query."""
from __future__ import annotations

import re

_MATCH_MODES = {
    "SPH_MATCH_ALL": "all", "SPH_MATCH_ANY": "any",
    "SPH_MATCH_PHRASE": "phrase", "SPH_MATCH_BOOLEAN": "boolean",
    "SPH_MATCH_EXTENDED": "extended", "SPH_MATCH_EXTENDED2": "extended2",
    "SPH_MATCH_FULLSCAN": "fullscan",
}
_SORT_MODES = {
    "SPH_SORT_RELEVANCE": "", "SPH_SORT_ATTR_DESC": "attr_desc",
    "SPH_SORT_ATTR_ASC": "attr_asc", "SPH_SORT_EXTENDED": "extended",
    "SPH_SORT_EXPR": "expr", "SPH_SORT_TIME_SEGMENTS": "time_segments",
}
_GROUP_FUNCS = {
    "SPH_GROUPBY_ATTR": "attr", "SPH_GROUPBY_DAY": "day",
    "SPH_GROUPBY_WEEK": "week", "SPH_GROUPBY_MONTH": "month",
    "SPH_GROUPBY_YEAR": "year", "SPH_GROUPBY_ATTRPAIR": "attrpair",
}
_RANKERS = {
    "SPH_RANK_PROXIMITY_BM25": "proximity_bm25", "SPH_RANK_BM25": "bm25",
    "SPH_RANK_NONE": "none", "SPH_RANK_WORDCOUNT": "wordcount",
    "SPH_RANK_PROXIMITY": "proximity", "SPH_RANK_MATCHANY": "matchany",
    "SPH_RANK_FIELDMASK": "fieldmask", "SPH_RANK_SPH04": "sph04",
    "SPH_RANK_EXPR": "expr",
}

_STMT = re.compile(
    r"\$client\s*->\s*(\w+)\s*\((.*?)\)\s*;"
    r"|\$(\w+)\s*=\s*(.+?);",
    re.S)


def _parse_args(text: str, varenv: dict) -> list:
    """Split a PHP arg list: strings, numbers, vars, constants, array()."""
    args: list = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n,":
            i += 1
            continue
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and text[j] != c:
                if text[j] == "\\":
                    j += 1
                buf.append(text[j])
                j += 1
            s = "".join(buf)
            if c == '"':
                s = re.sub(r"\$(\w+)",
                           lambda m: str(varenv.get(m.group(1), "")), s)
            args.append(s)
            i = j + 1
            continue
        m = re.match(r"array\s*\(", text[i:])
        if m:
            depth = 1
            j = i + m.end()
            while j < n and depth:
                depth += text[j] == "("
                depth -= text[j] == ")"
                j += 1
            inner = text[i + m.end():j - 1]
            args.append(_parse_args(inner, varenv))
            i = j
            continue
        m = re.match(r"-?\d+\.\d+|-?\d+", text[i:])
        if m:
            v = m.group()
            args.append(float(v) if "." in v else int(v))
            i += m.end()
            continue
        m = re.match(r"\$(\w+)", text[i:])
        if m:
            args.append(varenv.get(m.group(1), ""))
            i += m.end()
            continue
        m = re.match(r"\w+", text[i:])
        if m:
            name = m.group()
            if name in ("true", "TRUE", "True"):
                args.append(True)
            elif name in ("false", "FALSE", "False"):
                args.append(False)
            else:
                args.append(name)   # SPH_* constant / bareword
            i += m.end()
            continue
        i += 1
    return args


class _Client:
    """sphinxapi client state mirrored onto ApiQuery attrs."""

    def __init__(self):
        self.reset_all()
        self.batch: list[dict] = []

    def reset_all(self):
        self.mode = ""
        self.ranker = ""
        self.sortmode = ""
        self.sortby = ""
        self.filters: list[dict] = []
        self.geoanchor = None
        self.group = None         # (attr, func, sort)
        self.group_distinct = ""
        self.select = ""
        self.limits = None        # (offset, limit, max_matches, cutoff)
        self.resarray = False

    def snapshot(self, query: str, index: str) -> dict:
        attrs: dict = {"index": index or "*"}
        if self.mode:
            attrs["mode"] = self.mode
        if self.ranker:
            attrs["ranker"] = self.ranker
        if self.sortmode:
            attrs["sortmode"] = self.sortmode
            attrs["sortby"] = self.sortby
        if self.group:
            attrs["groupattr"] = self.group[0]
            attrs["groupfunc"] = self.group[1]
            if self.group[2]:
                attrs["groupsort"] = self.group[2]
        if self.group_distinct:
            attrs["groupdistinct"] = self.group_distinct
        if self.select:
            attrs["select"] = self.select
        if self.limits:
            attrs["limits_full"] = self.limits
        if self.resarray:
            attrs["resarray"] = "1"
        if self.geoanchor:
            attrs["geoanchor"] = self.geoanchor
        if self.filters:
            attrs["filters_list"] = list(self.filters)
        return {"query": query, "attrs": attrs}


def run_query_settings(env, block: str, qtext: str) -> list[dict]:
    """Execute a query_settings block for one <query> element; returns
    the shaped API results in execution order."""
    from .testcase import ApiQuery

    cl = _Client()
    varenv = {"query": qtext, "index": "*", "q": qtext, "i": "*"}
    shaped: list[dict] = []

    def run_one(spec: dict) -> None:
        q = ApiQuery(spec["query"], spec["attrs"])
        shaped.append(env.run_api_query(q))

    # strip // comments
    src = re.sub(r"//[^\n]*", "", block)
    for m in _STMT.finditer(src):
        if m.group(1):
            name = m.group(1)
            args = _parse_args(m.group(2), varenv)
            _dispatch(cl, name, args, run_one)
        else:
            var, rhs = m.group(3), m.group(4).strip()
            if re.match(r"\$client\s*->\s*(Query|RunQueries)\b", rhs):
                cm = re.match(r"\$client\s*->\s*(\w+)\s*\((.*)\)\s*$",
                              rhs, re.S)
                if cm:
                    _dispatch(cl, cm.group(1),
                              _parse_args(cm.group(2), varenv), run_one)
                continue
            val = _parse_args(rhs, varenv)
            varenv[var] = val[0] if val else ""
    return shaped


def _dispatch(cl: _Client, name: str, args: list, run_one) -> None:
    lname = name.lower()
    if lname == "setmatchmode":
        cl.mode = _MATCH_MODES.get(str(args[0]), "")
    elif lname == "setrankingmode":
        cl.ranker = _RANKERS.get(str(args[0]), "")
    elif lname == "setsortmode":
        cl.sortmode = _SORT_MODES.get(str(args[0]), "")
        cl.sortby = str(args[1]) if len(args) > 1 else ""
    elif lname == "setgeoanchor":
        cl.geoanchor = (str(args[0]), str(args[1]),
                        float(args[2]), float(args[3]))
    elif lname == "setfilter":
        vals = args[1] if isinstance(args[1], list) else [args[1]]
        cl.filters.append({"name": str(args[0]), "kind": "values",
                           "values": [int(v) for v in vals],
                           "exclude": bool(args[2]) if len(args) > 2
                           else False})
    elif lname == "setfilterrange":
        cl.filters.append({"name": str(args[0]), "kind": "range",
                           "lo": int(args[1]), "hi": int(args[2]),
                           "exclude": bool(args[3]) if len(args) > 3
                           else False})
    elif lname == "setfilterfloatrange":
        cl.filters.append({"name": str(args[0]), "kind": "range_f",
                           "lo": float(args[1]), "hi": float(args[2]),
                           "exclude": bool(args[3]) if len(args) > 3
                           else False})
    elif lname == "setgroupby":
        cl.group = (str(args[0]),
                    _GROUP_FUNCS.get(str(args[1]), "attr"),
                    str(args[2]) if len(args) > 2 else "")
    elif lname == "setgroupdistinct":
        cl.group_distinct = str(args[0])
    elif lname == "setselect":
        cl.select = str(args[0])
    elif lname == "setlimits":
        lim = [int(a) for a in args] + [0] * (4 - len(args))
        cl.limits = tuple(lim[:4])
    elif lname == "setarrayresult":
        cl.resarray = bool(args[0]) if args else True
    elif lname == "resetfilters":
        cl.filters = []
        cl.geoanchor = None
    elif lname == "resetgroupby":
        cl.group = None
        cl.group_distinct = ""
    elif lname == "addquery":
        q = str(args[0]) if args else ""
        idx = str(args[1]) if len(args) > 1 else "*"
        cl.batch.append(cl.snapshot(q, idx))
    elif lname == "runqueries":
        batch, cl.batch = cl.batch, []
        for spec in batch:
            run_one(spec)
    elif lname == "query":
        q = str(args[0]) if args else ""
        idx = str(args[1]) if len(args) > 1 else "*"
        run_one(cl.snapshot(q, idx))
    elif lname in ("setserver", "setconnecttimeout", "setmaxquerytime",
                   "resetoverrides", "setretries", "setids",
                   "setidrange", "setoverride", "status"):
        pass   # connection management / no-ops for the harness
    else:
        from .runner import GoldenUnsupported
        raise GoldenUnsupported(f"query_settings call {name}()")
