"""HTTP JSON query DSL -> SearchQuery.

Behavioral model: the reference's Elasticsearch-like JSON API
(sphParseJsonQuery, /root/reference/src/sphinxjsonquery.cpp:615-940,2362):
query clauses match / match_phrase / match_all / query_string / bool
(must/should/must_not/filter) / equals / in / range; top-level limit/size,
offset/from, sort, _source, aggs (terms buckets), max_matches.
"""
from __future__ import annotations

import re
from typing import Any

from ..exec.searcher import SearchQuery
from ..query.planner import AttrFilterDef


class JsonQueryError(ValueError):
    pass


def _escape_ft(text: str) -> str:
    """Escape full-text operator chars in user text (plain match clauses are
    not operator-aware in the JSON DSL)."""
    return re.sub(r'([()|\-!@~"/^$<=*]+)', " ", str(text))


def _match_to_ft(clause: Any, phrase: bool = False) -> str:
    if not isinstance(clause, dict) or len(clause) != 1:
        raise JsonQueryError("match clause must have exactly one field")
    field_name, spec = next(iter(clause.items()))
    if isinstance(spec, dict):
        text = spec.get("query", "")
        op = str(spec.get("operator", "or")).lower()
    else:
        text = spec
        op = "or"
    text = _escape_ft(text)
    words = text.split()
    if phrase:
        body = '"' + " ".join(words) + '"'
    elif op == "and":
        body = " ".join(words)
    else:
        body = " | ".join(words)
    if not words:
        return ""
    if field_name in ("_all", "*", ""):
        return f"({body})" if len(words) > 1 else body
    return f"(@{field_name} {body})"


def _walk_query(q: dict, ft_parts: list[str], filters: list[AttrFilterDef],
                negate_ft: list[str]) -> None:
    for kind, body in q.items():
        if kind == "match":
            ft = _match_to_ft(body)
            if ft:
                ft_parts.append(ft)
        elif kind == "match_phrase":
            ft_parts.append(_match_to_ft(body, phrase=True))
        elif kind == "match_all":
            continue
        elif kind == "query_string":
            ft_parts.append(f"({body})" if isinstance(body, str) else "")
        elif kind == "bool":
            for must in body.get("must", []) or []:
                _walk_query(must, ft_parts, filters, negate_ft)
            for flt in body.get("filter", []) or []:
                _walk_query(flt, ft_parts, filters, negate_ft)
            should = body.get("should", []) or []
            if should:
                sub_ft: list[str] = []
                sub_f: list[AttrFilterDef] = []
                for sh in should:
                    _walk_query(sh, sub_ft, sub_f, negate_ft)
                if sub_f:
                    raise JsonQueryError(
                        "attribute conditions under 'should' are not "
                        "supported yet (OR of filters)")
                if sub_ft:
                    ft_parts.append("(" + " | ".join(sub_ft) + ")")
            for mn in body.get("must_not", []) or []:
                sub_ft2: list[str] = []
                sub_f2: list[AttrFilterDef] = []
                _walk_query(mn, sub_ft2, sub_f2, negate_ft)
                for f in sub_f2:
                    filters.append(AttrFilterDef(
                        f.attr, f.kind, values=f.values, lo=f.lo, hi=f.hi,
                        exclude=not f.exclude, lo_excl=f.lo_excl,
                        hi_excl=f.hi_excl))
                negate_ft.extend(sub_ft2)
        elif kind == "equals":
            for attr, val in body.items():
                filters.append(AttrFilterDef(attr, "values", values=[val]))
        elif kind == "in":
            for attr, vals in body.items():
                filters.append(AttrFilterDef(attr, "values",
                                             values=list(vals)))
        elif kind == "range":
            for attr, spec in body.items():
                is_f = any(isinstance(spec.get(x), float)
                           for x in ("gt", "gte", "lt", "lte"))
                lo = spec.get("gte", spec.get("gt"))
                hi = spec.get("lte", spec.get("lt"))
                filters.append(AttrFilterDef(
                    attr, "range_f" if is_f else "range_i", lo=lo, hi=hi,
                    lo_excl="gt" in spec, hi_excl="lt" in spec))
        else:
            raise JsonQueryError(f"unsupported query clause {kind!r}")


def parse_json_query(body: dict) -> tuple[str, SearchQuery, dict]:
    """Returns (index, SearchQuery, aggs_spec)."""
    index = body.get("index") or body.get("table")
    if not index:
        raise JsonQueryError("missing 'index'")

    ft_parts: list[str] = []
    filters: list[AttrFilterDef] = []
    negate_ft: list[str] = []
    q = body.get("query") or {"match_all": {}}
    _walk_query(q, ft_parts, filters, negate_ft)

    match = " ".join(p for p in ft_parts if p)
    if negate_ft:
        match = (match + " " if match else "") + " ".join(
            f"-{p}" for p in negate_ft if p)

    sort: list[tuple[str, bool]] = []
    for s in body.get("sort", []) or []:
        if isinstance(s, str):
            sort.append((s, True))
        elif isinstance(s, dict):
            for col, spec in s.items():
                order = spec.get("order", "asc") if isinstance(spec, dict) \
                    else spec
                sort.append((col, str(order).lower() != "desc"))
    if not sort:
        sort = [("weight", False), ("id", True)]
    if sort and sort[0][0] == "_score":
        sort[0] = ("weight", sort[0][1])

    limit = int(body.get("limit", body.get("size", 20)))
    offset = int(body.get("offset", body.get("from", 0)))

    src = body.get("_source")
    select = None
    if isinstance(src, list):
        select = [str(c) for c in src]
    elif src is False:
        select = []

    sq = SearchQuery(
        match=match, filters=filters, limit=limit, offset=offset,
        max_matches=int(body.get("max_matches", 1000)),
        sort=sort, select=select,
    )
    aggs = body.get("aggs") or {}
    return str(index), sq, aggs


def render_result(res, aggs_results: dict | None = None,
                  source: list[str] | None = None) -> dict:
    hits = []
    for m in res.matches:
        attrs = m.attrs
        if source is not None:
            attrs = {k: v for k, v in attrs.items() if k in source}
        hits.append({
            "_id": m.docid,
            "_score": m.weight,
            "_source": attrs,
        })
    out = {
        "took": int(res.time_ms),
        "timed_out": False,
        "hits": {
            "total": res.total_found,
            "total_relation": "eq",
            "hits": hits,
        },
    }
    if res.warning:
        out["warning"] = {"reason": res.warning}
    if aggs_results:
        out["aggregations"] = aggs_results
    return out
