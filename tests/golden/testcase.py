"""Loader for the reference's golden test cases (test_NNN/test.xml).

Mirrors the reference harness's SphinxConfig::Load + Dump
(/root/reference/test/helpers.inc:1758-1890, 3734-3800): gathers <dynamic>
variant nodes in document order, renders the sphinx.conf text for a given
variant combination, and extracts queries / DB setup statements.

Variant enumeration order mirrors GenNextCfg (helpers.inc:1475-1496): the
FIRST <dynamic> in document order cycles fastest.
"""
from __future__ import annotations

import itertools
import os
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

TESTROOT = "/root/reference/test"


def _tag(node) -> str:
    return node.tag.lower() if isinstance(node.tag, str) else ""


@dataclass
class ApiQuery:
    query: str
    attrs: dict = field(default_factory=dict)   # mode/ranker/sortmode/...
    type: str = "api"


@dataclass
class QlQuery:
    query: str
    attrs: dict = field(default_factory=dict)
    type: str = "sphinxql"


@dataclass
class GoldenTest:
    dirname: str
    name: str
    config_root: object                  # <config> Element
    dynamics: list                       # <dynamic> Elements, document order
    queries: list                        # ApiQuery | QlQuery, run order
    db_create: list[str] = field(default_factory=list)
    db_insert: list[str] = field(default_factory=list)
    custom_insert: list[str] = field(default_factory=list)
    requires: set = field(default_factory=set)
    num_agents: int = 1
    skip_indexer: bool = False
    has_custom: bool = False
    custom_test: str = ""
    query_attributes: list[str] = field(default_factory=list)
    indexer_runs: list[str] = field(default_factory=list)
    query_settings: str = ""          # <query_settings> PHP block

    @property
    def n_subtests(self) -> int:
        n = 1
        for d in self.dynamics:
            n *= max(1, len([c for c in d if _tag(c) == "variant"]))
        return n

    def counters(self, subtest: int) -> list[int]:
        """Variant counter vector for subtest k; dynamics[0] cycles fastest."""
        out = []
        k = subtest
        for d in self.dynamics:
            n = max(1, len([c for c in d if _tag(c) == "variant"]))
            out.append(k % n)
            k //= n
        return out

    def render_config(self, subtest: int, data_path: str = "/tmp/golden_data",
                      agentid: int = 0) -> str:
        counters = self.counters(subtest)
        idx = {id(d): i for i, d in enumerate(self.dynamics)}
        parts: list[str] = []

        def dump(node):
            t = _tag(node)
            if t == "dynamic":
                variants = [c for c in node if _tag(c) == "variant"]
                if variants:
                    chosen = variants[counters[idx[id(node)]]]
                    dump_children(chosen)
                if node.tail:
                    parts.append(node.tail)
                return
            if t in ("searchd_settings", "sql_settings", "odbc_settings"):
                # engine-irrelevant boilerplate; sections are parsed and the
                # relevant keys consumed by the runner
                parts.append("")
            elif t == "data_path":
                sub = next(iter(node.attrib.values()), None)
                parts.append(data_path if sub is None
                             else os.path.join(data_path, sub))
            elif t in ("test_root", "testdir"):
                parts.append(TESTROOT + "/")
            elif t == "this_test":
                parts.append(os.path.join(TESTROOT, self.dirname))
            elif t in ("my_address", "agent0_address"):
                parts.append("localhost:7700")
            elif t in ("agent_address", "agent1_address"):
                parts.append("localhost:7701")
            elif t == "agent2_address":
                parts.append("localhost:7702")
            elif t == "my_port":
                parts.append("7700")
            elif t == "agent_id":
                parts.append(str(agentid))
            elif t == "static":
                if node.text:
                    parts.append(node.text)
            elif t.startswith("agent") and t[5:].isdigit():
                if int(t[5:]) == agentid:
                    dump_children(node)
                if node.tail:
                    parts.append(node.tail)
                return
            else:
                dump_children(node)
                return
            if node.tail:
                parts.append(node.tail)

        def dump_children(node):
            if node.text:
                parts.append(node.text)
            for child in node:
                dump(child)
            if node.tail:
                parts.append(node.tail)

        dump_children(self.config_root)
        return "".join(parts)


def _gather_dynamics(node, out):
    if _tag(node) == "dynamic":
        out.append(node)
    for child in node:
        _gather_dynamics(child, out)


def _get_first(root, tag):
    for c in root:
        if _tag(c) == tag:
            return c
    return None


def _expand_query_variants(qnode) -> list[str]:
    """GetVariants (helpers.inc:921): <q> text with nested <v>alternatives."""
    groups = []  # list of lists of strings, cartesian-joined
    if qnode.text:
        groups.append([qnode.text])
    for child in qnode:
        vals = [(v.text or "") for v in child]
        if not vals:
            vals = [child.text or ""]
        groups.append(vals)
        if child.tail:
            groups.append([child.tail])
    if not groups:
        return [""]
    return ["".join(p) for p in itertools.product(*groups)]


def _split_sphinxql(text: str) -> list[str]:
    """One <sphinxql> block becomes one query per ';' AT END OF LINE
    (AddQuery preg_split('/;\\n/'), helpers.inc:1723) — statements
    separated by '; ' on the SAME line stay one multi-statement query
    (labeled '/* result N of previous multistatement */' downstream)."""
    # PREG_SPLIT_NO_EMPTY drops only ZERO-LENGTH pieces — a trailing
    # whitespace-only piece (block ending ";\n\n") stays and becomes one
    # empty query in the result stream (golden test_066's trailing row)
    pieces = [p.strip() for p in text.split(";\n") if p != ""]
    # an all-empty block still emits ONE empty query (AddQuery's
    # empty-$query_texts fallback) — <sphinxql system=.../> tags have no
    # text but must keep their position in the result stream
    return pieces or [""]


def load_test(dirname: str, root: str = TESTROOT) -> GoldenTest:
    path = os.path.join(root, dirname, "test.xml")
    with open(path, "rb") as f:
        data = f.read()
    tree = ET.fromstring(data)
    assert _tag(tree) == "test"

    gt = GoldenTest(dirname=dirname, name="", config_root=None,
                    dynamics=[], queries=[])

    name = _get_first(tree, "name")
    gt.name = (name.text or "").strip() if name is not None else dirname
    _ct = _get_first(tree, "custom_test")
    gt.has_custom = _ct is not None
    gt.custom_test = (_ct.text or "") if _ct is not None else ""

    qs = _get_first(tree, "queries")
    if qs is not None:
        for q in qs:
            t = _tag(q)
            if t == "query":
                if q.attrib.get("endpoint"):
                    gt.queries.append(ApiQuery((q.text or "").strip(),
                                               dict(q.attrib), type="http"))
                else:
                    gt.queries.append(ApiQuery((q.text or ""),
                                               dict(q.attrib)))
            elif t == "sphinxql":
                for v in _expand_query_variants(q):
                    for piece in _split_sphinxql(v):
                        gt.queries.append(QlQuery(piece, dict(q.attrib)))
            elif t == "comment":
                gt.queries.append(QlQuery((q.text or "").strip(),
                                          dict(q.attrib), type="comment"))
    else:
        legacy = _get_first(tree, "query")
        if legacy is not None:
            for q in legacy:
                gt.queries.append(ApiQuery(q.text or ""))

    # old-fashioned separate blocks — gathered in DOCUMENT order: the
    # reference harness walks top-level children sequentially and appends
    # every <sphqueries>/<httpqueries> block as it appears
    # (helpers.inc:1745 ExtractQueries), so an <httpqueries> before a
    # <sphqueries> runs first (test_334)
    for blk in tree:
        t0 = _tag(blk)
        if t0 == "sphqueries":
            for q in blk:
                if _tag(q) == "sphinxql":
                    for v in _expand_query_variants(q):
                        for piece in _split_sphinxql(v):
                            gt.queries.append(QlQuery(piece,
                                                      dict(q.attrib)))
        elif t0 == "httpqueries":
            for q in blk:
                if _tag(q) == "query":
                    gt.queries.append(ApiQuery((q.text or "").strip(),
                                               dict(q.attrib),
                                               type="http"))

    gt.config_root = _get_first(tree, "config")
    _gather_dynamics(gt.config_root, gt.dynamics)

    # <metaindex name='META:x'><index>a</index>...</metaindex>: template
    # expansion — a QL/http query mentioning the name emits one copy per
    # listed index (AddQuery str_replace, helpers.inc:1693)
    metas: list[tuple[str, list[str]]] = []
    for mi in tree:
        if _tag(mi) == "metaindex":
            nm = mi.attrib.get("name", "")
            idxs = [(c.text or "").strip() for c in mi
                    if _tag(c) == "index"]
            if nm and idxs:
                metas.append((nm, idxs))
    if metas:
        expanded = []
        for q in gt.queries:
            if q.type not in ("sphinxql", "http") or not any(
                    nm in q.query for nm, _ in metas):
                expanded.append(q)
                continue
            for nm, idxs in metas:
                if nm in q.query:
                    for idx in idxs:
                        q2 = type(q)(q.query.replace(nm, idx),
                                     dict(q.attrs), type=q.type)
                        expanded.append(q2)
                    break
        gt.queries = expanded

    qa = _get_first(tree, "query_attributes")
    if qa is not None:
        gt.query_attributes = [(c.text or "") for c in qa]
    qset = _get_first(tree, "query_settings")
    if qset is not None:
        gt.query_settings = (qset.text or "").strip()

    for c in tree:
        t = _tag(c)
        if t == "db_create":
            gt.db_create.append(c.text or "")
        elif t == "db_insert":
            gt.db_insert.append(c.text or "")
        elif t == "custom_insert":
            gt.custom_insert.append(c.text or "")
        elif t == "num_agents":
            gt.num_agents = int((c.text or "1").strip())
        elif t == "indexer":
            for r in c:
                if _tag(r) == "run":
                    gt.indexer_runs.append((r.text or "").strip())
        elif t in ("skip_indexer", "skip-indexer"):
            gt.skip_indexer = True
        elif t == "requires":
            for r in c:
                gt.requires.add(_tag(r))
    return gt


# ---------------------------------------------------------------------------
# sphinx.conf-style parser (reference sphinxutils.cpp:3468 semantics subset:
# sections `type name [: parent] { key = value ... }`, repeated keys
# accumulate, `\` joins continuation lines, `#` comments outside values)

@dataclass
class ConfSection:
    kind: str                 # source | index | searchd | indexer | common
    name: str
    parent: str | None
    pairs: list  # (key, value) in order


def parse_sphinx_conf(text: str) -> list[ConfSection]:
    # join continuation lines
    text = text.replace("\\\n", " ")
    sections: list[ConfSection] = []
    cur: ConfSection | None = None
    lines = text.split("\n")
    i = 0
    header_re = re.compile(
        r"^\s*(source|index|searchd|indexer|common)\b\s*([\w\-]*)\s*"
        r"(?::\s*([\w\-]+))?\s*(\{)?\s*$")
    while i < len(lines):
        line = lines[i]
        i += 1
        s = line.strip()
        if cur is None:
            if not s or s.startswith("#"):
                continue
            m = header_re.match(s)
            if m:
                cur = ConfSection(m.group(1), m.group(2) or "",
                                  m.group(3), [])
                if not m.group(4):
                    # consume lines until '{'
                    while i < len(lines) and "{" not in lines[i]:
                        i += 1
                    i += 1
            continue
        if s.startswith("}"):
            sections.append(cur)
            cur = None
            continue
        if not s or s.startswith("#"):
            continue
        if "=" in s:
            k, _, v = s.partition("=")
            # '#' starts a comment unless escaped '\#'
            # (sphinxutils.cpp config lexer)
            out = []
            j = 0
            while j < len(v):
                c = v[j]
                if c == "\\" and j + 1 < len(v) and v[j + 1] == "#":
                    out.append("#")
                    j += 2
                    continue
                if c == "#":
                    break
                out.append(c)
                j += 1
            cur.pairs.append((k.strip().lower(), "".join(out).strip()))
    if cur is not None:
        sections.append(cur)
    return sections


def section_pairs(sections: list["ConfSection"], kind: str,
                  name: str) -> list[tuple[str, str]]:
    """Resolved (key, value) pairs in declaration order with `: parent`
    inheritance. Column-layout sources (tsvpipe/csvpipe) need the
    cross-key interleave: *pipe_field / *pipe_attr_* declaration order
    IS the column order (CSphSource_TSV)."""
    by_name = {(s.kind, s.name): s for s in sections}
    chain = []
    key = (kind, name)
    while key in by_name:
        s = by_name[key]
        chain.append(s)
        if not s.parent:
            break
        key = (kind, s.parent)
    out: list[tuple[str, str]] = []
    for s in reversed(chain):
        seen_here = set()
        for k, v in s.pairs:
            if k not in seen_here:
                out = [(k2, v2) for k2, v2 in out if k2 != k]
                seen_here.add(k)
            out.append((k, v))
    return out


def section_dict(sections: list[ConfSection], kind: str, name: str) -> dict:
    """Resolved key->list-of-values with `: parent` inheritance."""
    by_name = {(s.kind, s.name): s for s in sections}
    chain = []
    key = (kind, name)
    while key in by_name:
        s = by_name[key]
        chain.append(s)
        if not s.parent:
            break
        key = (kind, s.parent)
    # a child's first mention of a key replaces the parent's values entirely;
    # repeats within one section accumulate (sql_attr_uint etc.)
    out: dict[str, list[str]] = {}
    for s in reversed(chain):
        seen_here = set()
        for k, v in s.pairs:
            if k not in seen_here:
                out[k] = []
                seen_here.add(k)
            out[k].append(v)
    return out
