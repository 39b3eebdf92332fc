"""Golden-model test runner: builds indexes from a rendered sphinx.conf,
runs the recorded queries through the engine, and shapes results exactly as
the reference harness records them in model.bin.

Mirrors /root/reference/test/ubertest.php + helpers.inc:
- DB emulation: DB_Create/DB_Insert/sql_query run against in-memory sqlite3
  (CSphSource_SQL semantics: first column = docid, attr columns by name,
  remaining columns are full-text fields in order).
- API queries: PHP sphinxapi defaults — limit 20, SPH_MATCH_EXTENDED2,
  SPH_RANK_PROXIMITY_BM25, SPH_SORT_RELEVANCE (sphinxapi.php:485-503);
  legacy modes converted per PrepareQueryEmulation (searchd.cpp:2141-2186).
- SphinxQL queries: driven through the engine Session; rows rendered as
  mysqli associative arrays of strings.
- Comparison: CompareResultSetFixup semantics (helpers.inc:816-893) —
  time/warning/status/fields/resarray/roundoff dropped, floats rounded via
  roundoff, loose scalar equality, arrays compared key-wise (PHP ==).
"""
from __future__ import annotations

import json
import os
import re
import sqlite3
from dataclasses import dataclass, field, replace as dc_replace

from .testcase import (GoldenTest, parse_sphinx_conf, section_dict)

TESTROOT = "/root/reference/test"

SPH_ATTR_INTEGER = 1
SPH_ATTR_TOKENCOUNT = 11   # index_field_lengths <field>_len attrs
SPH_ATTR_TIMESTAMP = 2
SPH_ATTR_BOOL = 4
SPH_ATTR_FLOAT = 5
SPH_ATTR_BIGINT = 6
SPH_ATTR_STRING = 7
SPH_ATTR_MULTI = 0x40000001
SPH_ATTR_MULTI64 = 0x40000002


class GoldenUnsupported(Exception):
    """Raised when a test needs a feature the runner doesn't drive yet."""


# ---------------------------------------------------------------------------
# sqlite emulation of the MySQL test database

_MYSQL_STRIP = [
    (re.compile(r"\bENGINE\s*=\s*\w+", re.I), ""),
    (re.compile(r"\bDEFAULT\s+CHARSET\s*=\s*\w+", re.I), ""),
    (re.compile(r"\bCHARACTER\s+SET\s+'?\w+'?", re.I), ""),
    (re.compile(r"\bCOLLATE\s*=?\s*[\w_]+", re.I), ""),
    (re.compile(r"\bAUTO_INCREMENT\b", re.I), ""),
    (re.compile(r"\bUNSIGNED\b", re.I), ""),
]
_KEY_LINE = re.compile(
    r",\s*(?:PRIMARY\s+)?(?:UNIQUE\s+)?(?:KEY|INDEX)\s*[^,()]*(\([^)]*\))?",
    re.I)


def mysql_to_sqlite(sql: str) -> str:
    for rx, rep in _MYSQL_STRIP:
        sql = rx.sub(rep, sql)
    sql = _KEY_LINE.sub("", sql)
    return sql


_MYSQL_ESC = re.compile(r"\\(.)")


def _unescape_mysql_strings(sql: str) -> str:
    """MySQL backslash escapes inside '...' literals -> sqlite ('' for
    quotes, literal otherwise)."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        out.append(c)
        i += 1
        if c == "'":
            while i < n:
                c = sql[i]
                if c == "\\" and i + 1 < n:
                    nxt = sql[i + 1]
                    if nxt == "'":
                        out.append("''")
                    elif nxt == '"':
                        out.append('"')
                    elif nxt == "\\":
                        out.append("\\")
                    elif nxt == "n":
                        out.append("\n")
                    elif nxt == "t":
                        out.append("\t")
                    elif nxt == "0":
                        # MySQL \0 is a NUL byte; sqlite3 rejects NUL in
                        # SQL text, so stand in a control char the
                        # tokenizer equally treats as a separator
                        out.append("\x1a")
                    elif nxt == "r":
                        out.append("\r")
                    else:
                        out.append(nxt)
                    i += 2
                    continue
                out.append(c)
                i += 1
                if c == "'":
                    if i < n and sql[i] == "'":   # '' stays escaped
                        out.append("'")
                        i += 1
                        continue
                    break
    return "".join(out)


_DIV_RE = re.compile(r"(\b[A-Za-z_]\w*|\d+(?:\.\d+)?)\s*/\s*(\d+(?:\.\d+)?)")


def _mysql_div_rewrite(sql: str) -> str:
    """MySQL integer/decimal division carries div_precision_increment=4
    extra decimal digits (so `idd1/1.73` INDEXES as 0.5780, not
    0.57803468) — sqlite full-precision floats diverge from the golden
    daemon's stored attrs (test_163 u_float). Rewrites arithmetic `a/b`
    (outside string literals) to the MYSQLDIV() UDF."""
    out = []
    for i, seg in enumerate(sql.split("'")):
        # even segments are outside single-quoted literals
        out.append(_DIV_RE.sub(r"MYSQLDIV(\1, \2)", seg) if i % 2 == 0
                   else seg)
    return "'".join(out)


def _mysql_div(a, b):
    """DECIMAL division, scale = scale(dividend) + 4, half-up (MySQL
    div_precision_increment default)."""
    from decimal import ROUND_HALF_UP, Decimal
    if a is None or b is None:
        return None
    try:
        da, db = Decimal(str(a)), Decimal(str(b))
        if db == 0:
            return None
        scale = max(0, -da.as_tuple().exponent) + 4
        return float((da / db).quantize(Decimal(1).scaleb(-scale),
                                        rounding=ROUND_HALF_UP))
    except ArithmeticError:
        return None


def _mysql_ts(s) -> int:
    import calendar
    import time as _time
    if s is None:
        return 0
    s = str(s).strip()
    if s.isdigit():
        return int(s)
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return calendar.timegm(_time.strptime(s, fmt))
        except ValueError:
            continue
    return 0


def open_db(gt: GoldenTest) -> sqlite3.Connection:
    con = sqlite3.connect(":memory:")
    con.row_factory = sqlite3.Row
    import zlib
    import time as _time
    con.create_function("UNIX_TIMESTAMP", 0, lambda: int(_time.time()))
    con.create_function("UNIX_TIMESTAMP", 1, _mysql_ts)
    con.create_function("MYSQLDIV", 2, _mysql_div)
    con.create_function("COMPRESS", 1, lambda s: s)
    con.create_function(
        "UNHEX", 1,
        lambda s: bytes.fromhex(str(s)).decode("utf-8", "surrogateescape"))
    con.create_function("CRC32", 1,
                        lambda s: zlib.crc32(str(s).encode()) & 0xFFFFFFFF)
    con.create_function("CONCAT", -1,
                        lambda *a: "".join("" if x is None else str(x)
                                           for x in a))
    con.create_function("RAND", 0, lambda: 0.5)
    con.create_function("REPEAT", 2, lambda s, k: str(s or "") * int(k))
    for stmt in gt.db_create:
        if re.search(r"\bcreate\s+procedure\b", stmt, re.I):
            # the SQL fixture needs MySQL stored procedures (test_128);
            # the sqlite stand-in can't host them
            raise GoldenUnsupported("mysql stored-procedure source")
        for one in _split_sql(mysql_to_sqlite(stmt)):
            con.execute(one)
    # MySQL AUTO_INCREMENT accepts explicit 0 as "assign next id";
    # sqlite needs NULL — rewrite leading-0 row tuples for those tables
    autoinc = {m.group(1).strip("`").lower()
               for stmt in gt.db_create
               for m in [re.search(r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+"
                                   r"EXISTS\s+)?(`?\w+`?)", stmt, re.I)]
               if m and re.search(r"\bAUTO_INCREMENT\b", stmt, re.I)}

    def exec_insert(one: str) -> None:
        m = re.match(r"\s*(?:INSERT|REPLACE)\s+INTO\s+(`?\w+`?)", one,
                     re.I)
        if m and m.group(1).strip("`").lower() in autoinc \
                and "(" in one and ")" in one \
                and not re.search(r"INTO\s+`?\w+`?\s*\(", one, re.I):
            one = re.sub(r"\(\s*0\s*,", "(NULL,", one)
        con.execute(_unescape_mysql_strings(one))

    for stmt in gt.db_insert:
        for one in _split_sql(stmt):
            if not re.match(r"\s*(INSERT|REPLACE)\b", one, re.I):
                try:
                    con.execute(one)    # SET NAMES and friends
                except sqlite3.Error:
                    pass
                continue
            exec_insert(one)
    for snippet in gt.custom_insert:
        # the reference harness runs these as PHP (ubertest.php); the
        # mini-interpreter covers the generator subset they use
        from .phpmini import PhpError, run_custom_insert
        try:
            run_custom_insert(snippet, exec_insert)
        except PhpError as e:
            raise GoldenUnsupported(f"custom_insert: {e}")
    con.commit()
    return con


def _split_sql(text: str) -> list[str]:
    """Split on top-level semicolons (quote-aware)."""
    out, buf, q = [], [], None
    i = 0
    while i < len(text):
        c = text[i]
        if q:
            buf.append(c)
            if c == "\\" and q == "'" and i + 1 < len(text):
                buf.append(text[i + 1])
                i += 1
            elif c == q:
                q = None
        elif c in "'\"`":
            q = c
            buf.append(c)
        elif c == ";":
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
        else:
            buf.append(c)
        i += 1
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return out


# ---------------------------------------------------------------------------
# schema extraction from a source section

_ATTR_KEYS = {
    "sql_attr_uint": ("UINT", SPH_ATTR_INTEGER),
    "sql_attr_timestamp": ("TIMESTAMP", SPH_ATTR_TIMESTAMP),
    "sql_attr_bool": ("BOOL", SPH_ATTR_BOOL),
    "sql_attr_float": ("FLOAT", SPH_ATTR_FLOAT),
    "sql_attr_bigint": ("BIGINT", SPH_ATTR_BIGINT),
    "sql_attr_string": ("STRING", SPH_ATTR_STRING),
    "sql_attr_json": ("JSON", 0),
}


def rt_attrs(idx: dict):
    """Parse rt_attr_* declarations of an RT/percolate index section into
    (AttrDef list, name -> SPH_ATTR code)."""
    from manticoresearch_tpu.schema import AttrDef, AttrType
    attrs, codes = [], {}
    for key, (tname, code) in [
            ("rt_attr_uint", ("UINT", SPH_ATTR_INTEGER)),
            ("rt_attr_bigint", ("BIGINT", SPH_ATTR_BIGINT)),
            ("rt_attr_float", ("FLOAT", SPH_ATTR_FLOAT)),
            ("rt_attr_timestamp", ("TIMESTAMP", SPH_ATTR_TIMESTAMP)),
            ("rt_attr_bool", ("BOOL", SPH_ATTR_BOOL)),
            ("rt_attr_string", ("STRING", SPH_ATTR_STRING)),
            ("rt_attr_json", ("JSON", 0)),
            ("rt_attr_multi", ("MVA", SPH_ATTR_MULTI)),
            ("rt_attr_multi_64", ("MVA64", SPH_ATTR_MULTI64))]:
        for val in idx.get(key, []):
            name = val.strip().lower()   # schema names fold lowercase
            codes[name] = code
            attrs.append(AttrDef(name, getattr(AttrType, tname)))
    return attrs, codes


@dataclass
class SourceDef:
    fields: list[str] = field(default_factory=list)
    attrs: list = field(default_factory=list)      # AttrDef list
    attr_codes: dict = field(default_factory=dict)  # name -> SPH_ATTR code
    attr_bits: dict = field(default_factory=dict)   # name -> bitcount
    docs: list = field(default_factory=list)        # row dicts
    kill_ids: list = field(default_factory=list)    # sql_query_killlist


def read_source(src: dict, con: sqlite3.Connection) -> SourceDef:
    from manticoresearch_tpu.schema import AttrDef, AttrType

    sd = SourceDef()
    mva_defs = []   # (name, is64, from_what, query)
    # attr declarations keep CONFIG order across keys (DESC shows them
    # in declaration order); __pairs__ carries the interleave
    pairs = src.get("__pairs__")
    decl_order = [(k, v) for k, v in (pairs or [])
                  if k in _ATTR_KEYS or k in ("sql_attr_multi",
                                              "sql_field_string")]
    iter_attrs = (decl_order if pairs else
                  [(k, v) for k in _ATTR_KEYS for v in src.get(k, [])])
    for key, val in iter_attrs:
        if key == "sql_attr_multi":
            m = re.match(r"\s*(uint|bigint|timestamp)\s+(\w+)\s+from\s+"
                         r"(field|query|ranged-query)(?:\s+(\w+))?"
                         r"\s*(?:;(.*))?$", val.strip(), re.I | re.S)
            if not m:
                raise GoldenUnsupported(f"sql_attr_multi syntax: {val!r}")
            typ, name, fromwhat, src_col, query = m.groups()
            name = name.lower()
            is64 = typ.lower() == "bigint"
            mva_defs.append((name, is64, fromwhat.lower(), query,
                             src_col))
            sd.attr_codes[name] = SPH_ATTR_MULTI64 if is64 \
                else SPH_ATTR_MULTI
            sd.attrs.append(AttrDef(name, AttrType.MVA64 if is64
                                    else AttrType.MVA))
            continue
        if key == "sql_field_string":
            name = val.strip().lower()
            sd.attr_codes[name] = SPH_ATTR_STRING
            sd.attrs.append(AttrDef(name, AttrType.STRING))
            continue
        tname, code = _ATTR_KEYS[key]
        if True:
            # schema names are lowercased at build time (reference
            # CSphSchema: attr/field names fold via sphToLower)
            name = val.strip().lower()
            bits = 0
            if ":" in name and key == "sql_attr_uint":
                name, _, b = name.partition(":")
                name, bits = name.strip(), int(b.strip())
            sd.attr_codes[name] = code
            if bits:
                sd.attr_bits[name] = bits
            sd.attrs.append(AttrDef(name, getattr(AttrType, tname)))
    for val in ([] if pairs else src.get("sql_attr_multi", [])):
        # "uint tag from field" | "uint tag from query; SELECT ..."
        m = re.match(r"\s*(uint|bigint|timestamp)\s+(\w+)\s+from\s+"
                     r"(field|query|ranged-query)(?:\s+(\w+))?\s*(?:;(.*))?$",
                     val.strip(), re.I | re.S)
        if not m:
            raise GoldenUnsupported(f"sql_attr_multi syntax: {val!r}")
        typ, name, fromwhat, src_col, query = m.groups()
        name = name.lower()
        is64 = typ.lower() == "bigint"
        mva_defs.append((name, is64, fromwhat.lower(), query, src_col))
        sd.attr_codes[name] = SPH_ATTR_MULTI64 if is64 else SPH_ATTR_MULTI
        sd.attrs.append(AttrDef(name, AttrType.MVA64 if is64
                                else AttrType.MVA))
    joined_defs = []   # (field_name, query, ranged, range_query)
    for val in src.get("sql_joined_field", []):
        # "name from query; SELECT ..." | "name from ranged-query; q; rq"
        m = re.match(r"\s*(\w+)\s+from\s+(query|ranged-query|payload)\s*"
                     r";(.*)$", val.strip(), re.I | re.S)
        if not m:
            raise GoldenUnsupported(f"sql_joined_field syntax: {val!r}")
        jname, jkind, rest = m.group(1).lower(), m.group(2).lower(), \
            m.group(3)
        if jkind == "payload":
            raise GoldenUnsupported("sql_joined_field payload")
        qparts = _split_sql(rest)
        joined_defs.append((jname, qparts[0], jkind == "ranged-query",
                            qparts[1] if len(qparts) > 1 else None))

    field_string = [v.strip().lower()
                    for v in src.get("sql_field_string", [])]
    for name in ([] if pairs else field_string):
        sd.attr_codes[name] = SPH_ATTR_STRING
        sd.attrs.append(AttrDef(name, AttrType.STRING))

    for pre in src.get("sql_query_pre", []):
        try:
            con.execute(pre)
        except sqlite3.Error:
            pass   # SET NAMES etc.

    for kq in src.get("sql_query_killlist", []):
        for row in con.execute(kq):
            sd.kill_ids.append(int(row[0]))

    file_fields = {v.strip().lower()
                   for v in src.get("sql_file_field", [])}
    q = src.get("sql_query", [None])[0]
    if q is None:
        raise GoldenUnsupported("source has no sql_query")
    q = _mysql_div_rewrite(q)
    if "$start" in q or "$end" in q:
        # ranged fetch: sql_query_range yields (min, max); one shot
        # covers the whole range (step iteration is an io detail)
        rq = (src.get("sql_query_range") or [None])[0]
        if not rq:
            raise GoldenUnsupported("ranged sql_query without range")
        lo_hi = list(con.execute(rq))[0]
        q = q.replace("$start", str(int(lo_hi[0])))
        q = q.replace("$end", str(int(lo_hi[1])))
    cur = con.execute(q)
    cols = [d[0].lower() for d in cur.description]
    id_col = cols[0]
    attr_names = set(sd.attr_codes)
    mva_src_cols = {src_col for _, _, fw, _, src_col in mva_defs
                    if fw == "field" and src_col}
    sd.fields = [c for c in cols[1:]
                 if (c not in attr_names and c not in mva_src_cols)
                 or c in field_string]
    for jname, _q, _r, _rq in joined_defs:
        if jname not in sd.fields:
            sd.fields.append(jname)

    joined_text: dict[str, dict[int, list[str]]] = {}
    for jname, jq, jranged, jrq in joined_defs:
        mp_j: dict[int, list[str]] = {}
        if jranged:
            if not jrq:
                raise GoldenUnsupported("ranged joined field w/o range")
            lo_hi = list(con.execute(jrq))[0]
            jq = jq.replace("$start", str(int(lo_hi[0])))
            jq = jq.replace("$end", str(int(lo_hi[1])))
        for jrow in con.execute(jq):
            mp_j.setdefault(int(jrow[0]), []).append(
                "" if jrow[1] is None else str(jrow[1]))
        joined_text[jname] = mp_j

    mva_field_col = {name: (src_col or name)
                     for name, _, fw, _, src_col in mva_defs
                     if fw == "field"}
    mva_from_query: dict[str, dict[int, list[int]]] = {}
    for name, is64, fromwhat, query, _src in mva_defs:
        if fromwhat in ("query", "ranged-query"):
            mp: dict[int, list[int]] = {}
            if query:
                # "main-query; range-query" for ranged MVA fetches: the
                # second statement yields ($start, $end) substituted into
                # the first (sql_attr_multi ranged-query, sphinx.cpp);
                # plain from-query MVAs have a single statement
                stmts_q = _split_sql(query)
                main_q = stmts_q[0]
                if "$start" in main_q and len(stmts_q) > 1:
                    lo_hi = list(con.execute(stmts_q[-1]))[0]
                    main_q = main_q.replace("$start", str(int(lo_hi[0])))
                    main_q = main_q.replace("$end", str(int(lo_hi[1])))
                for row in con.execute(main_q):
                    mp.setdefault(int(row[0]), []).append(int(row[1]))
            mva_from_query[name] = mp

    for row in cur:
        d = {k.lower(): v for k, v in dict(row).items()}
        did = int(d[id_col])
        if did < 1:
            # the reference indexer rejects zero/negative docids
            # (sphinx.cpp "document id is out of range")
            continue
        # ids beyond int64 max saturate (test_047: 2^63 clamps to 2^63-1
        # and the row survives, grouping with the existing 2^63-1 doc)
        did = min(did, 2**63 - 1)
        doc = {"id": did}
        for f in sd.fields:
            doc[f] = "" if d.get(f) is None else str(d[f])
            if f in file_fields and doc[f]:
                # sql_file_field: the column holds a file path whose
                # CONTENT is the field text (indexer CWD = test/)
                fp = doc[f]
                if not os.path.isabs(fp):
                    fp = os.path.join(TESTROOT, fp)
                try:
                    with open(fp, encoding="utf-8", errors="replace") as fh:
                        doc[f] = fh.read()
                except OSError:
                    doc[f] = ""
        for a in sd.attrs:
            name = a.name
            code = sd.attr_codes[name]
            if code in (SPH_ATTR_MULTI, SPH_ATTR_MULTI64):
                if name in mva_from_query:
                    doc[name] = mva_from_query[name].get(doc["id"], [])
                else:
                    # field MVAs digit-scan the raw text: any digit run is
                    # a value, other bytes are separators (ParseFieldMVA,
                    # sphinx.cpp — 'mva511' yields [511])
                    raw = str(d.get(mva_field_col.get(name, name)) or "")
                    doc[name] = [int(x) for x in re.findall(r"-?\d+", raw)]
            elif code == SPH_ATTR_FLOAT:
                doc[name] = float(d.get(name) or 0.0)
            elif code == SPH_ATTR_STRING:
                doc[name] = "" if d.get(name) is None else str(d[name])
            elif code == 0:    # JSON
                doc[name] = d.get(name)
            else:
                v = int(d.get(name) or 0)
                bits = sd.attr_bits.get(name)
                if bits:
                    v &= (1 << bits) - 1
                doc[name] = v
        for jname, mp_j in joined_text.items():
            doc[jname] = " ".join(mp_j.get(doc["id"], []))
        sd.docs.append(doc)
    return sd


_XML_ATTR_KEYS = {
    "xmlpipe_attr_uint": ("UINT", SPH_ATTR_INTEGER),
    "xmlpipe_attr_timestamp": ("TIMESTAMP", SPH_ATTR_TIMESTAMP),
    "xmlpipe_attr_bool": ("BOOL", SPH_ATTR_BOOL),
    "xmlpipe_attr_float": ("FLOAT", SPH_ATTR_FLOAT),
    "xmlpipe_attr_bigint": ("BIGINT", SPH_ATTR_BIGINT),
    "xmlpipe_attr_string": ("STRING", SPH_ATTR_STRING),
    "xmlpipe_attr_json": ("JSON", 0),
    "xmlpipe_attr_multi": ("MVA", SPH_ATTR_MULTI),
    "xmlpipe_attr_multi_64": ("MVA64", SPH_ATTR_MULTI64),
}
_XML_TYPE_MAP = {
    "int": ("UINT", SPH_ATTR_INTEGER), "uint": ("UINT", SPH_ATTR_INTEGER),
    "timestamp": ("TIMESTAMP", SPH_ATTR_TIMESTAMP),
    "bool": ("BOOL", SPH_ATTR_BOOL), "float": ("FLOAT", SPH_ATTR_FLOAT),
    "bigint": ("BIGINT", SPH_ATTR_BIGINT),
    "string": ("STRING", SPH_ATTR_STRING), "str2ordinal":
    ("STRING", SPH_ATTR_STRING), "json": ("JSON", 0),
    "multi": ("MVA", SPH_ATTR_MULTI), "multi_64": ("MVA64", SPH_ATTR_MULTI64),
}


def read_xmlpipe_source(src: dict) -> SourceDef:
    """xmlpipe2 source (CSphSource_XMLPipe2, sphinx.cpp:24763): the harness
    supports `cat FILE` commands; schema from xmlpipe_field/xmlpipe_attr_*
    keys plus an embedded <sphinx:schema>."""
    import xml.etree.ElementTree as ET

    from manticoresearch_tpu.schema import AttrDef, AttrType

    cmd = (src.get("xmlpipe_command") or [""])[-1].strip()
    m = re.match(r"^cat\s+(\S+)$", cmd)
    if not m:
        raise GoldenUnsupported(f"xmlpipe_command {cmd!r}")
    path = m.group(1)
    if not os.path.isfile(path):
        raise GoldenUnsupported(f"xmlpipe file missing: {path}")
    with open(path, encoding="utf-8", errors="replace") as f:
        text = f.read()
    # the sphinx: prefix is not a bound XML namespace in the wire format
    text = re.sub(r"<(/?)sphinx:", r"<\1sphinx_", text)

    sd = SourceDef()
    order: list[str] = []          # field order
    defaults: dict[str, str] = {}  # <sphinx:attr default="..">
    for key, (tname, code) in _XML_ATTR_KEYS.items():
        for val in src.get(key, []):
            name = val.strip()
            sd.attr_codes[name] = code
            sd.attrs.append(AttrDef(name, getattr(AttrType, tname)))
    for val in src.get("xmlpipe_field", []):
        order.append(val.strip())
    for val in src.get("xmlpipe_field_string", []):
        name = val.strip()
        order.append(name)
        sd.attr_codes[name] = SPH_ATTR_STRING
        sd.attrs.append(AttrDef(name, AttrType.STRING))

    root = ET.fromstring(text)
    schemas = list(root.iter("sphinx_schema"))
    if schemas and any(len(s2) for s2 in schemas):
        # an embedded <sphinx:schema> REPLACES config-declared
        # fields/attrs ("both embedded and config schema: falling back
        # to embedded", CSphSource_XMLPipe2)
        order = []
        sd.attrs = []
        sd.attr_codes = {}
    for schema in schemas:
        for el in schema:
            if el.tag == "sphinx_field":
                nm = el.get("name", "").strip()
                if nm and nm not in order:
                    order.append(nm)
                # <sphinx:field name=.. attr="string"/>: indexed AND
                # stored as a string attribute
                if el.get("attr", "").strip() == "string" \
                        and nm not in sd.attr_codes:
                    sd.attr_codes[nm] = SPH_ATTR_STRING
                    sd.attrs.append(AttrDef(nm, AttrType.STRING))
            elif el.tag == "sphinx_attr":
                nm = el.get("name", "").strip()
                typ = el.get("type", "int").strip()
                if typ not in _XML_TYPE_MAP:
                    raise GoldenUnsupported(f"xmlpipe attr type {typ}")
                tname, code = _XML_TYPE_MAP[typ]
                if nm and nm not in sd.attr_codes:
                    sd.attr_codes[nm] = code
                    sd.attrs.append(AttrDef(nm, getattr(AttrType, tname)))
                dflt = el.get("default")
                if dflt is not None:
                    defaults[nm] = dflt.strip()
    sd.fields = order

    for doc in root.iter("sphinx_document"):
        d: dict = {"id": int(doc.get("id", 0))}
        for child in doc:
            nm = child.tag
            val = (child.text or "").strip()
            code = sd.attr_codes.get(nm)
            if nm in d and code is None and nm in sd.fields:
                # repeated field elements concatenate (the reference
                # appends each chunk to the field buffer)
                d[nm] = f"{d[nm]} {val}".strip()
                continue
            if nm in d:
                continue   # repeated attr element: first value sticks
            if code in (SPH_ATTR_MULTI, SPH_ATTR_MULTI64):
                d[nm] = [int(x) for x in re.split(r"[,\s]+", val)
                         if x.strip()]
            elif code == SPH_ATTR_FLOAT:
                d[nm] = float(val or 0)
            elif code in (SPH_ATTR_INTEGER, SPH_ATTR_TIMESTAMP,
                          SPH_ATTR_BOOL, SPH_ATTR_BIGINT):
                d[nm] = int(val or 0)
            else:
                d[nm] = val
        for f in sd.fields:
            d.setdefault(f, "")
        for a in sd.attrs:
            if a.name not in d:
                dflt = defaults.get(a.name)
                if a.type.value in ("multi", "multi64"):
                    d[a.name] = ([int(x) for x in
                                  re.findall(r"-?\d+", dflt)]
                                 if dflt else [])
                elif a.type.value in ("uint", "bigint", "bool",
                                      "timestamp"):
                    d[a.name] = int(dflt or 0)
                elif a.type.value == "float":
                    d[a.name] = float(dflt or 0.0)
                else:
                    d[a.name] = dflt or ""
        sd.docs.append(d)
    for kl in root.iter("sphinx_killlist"):
        for el in kl.iter("id"):
            sd.kill_ids.append(int((el.text or "0").strip()))
    return sd


def _csv_rows_ref(text: str, delim: str = ",") -> list[list[str]]:
    """CSV splitting with the reference parser's quoting rules
    (CSphSource_CSV::SplitColumns, sphinx.cpp:26788): a quote only opens
    a quoted run when everything before it in the field is whitespace
    (the whitespace is KEPT); '""' directly after a closing quote
    re-opens and emits a literal '"'; backslash escapes outside quotes;
    newlines inside quotes are literal."""
    rows: list[list[str]] = []
    row: list[str] = []
    field: list[str] = []
    quoted = False
    has_quot = False
    quot_prev = -2
    esc = False
    only_space = True

    def end_field():
        nonlocal field, only_space, quoted, has_quot, quot_prev
        row.append("".join(field))
        field = []
        only_space = True
        quoted = False
        has_quot = False
        quot_prev = -2

    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if not quoted and esc:
            field.append(c)
            esc = False
            i += 1
            continue
        if c == "\\" and not quoted and c != delim:
            esc = True
            i += 1
            continue
        if c == '"':
            if only_space and quot_prev == -2:
                quoted = True
                has_quot = True
            elif quoted:
                quoted = False
            elif has_quot and quot_prev == i - 1:
                quoted = True
                field.append('"')
            else:
                field.append(c)
            quot_prev = i
            i += 1
            continue
        if quoted:
            field.append(c)
            i += 1
            continue
        if c == delim:
            end_field()
            i += 1
            continue
        if c in "\r\n":
            end_field()
            rows.append(row)
            row = []
            while i < n and text[i] in "\r\n":
                i += 1
            continue
        only_space = only_space and c.isspace()
        field.append(c)
        i += 1
    if field or row:
        end_field()
        rows.append(row)
    return rows


def read_tsvpipe_source(src: dict, styp: str) -> SourceDef:
    """tsvpipe/csvpipe sources (CSphSource_TSV/CSV): the N *pipe_field /
    *pipe_attr_* keys declare the column layout in DECLARATION ORDER;
    column 0 is the docid."""
    import csv as _csv
    import io

    from manticoresearch_tpu.schema import AttrDef, AttrType

    pfx = "tsvpipe" if styp == "tsvpipe" else "csvpipe"
    cmd = (src.get(f"{pfx}_command") or [""])[-1].strip()
    m = re.match(r"^cat\s+(\S+)$", cmd)
    if not m or not os.path.isfile(m.group(1)):
        raise GoldenUnsupported(f"{pfx}_command {cmd!r}")
    sd = SourceDef()
    # column layout: declaration order across ALL *pipe_field /
    # *pipe_attr_* keys (CSphSource_TSV); schema names lowercase
    attr_by_key = {k.replace("xmlpipe", pfx): v
                   for k, v in _XML_ATTR_KEYS.items()}
    layout: list[tuple[str, str]] = []   # (name, kind)
    for key, val in src.get("__pairs__", []):
        if key == f"{pfx}_field":
            nm = val.strip().lower()
            layout.append((nm, "field"))
            sd.fields.append(nm)
        elif key in attr_by_key:
            tname, code = attr_by_key[key]
            nm = val.strip().lower()
            if ":" in nm:   # uint bitcount suffix "gid:3"
                nm, _, b = nm.partition(":")
                nm = nm.strip()
                sd.attr_bits[nm] = int(b.strip())
            layout.append((nm, tname))
            sd.attr_codes[nm] = code
            sd.attrs.append(AttrDef(nm, getattr(AttrType, tname)))
    with open(m.group(1), encoding="utf-8-sig", errors="replace") as f:
        text = f.read()
    delim = (src.get(f"{pfx}_delimiter") or [","])[-1] or ","
    rows = (_csv_rows_ref(text, delim[0]) if pfx == "csvpipe"
            else (ln.split("\t") for ln in text.splitlines() if ln))
    for row in rows:
        if not row or not row[0].strip():
            continue
        m0 = re.match(r"\s*[-+]?\d+", row[0])
        if not m0 or int(m0.group()) < 1:
            continue   # bad/zero docid rows are skipped with a warning
        d: dict = {"id": int(m0.group())}
        for (nm, kind), val in zip(layout, row[1:]):
            if kind == "field":
                d[nm] = val
            elif kind in ("MVA", "MVA64"):
                # digit-scan like ParseFieldMVA: digit runs are values,
                # any other byte separates
                d[nm] = [int(x) for x in re.findall(r"-?\d+", val)]
            elif kind == "FLOAT":
                d[nm] = float(val.strip() or 0)
            elif kind in ("STRING", "JSON"):
                d[nm] = val
            else:
                # strtoll semantics: leading integer digits, 0 if none
                m3 = re.match(r"\s*[-+]?\d+", val)
                v = int(m3.group()) if m3 else 0
                bits = sd.attr_bits.get(nm)
                if bits:
                    v &= (1 << bits) - 1
                d[nm] = v
        sd.docs.append(d)
    return sd


# ---------------------------------------------------------------------------
# index settings mapping

def _read_listfile(path_spec: str) -> list[str]:
    words: list[str] = []
    for path in path_spec.split():
        if os.path.isfile(path):
            with open(path, encoding="utf-8", errors="replace") as f:
                words.extend(f.read().split())
    return words


def index_options(idx: dict) -> tuple[dict, dict]:
    """sphinx.conf index keys -> (CREATE TABLE-style options dict,
    query-time defaults dict)."""
    o: dict[str, str] = {}
    qdef: dict = {}
    morph = " ".join(idx.get("morphology", []))
    if re.search(r"lemmatize_(ru|de|uk)", morph) or "icu" in morph:
        # ru/de/uk AOT lemmatizers need .pak dictionaries and ICU needs
        # its segmentation data — neither ships in this environment;
        # lemmatize_en runs on the built-in rule analog
        raise GoldenUnsupported(f"morphology {morph!r} (no dictionaries)")

    def one(key, default=None):
        v = idx.get(key)
        return v[-1] if v else default

    passthrough = [
        "charset_table", "min_word_len", "ngram_chars", "ngram_len",
        "overshort_step", "html_strip", "html_index_attrs",
        "html_remove_elements", "index_sp", "index_zones", "blend_chars",
        "blend_mode", "phrase_boundary", "phrase_boundary_step",
        "bigram_index", "bigram_freq_words", "index_exact_words",
        "min_stemming_len", "morphology", "min_prefix_len",
        "min_infix_len", "regexp_filter", "stored_fields", "dict",
        "columnar_attrs", "prefix_fields", "infix_fields",
    ]
    for k in passthrough:
        v = one(k)
        if v is not None:
            o[k] = v
    if "charset_table" not in o:
        # plain config-file indexes default to SPHINX_DEFAULT_UTF8_TABLE
        # (sphinx.cpp:161,4878) — includes '_' and Cyrillic only; the
        # wide non_cjk default applies to RT/CREATE TABLE mode only
        # (IndexSettingsContainer_c::SetDefaults, indexsettings.cpp:1150)
        o["charset_table"] = ("0..9, A..Z->a..z, _, a..z, "
                              "U+410..U+42F->U+430..U+44F, "
                              "U+430..U+44F, U+401->U+451, U+451")
    # legacy star syntax: enable_star=0 with prefix/infix means every
    # keyword is implicitly expanded; enable_star=1 is the 3.x default
    # (stars explicit). Tests setting enable_star=0 are unsupported.
    if one("enable_star") == "0" and (one("min_prefix_len", "0") != "0" or
                                      one("min_infix_len", "0") != "0"):
        raise GoldenUnsupported("enable_star=0 implicit expansion")
    if one("min_word_len", "1") in ("0",):
        o["min_word_len"] = "1"
    sw = one("stopwords")
    if sw:
        o["stopwords"] = " ".join(_read_listfile(sw))
    wf = one("wordforms")
    if wf:
        pairs = []
        for line in _read_listfile_lines(wf):
            if ">" in line:
                src_w, _, dst = line.partition(">")
                src_w = src_w.strip().lstrip("~=").strip()
                dst = dst.strip()
                if "," in src_w or "," in dst:
                    raise GoldenUnsupported("comma in wordform line")
                if src_w and dst:
                    pairs.append(f"{src_w} > {dst}")
        o["wordforms"] = ",".join(pairs)
    ex = one("exceptions")
    if ex:
        o["exceptions"] = ";".join(_read_listfile_lines(ex))
    if one("expand_keywords", "0") not in ("0", None):
        qdef["expand_keywords"] = True
    if one("global_idf"):
        raise GoldenUnsupported("global_idf file")
    hitless = one("hitless_words")
    if hitless:
        # file paths already rendered absolute by <this_test/>; "all"
        # passes through verbatim
        o["hitless_words"] = hitless
    return o, qdef


def _apply_stored_fields(table, opts: dict):
    sf = str(opts.get("stored_fields", "") or "")
    if sf:
        table.stored_fields = [s.strip()
                               for s in sf.replace(",", " ").split()
                               if s.strip()]


def _read_listfile_lines(path_spec: str) -> list[str]:
    lines: list[str] = []
    for path in path_spec.split():
        if os.path.isfile(path):
            with open(path, encoding="utf-8", errors="replace") as f:
                for ln in f:
                    ln = ln.split("#")[0].strip()
                    if ln:
                        lines.append(ln)
    return lines


# ---------------------------------------------------------------------------
# the environment for one subtest

class _CrossEnvDistributed:
    """A distributed table whose remote parts live in other in-process
    agent envs (the harness stand-in for a multi-searchd distributed
    table, searchd.cpp RunSubset over agents)."""

    data_dir = None

    def __init__(self, name: str, genv, parts, agent_flags=None):
        self.name = name
        self.genv = genv
        self.parts = parts      # [(agent_id, index_name)]
        # which parts came from `agent =` (wire semantics apply even when
        # the address is the SAME daemon — reference always connects)
        self.agent_flags = agent_flags \
            if agent_flags is not None else [a != 0 for a, _ in parts]
        self.options: dict = {}

    def _tables(self):
        return [self.genv.agents[aid].catalog.get(nm)
                for aid, nm in self.parts]

    @property
    def schema(self):
        # result schema = intersection of part schemas (the reference
        # master minimizes the aggregate schema over all part results,
        # MinimizeAggrResult/searchd.cpp)
        tables = self._tables()
        base = tables[0].schema
        if len(tables) > 1:
            common = {a.name for a in base.attrs}
            for t in tables[1:]:
                common &= {a.name for a in t.schema.attrs}
            if common != {a.name for a in base.attrs}:
                from manticoresearch_tpu.schema import Schema
                return Schema(fields=list(base.fields),
                              attrs=[a for a in base.attrs
                                     if a.name in common])
        return base

    def flush(self):
        pass

    def search(self, q):
        from dataclasses import replace as _dc
        from manticoresearch_tpu.exec.multi import (merge_part_results,
                                                    search_grouped_parts)
        parts = self._tables()
        if q.group_by:
            loc = [i for i in range(len(self.parts))
                   if not self.agent_flags[i]]
            rem = [i for i in range(len(self.parts))
                   if self.agent_flags[i]]
            ordered = [parts[i] for i in loc] + \
                      [parts[i] for i in rem[::-1]]
            return search_grouped_parts(ordered, q, self.schema,
                                        agent_mode=True)
        part_q = _dc(q, offset=0, limit=q.offset + q.limit)
        # tag order = merge order: agents are tagged BEFORE locals
        # (searchd.cpp:6484/6492) and dedup keeps the largest tag
        # (KillPlainDupes) — reorder so locals come last and win
        # docid dupes (golden test_163 dist2: local delta2 beats
        # agent delta1)
        ordix = [i for i in range(len(parts)) if self.agent_flags[i]] + \
                [i for i in range(len(parts)) if not self.agent_flags[i]]
        parts = [parts[i] for i in ordix]
        flags = [self.agent_flags[i] for i in ordix]
        # remote agents don't share the master's uservars: a @var-sourced
        # filter matches nothing there (the agent-side 'undefined
        # variable' failure is swallowed into an empty part result —
        # golden test_039 `id in @var1` over dist returns local ids only)
        from manticoresearch_tpu.exec.searcher import SearchResult as _SR
        has_uv = any(getattr(f, "uservar", False) for f in q.filters)
        results = [(_SR([], 0, 0, 0.0, [])
                    if has_uv and flags[i3]
                    else p.search(part_q))
                   for i3, p in enumerate(parts)]
        for is_agent, r in zip(flags, results):
            if is_agent:
                for m in r.matches:
                    # wire matches carry no rowid (ParseMatch,
                    # searchd.cpp:1775): master sorter ties see them equal
                    m._remote = True
        # emulate the wire for remote parts: replies prune to the select
        # list and respect max_packet_size (the reference master rejects
        # oversized agent replies — golden test_220)
        mp = self._max_packet()
        if mp:
            import json as _json
            from manticoresearch_tpu.server.agent import (
                prune_attrs_for_select, result_to_payload)
            for is_agent, r, tbl in zip(flags, results, parts):
                if not is_agent or r.error:
                    continue
                prune_attrs_for_select(r.matches, part_q)
                ln = len(_json.dumps(result_to_payload(r)).encode())
                if ln > mp:
                    from manticoresearch_tpu.exec.searcher import \
                        SearchResult
                    return SearchResult(
                        [], 0, 0, 0.0, [],
                        error=f"index {self.name}: agent 127.0.0.1:13312:"
                              f" invalid packet size (status=0, "
                              f"len={ln}, max_packet_size={mp})")
        merged = merge_part_results(results, q, self.schema,
                                    agent_mode=any(flags))
        from manticoresearch_tpu.exec.multi import minimize_result_schema
        merged.schema = minimize_result_schema(
            results, [p.schema for p in parts])
        return merged

    def _max_packet(self) -> int:
        from .testcase import section_dict
        sd = section_dict(getattr(self.genv, "sections", []) or [],
                          "searchd", "")
        raw = (sd.get("max_packet_size") or [""])[-1].strip().upper()
        if not raw:
            return 0
        mult = 1
        if raw.endswith("K"):
            mult, raw = 1024, raw[:-1]
        elif raw.endswith("M"):
            mult, raw = 1 << 20, raw[:-1]
        try:
            return int(raw) * mult
        except ValueError:
            return 0

    @property
    def stored_fields(self):
        for t in self._tables():
            sf = getattr(t, "stored_fields", None)
            if sf:
                return sf
        return ()

    @property
    def tok_settings(self):
        # CALL KEYWORDS/SNIPPETS against a distributed table use the
        # first part's text pipeline (searchd.cpp)
        for t in self._tables():
            ts = getattr(t, "tok_settings", None)
            if ts is not None:
                return ts
        from manticoresearch_tpu.text.tokenizer import TokenizerSettings
        return TokenizerSettings()

    @property
    def dict_settings(self):
        for t in self._tables():
            ds = getattr(t, "dict_settings", None)
            if ds is not None:
                return ds
        from manticoresearch_tpu.text.dictionary import DictSettings
        return DictSettings()

    def delete(self, docids):
        # distributed DELETE fans out to every part (searchd DELETE on
        # dist tables)
        return sum(t.delete(docids) for t in self._tables()
                   if hasattr(t, "delete"))

    def commit(self):
        for t in self._tables():
            if hasattr(t, "commit"):
                t.commit()

    def insert(self, doc, replace=False):
        raise ValueError(f"table '{self.name}' is distributed")

    def global_stats(self):
        total = 0
        df: dict = {}
        for t in self._tables():
            gs = getattr(t, "global_stats", None)
            if gs is None:
                continue
            td2, d2 = gs()
            total += td2
            for k2, v2 in d2.items():
                df[k2] = df.get(k2, 0) + v2
        return total, df

    def get_document(self, docid):
        for t in self._tables():
            gd = getattr(t, "get_document", None)
            if gd is not None:
                d = gd(docid)
                if d:
                    return d
        return None

    def update_attrs(self, docids, values) -> int:
        return sum(t.update_attrs(docids, values) for t in self._tables())

    def _no_writes(self, *_a, **_k):
        raise ValueError(f"table '{self.name}' is distributed")

    insert = replace = delete_documents = _no_writes
    truncate = optimize = _no_writes


class _AgentEnv:
    """One emulated daemon: its own catalog/session/index registry,
    built from the config rendered for its agent id (the reference
    harness starts num_agents real searchd processes on localhost
    ports — helpers.inc:1320, StartSearchd loops)."""

    def __init__(self):
        from manticoresearch_tpu.exec.session import Catalog, Session
        self.catalog = Catalog()
        self.session = Session(self.catalog)
        self.index_order: list[str] = []
        self.attr_codes: dict[str, dict] = {}
        # distributed table name -> list of (agent_id, local index name)
        self.distributed: dict[str, list] = {}
        self.query_defaults: dict[str, dict] = {}


class GoldenEnv:
    def __init__(self, gt: GoldenTest, subtest: int, tmpdir: str):
        self.gt = gt
        self.subtest = subtest
        self.agents: list[_AgentEnv] = []
        self._plain_build: dict[str, tuple] = {}
        self._kills: dict[str, list] = {}
        self._klist_target: dict[str, str] = {}
        for aid in range(max(1, gt.num_agents)):
            cfg_text = gt.render_config(subtest, data_path=tmpdir,
                                        agentid=aid)
            self.sections = parse_sphinx_conf(cfg_text)
            self.env = _AgentEnv()
            self.agents.append(self.env)
            self._aid = aid
            self._build()

    # agent-0 conveniences (most tests are single-daemon)
    @property
    def catalog(self):
        return self.agents[0].catalog

    @property
    def session(self):
        return self.agents[0].session

    @property
    def index_order(self):
        return self.agents[0].index_order

    @property
    def attr_codes(self):
        return self.agents[0].attr_codes

    @property
    def distributed(self):
        return self.agents[0].distributed

    @property
    def query_defaults(self):
        return self.agents[0].query_defaults

    @staticmethod
    def _agent_id_of(hostport: str) -> int:
        """localhost:7700+N (the addresses render_config emits) -> N."""
        m = re.match(r"^(?:localhost|127\.0\.0\.1):(\d+)$", hostport)
        if not m:
            raise GoldenUnsupported(f"agent address {hostport!r}")
        port = int(m.group(1))
        if not 7700 <= port < 7750:
            raise GoldenUnsupported(f"agent port {port}")
        return port - 7700

    def _build(self):
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.index.rt import rt_from_packed
        from manticoresearch_tpu.config import settings_from_sql_options
        from manticoresearch_tpu.schema import Schema, AttrDef, AttrType

        con = open_db(self.gt)
        # searchd-section runtime vars surface in SHOW VARIABLES
        # (grouping_in_utc etc., sphinxql HandleMysqlShowVariables)
        sd_sec = section_dict(self.sections, "searchd", "")
        for var in ("grouping_in_utc", "query_log_format", "collation_server"):
            if sd_sec.get(var):
                self.env.session.variables[var] = sd_sec[var][-1]
        for sec in self.sections:
            if sec.kind != "index":
                continue
            idx = section_dict(self.sections, "index", sec.name)
            typ = (idx.get("type") or ["plain"])[-1]
            if typ == "distributed":
                if idx.get("agent_blackhole"):
                    raise GoldenUnsupported("blackhole agents")
                parts: list[tuple[int, str]] = []
                agent_flags: list[bool] = []
                for v in idx.get("local", []):
                    parts.append((self._aid, v.strip()))
                    agent_flags.append(False)
                for spec in (idx.get("agent", [])
                             + idx.get("agent_persistent", [])):
                    # "host:port:idx1,idx2[,...]" (mirrors `|` unsupported)
                    if "|" in spec:
                        raise GoldenUnsupported("agent mirrors")
                    m = re.match(r"^\s*([\w.]+:\d+):([\w,\s]+)$",
                                 spec.strip())
                    if not m:
                        raise GoldenUnsupported(f"agent spec {spec!r}")
                    aid = self._agent_id_of(m.group(1))
                    for nm in m.group(2).split(","):
                        parts.append((aid, nm.strip()))
                        agent_flags.append(True)
                self.env.distributed[sec.name] = parts
                self.env.index_order.append(sec.name)
                if not any(agent_flags):
                    # same-daemon parts: register a real distributed table
                    # so SphinxQL SELECTs resolve it too
                    self.env.catalog.create(
                        sec.name, None, "distributed",
                        {"local": [nm for _, nm in parts]})
                else:
                    # cross-daemon parts: the harness runs every agent
                    # in-process, so register a shim whose remote parts
                    # search the other agent envs' catalogs directly
                    self.env.catalog.tables[sec.name] = \
                        _CrossEnvDistributed(sec.name, self, parts,
                                             agent_flags)
                continue
            if typ == "rt":
                o, qdef = index_options(idx)
                tok, dic = settings_from_sql_options(o)
                flds = [v.strip().lower() for v in idx.get("rt_field", [])]
                attrs, codes = rt_attrs(idx)
                if (idx.get("index_field_lengths") or ["0"])[-1].strip() \
                        not in ("", "0"):
                    # index_field_lengths=1: <field>_len TOKENCOUNT attrs
                    # (AddAutoAttrs, sphinx.cpp:22219)
                    o["index_field_lengths"] = "1"
                    for f in flds:
                        attrs.append(AttrDef(f + "_len", AttrType.UINT))
                        codes[f + "_len"] = SPH_ATTR_TOKENCOUNT
                schema = Schema(fields=flds, attrs=attrs)
                from manticoresearch_tpu.index.rt import RtIndex
                self.env.catalog.tables[sec.name] = RtIndex(
                    sec.name, schema, tok, dic)
                self.env.catalog.tables[sec.name].options = dict(o)
                _apply_stored_fields(self.env.catalog.tables[sec.name], o)
                self.env.attr_codes[sec.name] = codes
                self.env.query_defaults[sec.name] = qdef
                self.env.index_order.append(sec.name)
                continue
            if typ in ("percolate", "pq"):
                o, qdef = index_options(idx)
                from manticoresearch_tpu.schema import Schema as _S
                flds = [v.strip().lower() for v in idx.get("rt_field", [])] \
                    or ["query"]
                attrs2, codes2 = rt_attrs(idx)
                self.env.catalog.create(sec.name, _S(fields=flds,
                                                     attrs=attrs2),
                                        table_type="percolate", options=o)
                self.env.attr_codes[sec.name] = codes2
                self.env.query_defaults[sec.name] = qdef
                self.env.index_order.append(sec.name)
                continue
            if typ == "template":
                # settings-only index (CALL KEYWORDS etc. on bare
                # settings): an empty RT table carries the text pipeline
                o, qdef = index_options(idx)
                from manticoresearch_tpu.schema import Schema as _S
                self.env.catalog.create(sec.name, _S(fields=["text"]),
                                        options=o)
                self.env.attr_codes[sec.name] = {}
                self.env.query_defaults[sec.name] = qdef
                self.env.index_order.append(sec.name)
                continue
            if typ not in ("plain",):
                raise GoldenUnsupported(f"index type {typ}")
            srcnames = idx.get("source")
            if not srcnames:
                raise GoldenUnsupported("plain index without source")
            o, qdef = index_options(idx)
            tok, dic = settings_from_sql_options(o)
            sd = None
            docs: list[dict] = []
            kill_ids: list[int] = []
            for srcname in srcnames:
                src = section_dict(self.sections, "source", srcname.strip())
                styp = (src.get("type") or [""])[-1]
                if styp == "xmlpipe2":
                    one = read_xmlpipe_source(src)
                elif styp in ("tsvpipe", "csvpipe"):
                    from .testcase import section_pairs
                    src["__pairs__"] = section_pairs(
                        self.sections, "source", srcname.strip())
                    one = read_tsvpipe_source(src, styp)
                elif styp in ("mysql", "pgsql", "sqlite"):
                    from .testcase import section_pairs
                    src["__pairs__"] = section_pairs(
                        self.sections, "source", srcname.strip())
                    one = read_source(src, con)
                else:
                    raise GoldenUnsupported(f"source type {styp}")
                if sd is None:
                    sd = one
                docs.extend(one.docs)
                kill_ids.extend(one.kill_ids)
            self._kills[(self._aid, sec.name)] = kill_ids
            self._klist_target[(self._aid, sec.name)] = (idx.get("killlist_target")
                                            or [""])[-1]
            try:
                schema = Schema(fields=sd.fields, attrs=sd.attrs)
            except ValueError:
                # invalid schema (duplicate names): the reference's
                # indexer FAILS this index and searchd serves it as
                # missing ("unknown local index")
                continue
            b = IndexBuilder(schema, tok, dic)
            b.add_documents(docs)
            packed = b.build()
            if str((idx.get("index_field_lengths") or ["0"])[-1]
                   ).strip() == "1":
                # index_field_lengths=1 exposes <field>_len token-count
                # attrs (CSphColumnInfo TOKENCOUNT, sphinx.cpp)
                from manticoresearch_tpu.schema import AttrDef, AttrType
                row_of = {int(did): r for r, did in
                          enumerate(packed.doc_ids.tolist())}
                for doc in docs:
                    r = row_of.get(int(doc["id"]))
                    for fid, f in enumerate(schema.fields):
                        doc[f + "_len"] = (
                            int(packed.field_lens[r, fid])
                            if r is not None else 0)
                for f in schema.fields:
                    sd.attrs.append(AttrDef(f + "_len", AttrType.UINT))
                    sd.attr_codes[f + "_len"] = SPH_ATTR_TOKENCOUNT
                schema = Schema(fields=sd.fields, attrs=sd.attrs)
                b = IndexBuilder(schema, tok, dic)
                b.add_documents(docs)
                packed = b.build()
            rt = rt_from_packed(sec.name, packed)
            rt.options = dict(o)
            _apply_stored_fields(rt, o)
            self.env.catalog.tables[sec.name] = rt
            self.env.attr_codes[sec.name] = dict(sd.attr_codes)
            self.env.query_defaults[sec.name] = qdef
            self.env.index_order.append(sec.name)
            self._plain_build[(self._aid, sec.name)] = (schema, tok, dic, docs, o)
        con.close()

        # <indexer><run>--merge DST SRC</run>: DST becomes DST ∪ SRC with
        # SRC's kill-list applied to DST's rows first (indexer.cpp --merge
        # / CSphIndex_VLN::Merge — re-building from the surviving union is
        # semantically identical for live rows)
        for run in self.gt.indexer_runs:
            toks = run.split()
            if toks[:1] == ["--merge"] and len(toks) >= 3:
                dst, src = toks[1], toks[2]
                if (self._aid, dst) not in self._plain_build \
                        or (self._aid, src) not in self._plain_build:
                    raise GoldenUnsupported(f"indexer run {run!r}")
                schema, tok, dic, ddocs, o = self._plain_build[(self._aid, dst)]
                sdocs = self._plain_build[(self._aid, src)][3]
                apply_kills = True
                rest = toks[3:]
                i2 = 0
                while i2 < len(rest):
                    if rest[i2] == "--merge-dst-range" and i2 + 3 < len(rest) + 1:
                        # keep only dst rows with attr in [min, max]
                        a, lo, hi = (rest[i2 + 1], int(rest[i2 + 2]),
                                     int(rest[i2 + 3]))
                        ddocs = [d for d in ddocs
                                 if lo <= int(d.get(a, 0)) <= hi]
                        i2 += 4
                    elif rest[i2] == "--merge-killlists":
                        apply_kills = False   # lists merge, rows survive
                        i2 += 1
                    elif rest[i2] == "--rotate":
                        i2 += 1
                    else:
                        raise GoldenUnsupported(f"indexer run {run!r}")
                kills = (set(self._kills.get((self._aid, src), ()))
                         if apply_kills else set())
                by_id = {d["id"]: d for d in ddocs
                         if d["id"] not in kills}
                for d in sdocs:
                    by_id[d["id"]] = d
                merged = list(by_id.values())
                b = IndexBuilder(schema, tok, dic)
                b.add_documents(merged)
                rt = rt_from_packed(dst, b.build())
                rt.options = dict(o)
                self.env.catalog.tables[dst] = rt
                self._plain_build[(self._aid, dst)] = (schema, tok, dic, merged, o)
            elif not toks or "--rotate" in toks[0]:
                continue
            else:
                raise GoldenUnsupported(f"indexer run {run!r}")

        # killlist_target (ApplyKillListsTo, searchd.cpp:15926-16005):
        # index K's kill list (:kl) and/or own docids (:id) suppress rows
        # of the listed target tables at load
        for (aid_k, name), target_spec in list(self._klist_target.items()):
            if aid_k != self._aid:
                continue
            if not target_spec:
                continue
            for tgt in target_spec.split(","):
                tgt = tgt.strip()
                mode = "both" if ":" not in tgt else ""
                if ":" in tgt:
                    tgt, _, mode = tgt.partition(":")
                    mode = mode.strip()
                ids: list[int] = []
                if mode in ("kl", "both"):
                    ids.extend(self._kills.get((self._aid, name), ()))
                if mode in ("id", "both") and (self._aid, name) in self._plain_build:
                    ids.extend(d["id"] for d in self._plain_build[(self._aid, name)][3])
                t = self.env.catalog.tables.get(tgt.strip())
                if t is not None and ids:
                    t.delete(ids)
                    t.commit()   # RT deletes stage until commit

    # -- API query execution ---------------------------------------------
    def resolve_indexes(self, spec: str, aid: int = 0) -> list[tuple]:
        """Index spec -> ordered (agent_id, local index name) parts."""
        env = self.agents[aid]
        names: list[tuple] = []
        if spec in ("*", "", None):
            wanted = [n for n in env.index_order]
        else:
            wanted = [s.strip() for s in re.split(r"[,\s]+", spec)
                      if s.strip()]

        def add(aid2, n):
            if n in self.agents[aid2].distributed:
                for a3, ln in self.agents[aid2].distributed[n]:
                    add(a3, ln)
            elif n in self.agents[aid2].catalog.tables:
                if (aid2, n) not in names:
                    names.append((aid2, n))
            else:
                raise GoldenUnsupported(f"unknown index {n!r}")

        for n in wanted:
            add(aid, n)
        return names

    def run_api_query(self, q) -> dict:
        from manticoresearch_tpu.exec.searcher import SearchQuery
        from manticoresearch_tpu.query.planner import AttrFilterDef
        from manticoresearch_tpu.exec.multi import merge_part_results

        attrs = q.attrs
        known = {"mode", "ranker", "sortmode", "sortby", "filter",
                 "filter_value", "filter_range", "filter_str",
                 "filter_exclude", "index", "limits", "cutoff", "resarray",
                 "roundoff", "expect_error", "groupattr", "groupfunc",
                 "groupsort", "groupdistinct", "select", "index_weights",
                 "tag", "comment", "geoanchor", "filters_list",
                 "limits_full"}
        unknown = set(attrs) - known
        if unknown:
            raise GoldenUnsupported(f"API query attrs {sorted(unknown)}")
        text = q.query
        mode = attrs.get("mode", "")
        ranker_names = {
            "": "proximity_bm25", "proximity_bm25": "proximity_bm25",
            "bm25": "bm25", "none": "none", "wordcount": "wordcount",
            "proximity": "proximity", "matchany": "matchany",
            "fieldmask": "fieldmask", "sph04": "sph04", "expr": "expr",
        }
        rname = attrs.get("ranker", "")
        if rname not in ranker_names:
            raise GoldenUnsupported(f"ranker {rname}")
        ranker = ranker_names[rname]

        # legacy mode conversion (PrepareQueryEmulation, searchd.cpp:2141)
        if mode in ("all", "any", "phrase"):
            esc = re.sub(r'([<\\()|\-!@~"&/^$=])', r"\\\1", text)
            if mode == "all":
                text = esc
                ranker = "proximity"
            elif mode == "any":
                text = '"' + esc + '"/1'
                ranker = "matchany"
            else:
                text = '"' + esc + '"'
                ranker = "proximity"
        elif mode == "fullscan":
            text = ""
        elif mode in ("extended", "extended2", ""):
            pass
        else:
            raise GoldenUnsupported(f"match mode {mode}")

        limit = 20
        offset0 = 0
        max_matches0 = 1000
        if attrs.get("limits"):
            limit = int(attrs["limits"])
        cutoff = int(attrs.get("cutoff", 0) or 0)
        if attrs.get("limits_full"):
            offset0, limit, mm, co = attrs["limits_full"]
            if mm:
                max_matches0 = mm
            if co:
                cutoff = co
        geo = attrs.get("geoanchor")
        geo_filters: list[dict] = []

        filters = []
        for fd in (attrs.get("filters_list") or []):
            if fd["name"] == "@geodist" or geo is not None \
                    and fd["name"] in ():
                geo_filters.append(fd)
                continue
            if fd["kind"] == "values":
                filters.append(AttrFilterDef(
                    attr=fd["name"], kind="values",
                    values=list(fd["values"]),
                    exclude=fd.get("exclude", False)))
            elif fd["kind"] == "range":
                filters.append(AttrFilterDef(
                    attr=fd["name"], kind="range_i", lo=fd["lo"],
                    hi=fd["hi"], exclude=fd.get("exclude", False)))
            else:
                filters.append(AttrFilterDef(
                    attr=fd["name"], kind="range_f", lo=fd["lo"],
                    hi=fd["hi"], exclude=fd.get("exclude", False)))
        if attrs.get("filter"):
            name = attrs["filter"]
            exclude = attrs.get("filter_exclude") == "1"
            if attrs.get("filter_value") is not None:
                filters.append(AttrFilterDef(
                    attr=name, kind="values",
                    values=[int(attrs["filter_value"])], exclude=exclude))
            elif attrs.get("filter_range"):
                lo, hi = _parse_range(attrs["filter_range"])
                filters.append(AttrFilterDef(
                    attr=name, kind="range_i", lo=lo, hi=hi,
                    exclude=exclude))
            elif attrs.get("filter_str"):
                filters.append(AttrFilterDef(
                    attr=name, kind="values",
                    values=[attrs["filter_str"]], exclude=exclude))

        sortmode = attrs.get("sortmode", "")
        sortby = attrs.get("sortby", "")
        sort_expr = None            # SPH_SORT_EXPR: host-sorted tail
        if sortmode == "":
            sort = [("weight", False), ("id", True)]
        elif sortmode == "attr_asc":
            sort = [(sortby, True), ("id", True)]
        elif sortmode == "attr_desc":
            sort = [(sortby, False), ("id", True)]
        elif sortmode == "extended":
            sort = _parse_extended_sort(sortby)
        elif sortmode == "expr":
            # SPH_SORT_EXPR sorts by expression value DESC, id ASC
            # (sphinxsort expr sorter)
            from manticoresearch_tpu.query.expr import parse_expr
            sort_expr = parse_expr(sortby)
            sort = [("weight", False), ("id", True)]
        else:
            raise GoldenUnsupported(f"sort mode {sortmode}")

        group_by = None
        group_distinct = attrs.get("groupdistinct")
        group_sort = None
        if attrs.get("groupattr"):
            gfunc = attrs.get("groupfunc", "")
            gfmap = {"": "{}", "attr": "{}", "day": "YEARMONTHDAY({})",
                     "week": "WEEK({})", "month": "YEARMONTH({})",
                     "year": "YEAR({})"}
            if gfunc not in gfmap:
                raise GoldenUnsupported(f"groupfunc {gfunc}")
            group_by = gfmap[gfunc].format(attrs["groupattr"])
            gs = attrs.get("groupsort", "@group desc")
            toks2 = gs.split()
            gname = toks2[0].lower()
            gasc = len(toks2) > 1 and toks2[1].lower() == "asc"
            gmap = {"@group": "@groupby", "@groupby": "@groupby",
                    "@count": "@count", "@weight": "weight",
                    "@id": "id"}
            # plain attribute group sorts pass through (canonicalized
            # against the schema below)
            group_sort = [(gmap.get(gname, gname), gasc)]

        select_items = None
        if attrs.get("select"):
            # SetSelect: "expr [AS alias], ..." — '*' expands to the
            # index's attrs; computed items append as BIGINT/FLOAT
            select_items = []
            depth = 0
            cur = ""
            parts = []
            for ch in attrs["select"]:
                if ch == "," and depth == 0:
                    parts.append(cur)
                    cur = ""
                    continue
                depth += ch == "("
                depth -= ch == ")"
                cur += ch
            if cur.strip():
                parts.append(cur)
            for p in parts:
                p = p.strip()
                m2 = re.match(r"^(.*?)\s+as\s+(\w+)$", p, re.I)
                if not m2:
                    # implicit alias without AS ("to_string(x) i1"):
                    # a trailing bare identifier after ')' or a word
                    m2 = re.match(r"^(.*[)\w'\"])\s+([A-Za-z_]\w*)$", p)
                    if m2 and m2.group(2).upper() in ("AS", "DESC",
                                                      "ASC"):
                        m2 = None
                if m2:
                    select_items.append((m2.group(2), m2.group(1).strip()))
                else:
                    select_items.append((p, p))
        if group_by and select_items is not None:
            # GROUP BY a computed alias: substitute the expression
            for alias, expr_s in select_items:
                if alias == group_by and expr_s != alias:
                    group_by = expr_s
                    break
        index_weights: dict[str, int] = {}
        for part in str(attrs.get("index_weights", "")).split():
            nm, _, w = part.partition(":")
            if w.strip():
                index_weights[nm.strip()] = int(w.strip())

        names = self.resolve_indexes(attrs.get("index", "*"))
        qdef = {}
        for aid, n in names:
            qdef.update(self.agents[aid].query_defaults.get(n, {}))

        # schema names are case-insensitive: fold query-side references
        # onto the canonical schema spelling (reference sphToLower)
        codes0 = self.agents[names[0][0]].attr_codes.get(names[0][1], {}) \
            if names else {}

        def canon(nm):
            if nm in codes0 or not nm:
                return nm
            low = str(nm).lower()
            return next((k for k in codes0 if k.lower() == low), nm)
        if group_by:
            fm = re.match(r"^(\w+)\((\w+)\)$", group_by)
            if fm:   # groupfunc wrapper: canonize the inner attr name
                group_by = f"{fm.group(1)}({canon(fm.group(2))})"
            else:
                group_by = canon(group_by)
        if group_distinct:
            group_distinct = canon(group_distinct)
        filters = [dc_replace(f, attr=canon(f.attr)) for f in filters]
        if select_items:
            # filters may name a SetSelect computed alias; the engine's
            # late filters take the expression text
            amap = {a.lower(): e for a, e in select_items if a}
            filters = [dc_replace(f, attr=amap[f.attr.lower()])
                       if f.attr.lower() in amap
                       and canon(f.attr) not in codes0 else f
                       for f in filters]
        sort = [(canon(k2) if k2 not in ("weight", "id") else k2, a2)
                for k2, a2 in sort]
        if group_sort:
            group_sort = [(canon(k2) if k2 not in
                           ("weight", "id", "@groupby", "@count") else k2,
                           a2) for k2, a2 in group_sort]
        wide = 1000 if (sort_expr is not None or geo is not None) \
            else limit
        geo_sort = None
        if geo is not None:
            # geoanchor: @geodist computed host-side over the wide
            # window; requested sort/filters apply after
            geo_sort = sort
            sort = [("weight", False), ("id", True)]
        sel = None
        agg_items: dict[str, str] = {}   # alias -> engine aggregate key
        if group_by:
            # API grouped results carry every attr of the representative
            # row (the reference fills the full schema per group)
            sel = ["*", "count(*)"]
            if group_distinct:
                sel.append(f"count(distinct {group_distinct})")
            # aggregate select items (SetSelect "avg(price) avgprice"):
            # computed by the engine's grouped path, typed per arg
            agg_re2 = re.compile(r"^(sum|min|max|avg|count)\s*\(", re.I)
            for alias, expr_s in (select_items or []):
                es = expr_s.strip()
                if es.lower().replace(" ", "") == "count(*)":
                    if alias != es:
                        # aliased count ("count(*) as cnt") reads the
                        # built-in group count
                        agg_items[alias] = "count(*)"
                    continue
                if agg_re2.match(es):
                    key = es.lower()
                    agg_items[alias] = key
                    sel.append(key)
        # grouped queries: groupsort orders the GROUPS; the query's own
        # sortmode/sortby picks each group's representative row
        # (SetSortMode vs SetGroupBy group-sort, sphinxsort.cpp)
        within = sort if (group_by and sort) else None
        sq = SearchQuery(match=text, limit=wide,
                         offset=(offset0 if geo is None
                                 and sort_expr is None else 0),
                         max_matches=max_matches0, ranker=ranker,
                         sort=(group_sort or sort), filters=filters,
                         cutoff=cutoff, group_by=group_by, select=sel,
                         within_sort=within,
                         expand_keywords=bool(qdef.get("expand_keywords")))

        if len(names) == 1:
            aid, n = names[0]
            res = self.agents[aid].catalog.get(n).search(sq)
        elif group_by:
            # distributed/multi-index GROUP BY: the per-part grouped
            # results merge by key (search orchestrator semantics)
            from manticoresearch_tpu.exec.multi import search_grouped_parts
            parts = [self.agents[aid].catalog.get(n) for aid, n in names]
            # any remote part => agent merge semantics: grouped rows merge
            # in KillGroupbyDupes order — locals first, then agents in
            # DESCENDING tag order — and the first pushed rep sticks
            amode = any(aid != 0 for aid, _n in names) or len(
                {aid for aid, _n in names}) > 1
            if amode:
                loc = [(a, n) for a, n in names if a == 0]
                rem = [(a, n) for a, n in names if a != 0]
                ordered = loc + rem[::-1]
                parts = [self.agents[a].catalog.get(n) for a, n in ordered]
            res = search_grouped_parts(parts, sq, parts[0].schema,
                                       agent_mode=amode)
        else:
            parts = [self.agents[aid].catalog.get(n) for aid, n in names]
            results = [p.search(sq) for p in parts]
            if index_weights:
                # SetIndexWeights: each index's match weights scale by
                # its weight before the merge (searchd.cpp index-weight
                # multiply on aggregation)
                for (aid, n), r in zip(names, results):
                    w = index_weights.get(n, 1)
                    if w != 1 and not r.error:
                        for m in r.matches:
                            m.weight *= w
            for r in results:
                if r.error:
                    res = r
                    break
            else:
                res = merge_part_results(results, sq,
                                         parts[0].schema)
        if geo is not None and not res.error:
            from manticoresearch_tpu.utils.geodist import _sphere_rad
            alat_attr, along_attr, alat, along = geo
            import numpy as _np
            for m in res.matches:
                m.attrs["@geodist"] = float(_sphere_rad(
                    float(_np.float32(alat)), float(_np.float32(along)),
                    float(_np.float32(m.attrs.get(alat_attr, 0.0) or 0)),
                    float(_np.float32(m.attrs.get(along_attr, 0.0)
                                      or 0))))
            for fd in geo_filters:
                lo, hi = fd.get("lo"), fd.get("hi")
                excl = fd.get("exclude", False)
                kept = []
                for m in res.matches:
                    v = m.attrs["@geodist"]
                    ok = (lo is None or v >= lo) and (hi is None or
                                                      v <= hi)
                    if ok != excl:
                        kept.append(m)
                res.matches = kept
                res.total = res.total_found = len(kept)
            if geo_sort:
                from manticoresearch_tpu.exec.multi import _apply_sort

                class _Q:
                    sort = geo_sort
                _apply_sort(res.matches, _Q)
            res.matches = res.matches[offset0:offset0 + limit]
        if sort_expr is not None and not res.error:
            from manticoresearch_tpu.query.expr import (ExprError,
                                                        eval_expr_host)
            # uint attrs evaluate UNSIGNED in expressions (the engine's
            # host copies are signed i32)
            umap = {k for k, v in
                    (self.agents[names[0][0]].attr_codes.get(names[0][1],
                                                             {})).items()
                    if v in (SPH_ATTR_INTEGER, SPH_ATTR_TIMESTAMP,
                             SPH_ATTR_BOOL)}

            def skey(m):
                row = {k: (v & 0xFFFFFFFF
                           if k in umap and isinstance(v, int) else v)
                       for k, v in m.attrs.items()}
                try:
                    v = eval_expr_host(sort_expr, row, m.weight, m.docid)
                except ExprError:
                    v = 0
                return v
            import numpy as _np
            for m in res.matches:
                # the server materializes the sort expression as a float
                # @expr attr (sphinxsort expr sorter)
                m.attrs["@expr"] = float(_np.float32(skey(m) or 0))
            res.matches.sort(key=lambda m: (-m.attrs["@expr"], m.docid))
            res.matches = res.matches[:limit]
        return self.shape_api_result(res, names, q,
                                     group_by=group_by,
                                     group_distinct=group_distinct,
                                     has_expr=sort_expr is not None,
                                     select_items=select_items,
                                     agg_items=agg_items)

    def shape_api_result(self, res, names, q, group_by=None,
                         group_distinct=None, has_expr=False,
                         select_items=None, agg_items=None) -> dict:
        # multi-index result schema = the attr INTERSECTION in first-index
        # order (MinimizeAggrResult schema unification, searchd.cpp:4816)
        maps = [self.agents[aid].attr_codes.get(n, {})
                for aid, n in names] or [{}]
        attrs_map = {k: v for k, v in maps[0].items()
                     if all(m.get(k) == v for m in maps[1:])}
        sel_exprs = {}          # alias -> parsed expr tree (computed items)
        if select_items is not None:
            from manticoresearch_tpu.query.expr import parse_expr
            base_map = attrs_map
            attrs_map = {}
            uint_names = {k for k, v in base_map.items()
                          if v in (SPH_ATTR_INTEGER, SPH_ATTR_TIMESTAMP,
                                   SPH_ATTR_BOOL)}
            for alias, expr_s in select_items:
                if expr_s == "*":
                    attrs_map.update(base_map)
                elif expr_s in base_map and alias == expr_s:
                    attrs_map[expr_s] = base_map[expr_s]
                elif expr_s in ("id", "@id", "weight()", "@weight") \
                        and alias == expr_s:
                    continue    # implicit columns, not attrs
                elif expr_s in ("id", "@id"):
                    # 'id AS alias' materializes the docid as a bigint
                    # attr (test_047 'id as sel' group-by)
                    sel_exprs[alias] = (("id",), uint_names)
                    attrs_map[alias] = SPH_ATTR_BIGINT
                elif agg_items and alias in agg_items:
                    # engine-computed group aggregate: AVG is FLOAT,
                    # others follow the argument attr's type
                    inner = re.sub(r"^\w+\s*\(\s*(distinct\s+)?|\s*\)\s*$",
                                   "", agg_items[alias]).strip()
                    if agg_items[alias].startswith("avg"):
                        attrs_map[alias] = SPH_ATTR_FLOAT
                    elif agg_items[alias] == "count(*)":
                        attrs_map[alias] = SPH_ATTR_BIGINT
                    else:
                        attrs_map[alias] = base_map.get(inner,
                                                        SPH_ATTR_BIGINT)
                else:
                    # computed item: int exprs type INTEGER unless a
                    # 64-bit operand widens them (id / bigint attr /
                    # BIGINT()), matching the expr parser's widest-type
                    # promotion; FLOAT probed per-row below
                    tree = parse_expr(expr_s)

                    def _wide(t):
                        if not isinstance(t, (tuple, list)):
                            return False
                        if len(t) >= 1 and t[0] == "id":
                            return True
                        if len(t) >= 2 and t[0] == "attr" and base_map.get(
                                t[1]) == SPH_ATTR_BIGINT:
                            return True
                        if len(t) >= 2 and t[0] == "call" \
                                and t[1] in ("BIGINT", "SINT"):
                            return True
                        if len(t) >= 2 and t[0] == "num" \
                                and isinstance(t[1], (int, float)) \
                                and abs(t[1]) >= 2**31:
                            return True   # wide literal promotes to int64
                        return any(_wide(x) for x in t
                                   if isinstance(x, (tuple, list)))
                    sel_exprs[alias] = (tree, uint_names)
                    attrs_map[alias] = (SPH_ATTR_BIGINT if _wide(tree)
                                        else SPH_ATTR_INTEGER)
            # probe one row to set FLOAT codes
            if res.matches and sel_exprs:
                from manticoresearch_tpu.query.expr import (ExprError,
                                                            eval_expr_host)
                m0 = res.matches[0]
                for alias, (tree, un) in sel_exprs.items():
                    row = {k: (v & 0xFFFFFFFF if k in un
                               and isinstance(v, int) else v)
                           for k, v in m0.attrs.items()}
                    try:
                        v = eval_expr_host(tree, row, m0.weight, m0.docid)
                    except ExprError:
                        v = 0
                    if isinstance(v, float):
                        attrs_map[alias] = SPH_ATTR_FLOAT
                    elif isinstance(v, str):
                        attrs_map[alias] = SPH_ATTR_STRING
        if has_expr:
            attrs_map["@expr"] = SPH_ATTR_FLOAT
        if res.matches and "@geodist" in res.matches[0].attrs:
            attrs_map["@geodist"] = SPH_ATTR_FLOAT
        if group_by:
            # the server appends the group-by magic attrs
            attrs_map["@groupby"] = SPH_ATTR_BIGINT
            attrs_map["@count"] = SPH_ATTR_INTEGER
            if group_distinct:
                attrs_map["@distinct"] = SPH_ATTR_INTEGER
        out: dict = {"error": res.error or "", "warning": res.warning or ""}
        if res.error:
            # the API reports failed queries with just the error string
            out["query"] = q.query
            return out
        # JSON attrs serialize to plain API clients as STRING
        # (FixupAttrForNetwork, searchd.cpp:3308-3310)
        out["attrs"] = {k: (SPH_ATTR_STRING if v == 0 else v)
                        for k, v in attrs_map.items()}
        resarray = bool(int(q.attrs.get("resarray", 0) or 0))
        matches: dict | list = [] if resarray else {}
        for m in res.matches:
            vals = {}
            if sel_exprs:
                from manticoresearch_tpu.query.expr import (ExprError,
                                                            eval_expr_host)
                for alias, (tree, un) in sel_exprs.items():
                    row = {k: (v & 0xFFFFFFFF if k in un
                               and isinstance(v, int) else v)
                           for k, v in m.attrs.items()}
                    try:
                        m.attrs[alias] = eval_expr_host(tree, row,
                                                        m.weight, m.docid)
                    except ExprError:
                        m.attrs[alias] = 0
            for aname, code in attrs_map.items():
                if aname == "@groupby":
                    vals[aname] = m.attrs.get(
                        "@groupby", m.attrs.get(group_by, 0))
                    continue
                if aname == "@count":
                    vals[aname] = int(m.attrs.get("count(*)", 0))
                    continue
                if aname == "@distinct":
                    vals[aname] = int(m.attrs.get(
                        f"count(distinct {group_distinct})", 0))
                    continue
                if agg_items and aname in agg_items:
                    key = agg_items[aname]
                    v = m.attrs.get(key)
                    if v is None:
                        v = m.attrs.get(key.replace(" ", ""))
                    if v is None:
                        v = next((mv for mk, mv in m.attrs.items()
                                  if mk.lower().replace(" ", "")
                                  == key.replace(" ", "")), 0)
                    vals[aname] = (float(v or 0)
                                   if code == SPH_ATTR_FLOAT
                                   else int(v or 0))
                    continue
                v = m.attrs.get(aname)
                if isinstance(v, str) and code in (SPH_ATTR_MULTI,
                                                   SPH_ATTR_MULTI64):
                    # grouped paths render MVAs as display strings
                    # ("[1, 2, 3]"); recover the value list
                    v = [int(x) for x in re.findall(r"-?\d+", v)]
                if code == SPH_ATTR_MULTI:
                    vals[aname] = [int(x) & 0xFFFFFFFF for x in (v or [])]
                elif code == SPH_ATTR_MULTI64:
                    vals[aname] = [int(x) for x in (v or [])]
                elif code == SPH_ATTR_FLOAT:
                    vals[aname] = float(v or 0.0)
                elif code == SPH_ATTR_STRING:
                    vals[aname] = "" if v is None else str(v)
                elif code == 0:
                    # empty JSON source serializes as "{}" to API clients
                    # (empty BSON root renders as an empty object)
                    vals[aname] = v if (v is not None and str(v).strip()) \
                        else "{}"

                elif code == SPH_ATTR_BIGINT:
                    try:
                        iv = int(v or 0)
                    except (TypeError, ValueError):
                        vals[aname] = v   # JSON group keys keep strings
                        continue
                    # the recorded models come from the x32 PHP client:
                    # sphUnpackI64 (sphinxapi.php:323) returns an int only
                    # for -2^31 <= v < 2^31 (v=0 prints via %u -> "0");
                    # everything else stringifies
                    if -(2**31) <= iv < 2**31 and iv != 0:
                        vals[aname] = iv
                    else:
                        vals[aname] = str(iv)
                else:
                    # uint/bool/timestamp render unsigned (PHP sprintf %u)
                    try:
                        vals[aname] = int(v or 0) & 0xFFFFFFFF
                    except (TypeError, ValueError):
                        vals[aname] = v
            if resarray:
                matches.append({"id": m.docid, "weight": str(m.weight),
                                "attrs": vals})
            else:
                matches[m.docid] = {"weight": str(m.weight), "attrs": vals}
        if matches or not resarray:
            out["matches"] = matches
        if not matches and not resarray:
            out.pop("matches")
        out["total"] = str(res.total)
        out["total_found"] = str(res.total_found)
        words = {}
        for ws in res.word_stats:
            words[ws.word] = {"docs": str(ws.docs), "hits": str(ws.hits)}
        if words:
            out["words"] = words
        out["query"] = q.query
        return out

    # -- SphinxQL query execution ----------------------------------------
    def run_ql_query(self, q) -> list[dict]:
        """One shaped result per executed statement — the harness drives
        multi-statement <sphinxql> elements through mysqli_multi_query and
        records each result set separately (helpers.inc:2316-2385); the
        recorded models label every result with its own statement text,
        trimmed, without the trailing ';'."""
        aid = int(q.attrs.get("d", 0) or 0)    # target daemon (agent id)
        if aid >= len(self.agents):
            raise GoldenUnsupported(f"query targets agent {aid}")

        def extra(out: dict) -> dict:
            if q.attrs.get("vip"):
                out["vip"] = 1
            if aid > 0:
                out["agent"] = aid
            return out

        if q.query.strip().upper() == "RECONNECT":
            return [extra({"sphinxql": "RECONNECT",
                           "error": "reconnected ok!", "errno": 0})]

        sysattr = q.attrs.get("system", "")
        if sysattr:
            # <sphinxql system="restart-daemon"/>: the harness restarts
            # searchd and records a status comment (helpers.inc). Our
            # tables live in-process with WAL/ram-chunk state already
            # durable, so the restart itself is a no-op; emit the same
            # status line the php harness records.
            if sysattr == "restart-daemon":
                # a fresh daemon restarts the UidShort counter at 1
                # (test_358 stored-query ids after restart)
                from manticoresearch_tpu.utils import uid as _uid
                _uid.reset()
                return [extra({"sphinxql": "/* restart-daemon => stop=ok, "
                                           "return code=0; start=ok, "
                                           "return code=0 */"})]
            raise GoldenUnsupported(f"sphinxql system={sysattr!r}")

        # a query with same-line ';' separators runs as ONE multi-statement
        # batch: result set 0 is labeled with the full text, set N with
        # explode(';')[N] + '/* result N+1 of previous multistatement */'
        # (helpers.inc:2364-2366); the loader already split on ';\n'
        parts = q.query.split(";")
        no_time = ("show" in q.query.lower()
                   and "meta" in q.query.lower())
        shaped: list[dict] = []
        for k, stmt in enumerate([q.query]):
            results = self.agents[aid].session.execute(stmt)
            if not results:
                if not stmt.strip().rstrip(";").strip():
                    # an empty query records the no-result error shape
                    # with errno 0 (mysqli empty-query result row)
                    shaped.append(extra({"sphinxql": "", "errno": 0,
                                         "error": ""}))
                else:
                    shaped.append(extra({
                        "sphinxql": stmt.strip().rstrip(";").strip(),
                        "total_affected": 0}))
                continue
            stop = False

            def _label(n: int) -> str:
                if n == 0 or ";" not in stmt:
                    return stmt.strip().rstrip(";").strip()
                head = (parts[n] + " ") if n < len(parts) else ""
                return (head + f"/* result {n + 1} of previous "
                               f"multistatement */").strip()
            # a FACET statement yields one result set per facet — the
            # php harness records each (mysqli_multi_query next_result)
            for rs_n, r in enumerate(results):
                out: dict = {"sphinxql": _label(rs_n)}
                if r.error:
                    out["error"] = r.error
                    out["errno"] = 1064
                    shaped.append(extra(out))
                    # the daemon keeps executing the rest of the batch and
                    # the result stream continues past error sets
                    # (golden test_069: errors at statements 6-7, results
                    # recorded for all 14)
                    continue
                if r.columns:
                    rows = []
                    for row in r.rows:
                        d = {}
                        for c, v in zip(r.columns, row):
                            d[c] = _render_cell(v)
                        if no_time and d.get("Variable_name") == "time":
                            continue
                        rows.append(d)
                    out["total_rows"] = len(r.rows)
                    if rows:
                        out["rows"] = rows
                    shaped.append(extra(out))
                    continue
                out["total_affected"] = r.affected
                shaped.append(extra(out))
            if stop:
                break
        return shaped

    def run_http_query(self, q) -> dict:
        """Run one endpoint= query through the HTTP handler directly
        (the reference harness POSTs to searchd's http listener)."""
        from manticoresearch_tpu.server.http import HttpServer
        env = self.agents[0]
        hs = getattr(env, "_http", None)
        if hs is None:
            hs = HttpServer(env.catalog)
            env._http = hs
        endpoint = q.attrs.get("endpoint", "")
        method = (q.attrs.get("method") or "POST").upper()
        body = (q.query or "").encode("utf-8")
        status, _ctype, payload = hs.handle_request(
            method, "/" + endpoint.lstrip("/"), {}, body)
        code = int(status.split()[0])
        try:
            reply = json.loads(payload.decode("utf-8"))
        except ValueError:
            reply = payload.decode("utf-8", "replace")
        reply = _strip_http_reply(reply)
        return {"http": 1, "http_endpoint": endpoint,
                "http_method": method, "http_request": q.query,
                "http_code": code,
                "rows": json.dumps(reply, separators=(",", ":"))}

    def run_query(self, q) -> list[dict]:
        if q.type == "sphinxql":
            return self.run_ql_query(q)
        if q.type == "api":
            if self.gt.query_settings:
                # driven by the <query_settings> PHP block (the harness
                # eval's it per <query> element, helpers.inc:2516)
                from .phpapi import run_query_settings
                return run_query_settings(self, self.gt.query_settings,
                                          q.query)
            return [self.run_api_query(q)]
        if q.type == "http":
            return [self.run_http_query(q)]
        if q.type == "comment":
            return [{"comment": q.query}]
        raise GoldenUnsupported(f"query type {q.type}")


def _strip_http_reply(obj):
    """Normalize a JSON reply for model comparison: volatile keys out
    (took), version-added keys out (total_relation), ids stringified —
    matching the php harness's own normalization."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if k in ("took", "total_relation", "_type", "_index"):
                continue
            if k == "_id":
                out[k] = str(v)
                continue
            out[k] = _strip_http_reply(v)
        return out
    if isinstance(obj, list):
        return [_strip_http_reply(v) for v in obj]
    return obj


def _render_cell(v):
    if v is None:
        # a wire NULL (PutNULL, searchd.cpp:12220) reaches the php
        # harness as mysqli null, recorded as php null — keep it None
        return None
    if isinstance(v, list):
        # MVA/JSON-array render over the SQL wire: comma-joined; values
        # may be strings from JSON arrays (test_396 '5all')
        def _one(x):
            try:
                return str(int(x))
            except (TypeError, ValueError):
                return str(x)
        return ",".join(_one(x) for x in v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        s = f"{v:.6f}"
        return s
    return str(v)


def _parse_range(s: str) -> tuple[int, int]:
    # NB: no \s* before the alternation — it would let the dash branch
    # steal the sign of a space-separated negative bound
    # ("-903 -900" must parse (-903, -900), not (-903, 900))
    m = re.match(r"\s*(-?\d+)(?:\s*[,:]\s*|\s+|\s*-\s*)(-?\d+)\s*$", s)
    if not m:
        raise GoldenUnsupported(f"filter_range {s!r}")
    return int(m.group(1)), int(m.group(2))


def _parse_extended_sort(sortby: str) -> list:
    out = []
    for part in sortby.split(","):
        toks = part.split()
        if not toks:
            continue
        name = toks[0].strip()
        asc = len(toks) > 1 and toks[1].strip().lower() == "asc"
        if name in ("@weight", "weight()"):
            name = "weight"
        elif name in ("@id",):
            name = "id"
        elif name in ("@geodist", "@count", "@groupby"):
            pass   # computed keys resolve host-side
        elif name.startswith("@"):
            raise GoldenUnsupported(f"sort key {name}")
        out.append((name, asc))
    if not any(k == "id" for k, _ in out):
        out.append(("id", True))
    return out


# ---------------------------------------------------------------------------
# comparison (CompareResultSetFixup + PHP loose ==)

_DROP_KEYS = ("time", "warning", "status", "fields", "resarray", "roundoff")


def fixup(result: dict, roundoff: int = 0,
          variants_match: bool = False) -> dict:
    if not isinstance(result, dict):
        return result
    out = {k: v for k, v in result.items() if k not in _DROP_KEYS}
    if isinstance(out.get("attrs"), dict):
        # @-magic columns (@count/@groupby/@distinct/@expr) were typed
        # INTEGER or BIGINT depending on the reference version that
        # recorded each model — canonicalize the int family for them
        na0 = {}
        for k, v in out["attrs"].items():
            if str(k).startswith("@") and v in (
                    SPH_ATTR_INTEGER, SPH_ATTR_TIMESTAMP,
                    SPH_ATTR_BOOL, SPH_ATTR_BIGINT):
                v = SPH_ATTR_INTEGER
            na0[k] = v
        out = dict(out)
        out["attrs"] = na0
    if variants_match and isinstance(out.get("attrs"), dict):
        # variant checks compare data across attr-type variants: mva64
        # folds to mva, @-magic bigints to int (CompareResultSetFixup,
        # helpers.inc:883-893)
        na = {}
        for k, v in out["attrs"].items():
            if v == SPH_ATTR_MULTI64:
                v = SPH_ATTR_MULTI
            if v == SPH_ATTR_BIGINT and str(k).startswith("@"):
                v = SPH_ATTR_INTEGER
            na[k] = v
        out = dict(out)
        out["attrs"] = na
    if roundoff and isinstance(out.get("matches"), (dict, list)):
        att = result.get("attrs") or {}
        fnames = [k for k, v in att.items() if v == SPH_ATTR_FLOAT]
        it = (out["matches"].values() if isinstance(out["matches"], dict)
              else out["matches"])
        for m in it:
            for fn in fnames:
                if fn in m.get("attrs", {}):
                    m["attrs"][fn] = f"%.{roundoff}f" % float(
                        m["attrs"][fn])
    if "sphinxql" in out and isinstance(out["sphinxql"], str):
        out["sphinxql"] = out["sphinxql"].strip().rstrip(";").strip()
    return out


def loose_eq(a, b) -> bool:
    """PHP `==` semantics: arrays compare key-wise ignoring order; scalars
    compare numerically when both look numeric."""
    if isinstance(a, dict) and isinstance(b, dict):
        if len(a) != len(b):
            return False
        bk = {str(k): v for k, v in b.items()}
        for k, v in a.items():
            sk = str(k)
            if sk not in bk:
                return False
            if not loose_eq(v, bk[sk]):
                return False
        return True
    if isinstance(a, list) and isinstance(b, dict):
        return loose_eq({i: v for i, v in enumerate(a)}, b)
    if isinstance(b, list) and isinstance(a, dict):
        return loose_eq(a, {i: v for i, v in enumerate(b)})
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(loose_eq(x, y)
                                        for x, y in zip(a, b))
    if a is None or b is None:
        return a == b or a in (None, "") and b in (None, "")
    na, nb = _as_num(a), _as_num(b)
    if na is not None and nb is not None:
        if isinstance(na, float) or isinstance(nb, float):
            # float attrs round-trip through f32 + PHP serialize; compare
            # at f32 precision
            import math
            return math.isclose(float(na), float(nb),
                                rel_tol=2e-6, abs_tol=1e-6)
        return na == nb
    return str(a) == str(b)


def _as_num(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        s = v.strip()
        try:
            return int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return None
    return None


def compare_result(ours: dict, model: dict,
                   variants_match: bool = False) -> str | None:
    """None if equal; else a short diff description."""
    roundoff = 0
    if isinstance(model, dict):
        roundoff = int(model.get("roundoff") or 0)
    a = fixup(ours, roundoff, variants_match)
    b = fixup(model, roundoff, variants_match)
    if isinstance(a, dict) and isinstance(b, dict) \
            and (a.get("http") or b.get("http")):
        # http entries: the reply JSON compares structurally (the php
        # harness normalizes text); error codes compare by class
        ca, cb = int(a.get("http_code", 0)), int(b.get("http_code", 0))
        if (ca >= 400) != (cb >= 400):
            return f"http code {ca} vs {cb}"
        if cb >= 400:
            return None   # both errors: text differs by engine
        try:
            ra = _strip_http_reply(json.loads(str(a.get("rows", ""))))
            rb = _strip_http_reply(json.loads(str(b.get("rows", ""))))
        except ValueError:
            ra, rb = a.get("rows"), b.get("rows")
        if loose_eq(ra, rb):
            return None
        import json as _j
        return (f"http reply mismatch\n  ours:  "
                f"{_j.dumps(ra, default=str)[:400]}\n  model: "
                f"{_j.dumps(rb, default=str)[:400]}")
    if isinstance(b, dict) and "error" in b and b["error"] \
            and isinstance(a, dict):
        # the reference records daemon-specific error TEXT; only the
        # error-ness is comparable across engines
        if a.get("error"):
            return None
        return f"expected an error ({b['error']!r}), got success"
    if isinstance(a, dict) and a.get("error") and isinstance(b, dict) \
            and not b.get("error"):
        return f"engine error: {a['error']!r}"
    if loose_eq(a, b):
        return None
    # ORDER-BY-less QL row sets may legitimately differ in order (the
    # reference returns percolate stored queries in hash order): retry as
    # a multiset keyed by the row's id
    _ql_norm = re.sub(r"within\s+group\s+order\s+by", "",
                      str(a.get("sphinxql", "")).lower()
                      if isinstance(a, dict) else "")
    if isinstance(a, dict) and isinstance(b, dict) \
            and "rows" in a and "rows" in b \
            and "order by" not in _ql_norm:
        def rows_list(x):
            r = x["rows"]
            return list(r.values()) if isinstance(r, dict) else list(r)

        def keyed(rows):
            return sorted(rows, key=lambda d: str(sorted(
                (str(k), str(v)) for k, v in dict(d).items()))
                if isinstance(d, dict) else str(d))
        a2 = dict(a)
        b2 = dict(b)
        a2["rows"] = keyed(rows_list(a))
        b2["rows"] = keyed(rows_list(b))
        if loose_eq(a2, b2):
            return None

    def _norm(x):
        if isinstance(x, dict):
            return {str(k): _norm(v) for k, v in x.items()}
        if isinstance(x, list):
            return [_norm(v) for v in x]
        return x

    return ("mismatch\n  ours:  %s\n  model: %s" % (
        json.dumps(_norm(a), default=str, sort_keys=True)[:2000],
        json.dumps(_norm(b), default=str, sort_keys=True)[:2000]))


def run_subtest(gt: GoldenTest, subtest: int, model_subtest: list,
                tmpdir: str) -> list[str]:
    """Run one variant combination; returns a list of per-query failure
    strings (empty = pass)."""
    if isinstance(model_subtest, list) and model_subtest == ["failed"]:
        return []    # the reference itself failed this variant; skip
    # every subtest is a fresh daemon: UidShort auto-ids restart at 1
    from manticoresearch_tpu.utils import uid as _uid
    _uid.reset()
    env = GoldenEnv(gt, subtest, tmpdir)
    failures: list[str] = []
    mi = 0
    for q in gt.queries:
        if q.type == "comment":
            continue
        for ours in env.run_query(q):
            if mi >= len(model_subtest):
                failures.append(
                    f"extra result past model end ({q.query[:60]!r})")
                break
            model = model_subtest[mi]
            mi += 1
            diff = compare_result(ours, model,
                                  "variant_match" in gt.requires)
            if diff:
                failures.append(f"query {mi - 1} ({q.query[:60]!r}): {diff}")
    if mi != len(model_subtest):
        failures.append(
            f"result count mismatch: engine produced {mi}, "
            f"model has {len(model_subtest)}")
    return failures
