"""HTML stripper (html_strip / html_remove_elements / html_index_attrs).

Behavioral model: CSphHTMLStripper (/root/reference/src/sphinx.h:1672 and
its implementation in sphinx.cpp): remove tags/comments/PIs/DOCTYPE, decode
character entities, drop the *contents* of elements listed in
html_remove_elements (e.g. style, script), and inject the values of
attributes listed in html_index_attrs ("img=alt,title; a=title") as
indexable text. Tags are replaced by whitespace so token boundaries and
positions behave as if the markup were separators.
"""
from __future__ import annotations

import html
import re

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_DECL = re.compile(r"<![^>]*>")
_PI = re.compile(r"<\?.*?\?>", re.S)
_TAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:[^>\"']|\"[^\"]*\"|"
                  r"'[^']*')*)>")
_ATTR = re.compile(r"([a-zA-Z][a-zA-Z0-9:_-]*)\s*=\s*(\"[^\"]*\"|'[^']*'|"
                   r"[^\s>]+)")


def parse_index_attrs(spec: str) -> dict[str, tuple[str, ...]]:
    """Parse 'img=alt,title; a=title' into {tag: (attrs...)}."""
    out: dict[str, tuple[str, ...]] = {}
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        tag, _, attrs = part.partition("=")
        out[tag.strip().lower()] = tuple(
            a.strip().lower() for a in attrs.split(",") if a.strip())
    return out


def strip_html(text: str, remove_elements: tuple[str, ...] = (),
               index_attrs: dict[str, tuple[str, ...]] | None = None,
               zones: tuple[str, ...] = (), with_zones: bool = False):
    """Strip markup. With `zones` + `with_zones=True`, also returns zone
    events [(name, open_char_off, close_char_off), ...] with offsets into
    the RETURNED text (CSphHTMLStripper's MAGIC_CODE_ZONE emission
    repackaged as explicit spans; entities inside zones are left encoded so
    offsets stay valid — zone content is re-unescaped by the caller's
    tokenizer charset fold, which ignores '&').

    Note: when zones are requested, entity decoding is skipped (offsets
    must map 1:1); zone-indexed fields should not rely on entities."""
    if "<" not in text and "&" not in text:
        return (text, []) if with_zones else text
    index_attrs = index_attrs or {}
    removed = {e.strip().lower() for e in remove_elements if e.strip()}
    zone_set = {z.strip().lower() for z in zones if z.strip()}
    # index_zones supports trailing-star patterns ("z_*", h*):
    # sphinx.cpp zone-name wildcards
    zone_pats = tuple(z[:-1] for z in zone_set if z.endswith("*"))
    zone_set = {z for z in zone_set if not z.endswith("*")}

    def _is_zone(nm: str) -> bool:
        return nm in zone_set or any(nm.startswith(p) for p in zone_pats)

    text = _COMMENT.sub(" ", text)
    text = _CDATA.sub(r" \1 ", text)
    text = _PI.sub(" ", text)
    text = _DECL.sub(" ", text)

    out: list[str] = []
    out_len = 0
    open_zones: list[tuple[str, int]] = []
    events: list[tuple[str, int, int]] = []

    def emit(s: str):
        nonlocal out_len
        out.append(s)
        out_len += len(s)

    i = 0
    skip_until: str | None = None   # inside a removed element's content
    for m in _TAG.finditer(text):
        if skip_until is None:
            emit(text[i:m.start()])
        closing, name, attrs_raw = m.group(1), m.group(2).lower(), m.group(3)
        i = m.end()
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
            continue
        if _is_zone(name):
            if not closing:
                open_zones.append((name, out_len))
            else:
                for j in range(len(open_zones) - 1, -1, -1):
                    if open_zones[j][0] == name:
                        events.append((name, open_zones[j][1], out_len))
                        del open_zones[j]
                        break
        if not closing and name in removed:
            # self-closing removed element has no content to skip
            if not attrs_raw.rstrip().endswith("/"):
                skip_until = name
            emit(" ")
            continue
        if not closing and name in index_attrs:
            wanted = index_attrs[name]
            for am in _ATTR.finditer(attrs_raw):
                if am.group(1).lower() in wanted:
                    v = am.group(2)
                    if v[:1] in "\"'":
                        v = v[1:-1]
                    emit(" " + v + " ")
        emit(" ")
    if skip_until is None:
        emit(text[i:])
    for name, off in open_zones:        # unclosed zones run to the end
        events.append((name, off, out_len))
    result = "".join(out)
    if with_zones:
        return result, events
    return html.unescape(result)
