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
               index_attrs: dict[str, tuple[str, ...]] | None = None) -> str:
    if "<" not in text and "&" not in text:
        return text
    index_attrs = index_attrs or {}
    removed = {e.strip().lower() for e in remove_elements if e.strip()}

    text = _COMMENT.sub(" ", text)
    text = _CDATA.sub(r" \1 ", text)
    text = _PI.sub(" ", text)
    text = _DECL.sub(" ", text)

    out: list[str] = []
    i = 0
    skip_until: str | None = None   # inside a removed element's content
    for m in _TAG.finditer(text):
        if skip_until is None:
            out.append(text[i:m.start()])
        closing, name, attrs_raw = m.group(1), m.group(2).lower(), m.group(3)
        i = m.end()
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
            continue
        if not closing and name in removed:
            # self-closing removed element has no content to skip
            if not attrs_raw.rstrip().endswith("/"):
                skip_until = name
            out.append(" ")
            continue
        if not closing and name in index_attrs:
            wanted = index_attrs[name]
            for am in _ATTR.finditer(attrs_raw):
                if am.group(1).lower() in wanted:
                    v = am.group(2)
                    if v[:1] in "\"'":
                        v = v[1:-1]
                    out.append(" " + v + " ")
        out.append(" ")
    if skip_until is None:
        out.append(text[i:])
    return html.unescape("".join(out))
