"""Snippets / highlighting: query-aware passage extraction.

Behavioral model: SnippetBuilder_c (/root/reference/src/sphinxexcerpt.h:110,
sphinxexcerpt.cpp + snippetfunctor/stream/passage, ~4800 LoC): tokenize the
source text with the index's tokenizer, mark query-term matches, select
passages around matches (around-words window, char limit), merge overlaps,
order by weight or appearance, wrap matches in before/after tags, join with
the chunk separator. Runs host-side over final top-k docs only (the
reference also post-processes — CALL SNIPPETS / HIGHLIGHT()).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..text.dictionary import Dictionary
from ..text.tokenizer import Tokenizer


@dataclass
class SnippetOptions:
    before_match: str = "<b>"
    after_match: str = "</b>"
    chunk_separator: str = " ... "
    limit: int = 256              # max snippet size in chars
    around: int = 5               # words on each side of a match
    limit_passages: int = 0       # 0 = unlimited
    limit_words: int = 0
    exact_phrase: bool = False
    use_boundaries: bool = False
    weight_order: bool = False    # order passages by weight vs appearance
    allow_empty: bool = False     # return "" when no match (else doc start)
    no_match_size: int = 256      # chars of doc start when no match


def _query_terms(query: str, tokenizer: Tokenizer, dictionary: Dictionary
                 ) -> list[str]:
    """Flatten the query into its match terms (operators ignored — the
    reference's snippet generator also highlights bag-of-words unless
    query_mode is set)."""
    import re
    words = re.sub(r'[()|!\-"~/@^$<=]+', " ", query)
    out = []
    for t in tokenizer.tokenize(words):
        for term in dictionary.process(t.text):
            if not term.startswith("="):
                out.append(term)
    return out


def build_snippet(text: str, query: str, tokenizer: Tokenizer,
                  dictionary: Dictionary,
                  opts: SnippetOptions | None = None) -> str:
    opts = opts or SnippetOptions()
    terms = set(_query_terms(query, tokenizer, dictionary))
    tokens = tokenizer.tokenize(text)

    matched = []
    for i, t in enumerate(tokens):
        processed = dictionary.process(t.text)
        if any(p in terms for p in processed):
            matched.append(i)

    if opts.exact_phrase:
        phrase = _query_terms(query, tokenizer, dictionary)
        matched = _phrase_positions(tokens, dictionary, phrase)

    if not matched:
        if opts.allow_empty:
            return ""
        clip = text[: opts.no_match_size]
        if len(text) > opts.no_match_size:
            clip = clip.rsplit(" ", 1)[0] + opts.chunk_separator.rstrip()
        return clip

    # passages: [start_tok, end_tok] windows around match clusters
    spans: list[list[int]] = []
    for mi in matched:
        lo = max(0, mi - opts.around)
        hi = min(len(tokens) - 1, mi + opts.around)
        if spans and lo <= spans[-1][1] + 1:
            spans[-1][1] = hi
            spans[-1][2].append(mi)
        else:
            spans.append([lo, hi, [mi]])

    if opts.limit_passages:
        # keep best passages by number of matches (weight order), then
        # restore appearance order
        ranked = sorted(range(len(spans)),
                        key=lambda i: (-len(spans[i][2]), i))
        keep = sorted(ranked[: opts.limit_passages])
        spans = [spans[i] for i in keep]

    pieces: list[str] = []
    total = 0
    for lo, hi, matches in spans:
        start_c = tokens[lo].start
        end_c = tokens[hi].end
        # budget check (approximate, like the reference's char limit)
        plen = end_c - start_c
        if opts.limit and total + plen > opts.limit and pieces:
            break
        total += plen
        out = []
        cur = start_c
        for mi in matches:
            t = tokens[mi]
            out.append(text[cur:t.start])
            out.append(opts.before_match + text[t.start:t.end]
                       + opts.after_match)
            cur = t.end
        out.append(text[cur:end_c])
        pieces.append("".join(out))

    snippet = opts.chunk_separator.join(pieces)
    if spans[0][0] > 0:
        snippet = opts.chunk_separator.lstrip() + snippet
    if spans[-1][1] < len(tokens) - 1:
        snippet = snippet + opts.chunk_separator.rstrip()
    return snippet


def _phrase_positions(tokens, dictionary, phrase: list[str]) -> list[int]:
    if not phrase:
        return []
    out = []
    n = len(phrase)
    toks = [dictionary.process(t.text) for t in tokens]
    for i in range(len(tokens) - n + 1):
        if all(phrase[j] in toks[i + j] for j in range(n)):
            out.extend(range(i, i + n))
    return sorted(set(out))
