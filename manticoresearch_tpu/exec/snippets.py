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
    before_match: str = "<b>"     # %PASSAGE_ID% macro supported
    after_match: str = "</b>"
    chunk_separator: str = " ... "
    limit: int = 256              # max snippet size in chars
    around: int = 5               # words on each side of a match
    limit_passages: int = 0       # 0 = unlimited
    limit_words: int = 0          # total words across passages
    exact_phrase: bool = False
    use_boundaries: bool = False
    weight_order: bool = False    # order passages by weight vs appearance
    allow_empty: bool = False     # return "" when no match (else doc start)
    no_match_size: int = 256      # chars of doc start when no match
    start_passage_id: int = 1     # %PASSAGE_ID% counter start
    force_all_words: bool = False  # ignore limit until all words shown
    passage_boundary: str = ""    # "sentence" | "paragraph": clamp spans
    html_strip_mode: str = "index"  # "none"|"strip"|"index"|"retain"


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
    if opts.html_strip_mode == "strip":
        from ..text.htmlstrip import strip_html
        text = strip_html(text, (), {})
    terms = set(_query_terms(query, tokenizer, dictionary))
    tokens = tokenizer.tokenize(text)

    matched = []
    matched_terms: dict[int, set] = {}
    for i, t in enumerate(tokens):
        processed = dictionary.process(t.text)
        hit = [p for p in processed if p in terms]
        if hit:
            matched.append(i)
            matched_terms[i] = set(hit)

    if opts.exact_phrase:
        phrase = _query_terms(query, tokenizer, dictionary)
        matched = _phrase_positions(tokens, dictionary, phrase)
        matched_terms = {i: {tokens[i].text} for i in matched}

    if not matched:
        if opts.allow_empty:
            return ""
        clip = text[: opts.no_match_size]
        if len(text) > opts.no_match_size:
            clip = clip.rsplit(" ", 1)[0] + opts.chunk_separator.rstrip()
        return clip

    # sentence/paragraph clamping window (passage_boundary): a passage
    # never crosses a boundary (PassageContext_t boundary modes)
    bounds: list[int] = []
    if opts.passage_boundary in ("sentence", "paragraph"):
        marks = ".!?" if opts.passage_boundary == "sentence" else "\n"
        for i, t in enumerate(tokens[:-1]):
            gap = text[t.end: tokens[i + 1].start]
            if (opts.passage_boundary == "paragraph" and "\n\n" in gap) or \
               (opts.passage_boundary == "sentence"
                    and any(c in gap for c in marks)):
                bounds.append(i)

    def clamp(lo, hi, mi):
        for b in bounds:
            if lo <= b < mi:
                lo = b + 1
            if mi <= b < hi:
                hi = b
                break
        return lo, hi

    # passages: [start_tok, end_tok] windows around match clusters
    spans: list[list] = []
    for mi in matched:
        lo = max(0, mi - opts.around)
        hi = min(len(tokens) - 1, mi + opts.around)
        if bounds:
            lo, hi = clamp(lo, hi, mi)
        if spans and lo <= spans[-1][1] + 1:
            spans[-1][1] = max(hi, spans[-1][1])
            spans[-1][2].append(mi)
        else:
            spans.append([lo, hi, [mi]])

    def weight(sp):
        # unique terms squared + raw hits (passage weighting spirit:
        # unique query words dominate, sphinxexcerpt passage rank)
        uniq = set()
        for mi in sp[2]:
            uniq |= matched_terms.get(mi, set())
        return len(uniq) * 100 + len(sp[2])

    if opts.limit_passages:
        ranked = sorted(range(len(spans)),
                        key=lambda i: (-weight(spans[i]), i))
        keep = sorted(ranked[: opts.limit_passages])
        spans = [spans[i] for i in keep]

    # force_all_words: keep adding passages (best-first) until every
    # query term is covered, regardless of the char limit
    order = list(range(len(spans)))
    if opts.weight_order or opts.force_all_words:
        order.sort(key=lambda i: (-weight(spans[i]), i))

    chosen: list[int] = []
    total = 0
    words = 0
    covered: set = set()
    for oi in order:
        lo, hi, matches = spans[oi]
        plen = tokens[hi].end - tokens[lo].start
        new_terms = set()
        for mi in matches:
            new_terms |= matched_terms.get(mi, set())
        need_for_cover = opts.force_all_words and not (new_terms <= covered)
        if chosen and not need_for_cover:
            if opts.limit and total + plen > opts.limit:
                if opts.weight_order or opts.force_all_words:
                    continue
                break
            if opts.limit_words and words + (hi - lo + 1) > opts.limit_words:
                continue
        total += plen
        words += hi - lo + 1
        covered |= new_terms
        chosen.append(oi)
        if opts.force_all_words and covered >= terms and \
                opts.limit and total >= opts.limit:
            break
    if not opts.weight_order:
        chosen.sort()                      # appearance order output
    spans = [spans[i] for i in chosen]

    pieces: list[str] = []
    pid = opts.start_passage_id
    for lo, hi, matches in spans:
        start_c = tokens[lo].start
        end_c = tokens[hi].end
        before = opts.before_match.replace("%PASSAGE_ID%", str(pid))
        after = opts.after_match.replace("%PASSAGE_ID%", str(pid))
        pid += 1
        out = []
        cur = start_c
        for mi in matches:
            t = tokens[mi]
            out.append(text[cur:t.start])
            out.append(before + text[t.start:t.end] + after)
            cur = t.end
        out.append(text[cur:end_c])
        pieces.append("".join(out))

    snippet = opts.chunk_separator.join(pieces)
    if spans and spans[0][0] > 0:
        snippet = opts.chunk_separator.lstrip() + snippet
    if spans and spans[-1][1] < len(tokens) - 1:
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
