"""UTF-8 tokenizer: charset folding + word-run splitting.

Behavioral model: the reference's CSphTokenizer_UTF8 family
(/root/reference/src/sphinx.cpp:2671-4875): codepoints fold through the
charset table (0 = separator); a token is a maximal run of word codepoints,
clipped at SPH_MAX_WORD_LEN=42 codepoints (sphinx.h:106); tokens shorter than
min_word_len are skipped but still advance the position counter by
overshort_step. Positions are 1-based within each field (Hitman packing keeps
the field id out of band here — the index builder packs it).

Implementation is vectorized numpy (single-core host): fold all codepoints at
once, find run boundaries with a diff, slice tokens out. N-gram (CJK) chars
each become their own single-codepoint token (ngram_len=1 semantics).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .charset import DEFAULT_CHARSET, get_lowercaser, parse_charset_spec

SPH_MAX_WORD_LEN = 42  # reference sphinx.h:106


@dataclass(frozen=True)
class TokenizerSettings:
    charset_table: str = DEFAULT_CHARSET
    min_word_len: int = 1
    ngram_chars: str = ""  # charset spec of chars to split as 1-grams
    ngram_len: int = 1
    overshort_step: int = 1
    index_sp: bool = False  # detect sentence/paragraph boundaries (index_sp)
    html_strip: bool = False
    html_remove_elements: tuple = ()     # e.g. ("style", "script")
    html_index_attrs: str = ""           # e.g. "img=alt,title; a=title"
    index_zones: tuple = ()              # zone tag names (ZONE operator)

    def key(self) -> tuple:
        return (
            self.charset_table,
            self.min_word_len,
            self.ngram_chars,
            self.ngram_len,
            self.overshort_step,
            self.index_sp,
            self.html_strip,
            self.html_remove_elements,
            self.html_index_attrs,
            self.index_zones,
        )


@dataclass
class Token:
    text: str
    position: int
    start: int = 0      # char offset of the raw token in the source text
    end: int = 0        # char offset past the raw token


class Tokenizer:
    def __init__(self, settings: TokenizerSettings | None = None):
        self.settings = settings or TokenizerSettings()
        self._lc = get_lowercaser(self.settings.charset_table)
        self._ngram_set: np.ndarray | None = None
        if self.settings.ngram_chars:
            ranges = parse_charset_spec(self.settings.ngram_chars)
            pts = []
            for r in ranges:
                pts.extend(range(r.start, r.end + 1))
            self._ngram_set = np.array(sorted(pts), dtype=np.int32)
        self._strip = None
        if self.settings.html_strip:
            from .htmlstrip import parse_index_attrs, strip_html
            ia = parse_index_attrs(self.settings.html_index_attrs)
            rm = tuple(self.settings.html_remove_elements)
            self._strip = lambda t: strip_html(t, rm, ia)
            if self.settings.index_zones:
                zn = tuple(self.settings.index_zones)
                self._strip_z = lambda t: strip_html(t, rm, ia, zones=zn,
                                                     with_zones=True)

    def _is_ngram(self, codes: np.ndarray) -> np.ndarray:
        if self._ngram_set is None or len(self._ngram_set) == 0:
            return np.zeros(len(codes), dtype=bool)
        idx = np.searchsorted(self._ngram_set, codes)
        idx_c = np.clip(idx, 0, len(self._ngram_set) - 1)
        return self._ngram_set[idx_c] == codes

    def _native_fold_table(self):
        if not hasattr(self, "_fold_dense"):
            top = min(max((r.end for r in self._lc.ranges), default=0) + 1,
                      0x110000)
            dense = self._lc.fold(np.arange(top, dtype=np.int32))
            self._fold_dense = np.ascontiguousarray(dense, dtype=np.int32)
        return self._fold_dense

    def tokenize(self, text: str) -> list[Token]:
        """Tokenize one field; returns tokens with 1-based positions."""
        if self._strip is not None:
            text = self._strip(text)
        if self._ngram_set is None:
            from ..native import get_native_lib
            lib = get_native_lib()
            if lib is not None:
                return self._tokenize_native(lib, text)
        folded = self._lc.fold_str(text)
        if len(folded) == 0:
            return []
        is_word = folded > 0
        is_ngram = self._is_ngram(folded) & is_word

        out: list[Token] = []
        pos = 0
        n = len(folded)
        # run boundaries over the word mask, ngram chars break runs
        # breaks[i] true => position i starts a new run
        starts = []
        ends = []
        prev_word = np.concatenate(([False], is_word[:-1]))
        prev_ngram = np.concatenate(([False], is_ngram[:-1]))
        run_start = is_word & (~prev_word | is_ngram | prev_ngram)
        next_word = np.concatenate((is_word[1:], [False]))
        next_ngram = np.concatenate((is_ngram[1:], [False]))
        run_end = is_word & (~next_word | is_ngram | next_ngram)
        starts = np.flatnonzero(run_start)
        ends = np.flatnonzero(run_end)
        assert len(starts) == len(ends)

        min_len = self.settings.min_word_len
        ov = self.settings.overshort_step
        for s, e in zip(starts.tolist(), ends.tolist()):
            length = e - s + 1
            if length < min_len:
                pos += ov
                continue
            pos += 1
            clipped = folded[s : s + min(length, SPH_MAX_WORD_LEN)]
            out.append(
                Token(clipped.astype(np.uint32).tobytes().decode("utf-32-le"),
                      pos, s, e + 1)
            )
        return out

    def tokenize_with_zones(self, text: str):
        """Tokenize + zone spans: returns (tokens, [(zone, open_char_off,
        close_char_off)]) with offsets into the stripped text — token
        start/end offsets live in the same space, so the index builder can
        map spans to token positions."""
        if getattr(self, "_strip_z", None) is None:
            return self.tokenize(text), []
        stripped, events = self._strip_z(text)
        saved = self._strip
        self._strip = None         # already stripped
        try:
            toks = self.tokenize(stripped)
        finally:
            self._strip = saved
        return toks, events

    def _native_buffers(self, n: int):
        """Reusable scratch buffers + cached ctypes pointers (the per-call
        pointer casts dominate for short query strings otherwise)."""
        import ctypes

        # NOTE: buffers are per-Tokenizer; ctypes calls drop the GIL, so
        # concurrent threads must hold _native_mutex around the native call
        cur = getattr(self, "_buf_cap", 0)
        if n + 1 > cur:
            import threading
            cap = max(n + 1, 4096)
            P = ctypes.POINTER(ctypes.c_int32)
            self._bufs = [np.empty(cap, np.int32) for _ in range(6)]
            self._buf_ptrs = [b.ctypes.data_as(P) for b in self._bufs]
            fold = self._native_fold_table()
            self._fold_ptr = fold.ctypes.data_as(P)
            self._fold_len = len(fold)
            self._buf_cap = cap
            if not hasattr(self, "_native_mutex"):
                self._native_mutex = threading.Lock()
        return self._bufs, self._buf_ptrs

    def _tokenize_native(self, lib, text: str) -> list[Token]:
        """C++ fast path (native/tokenizer.cpp): UTF-8 decode + fold + split
        in one pass; token strings sliced out of the folded buffer here."""
        raw = text.encode("utf-8")
        if not raw:
            return []
        n = len(raw)
        (codes, toff, tlen, tpos, tcs, tce), ptrs = self._native_buffers(n)
        cap = self._buf_cap

        cnt = lib.mt_tokenize(
            raw, n, self._fold_ptr, self._fold_len,
            self.settings.min_word_len, self.settings.overshort_step,
            ptrs[0], cap, ptrs[1], ptrs[2], ptrs[3],
            ptrs[4], ptrs[5], cap)
        if not cnt:
            return []
        # bulk-decode the whole folded buffer once, slice tokens as strings
        total = int(toff[cnt - 1] + tlen[cnt - 1])
        big = codes[:total].astype(np.uint32).tobytes().decode("utf-32-le")
        toff_l = toff[:cnt].tolist()
        tlen_l = tlen[:cnt].tolist()
        tpos_l = tpos[:cnt].tolist()
        tcs_l = tcs[:cnt].tolist()
        tce_l = tce[:cnt].tolist()
        return [
            Token(big[o:o + ln], p, cs, ce)
            for o, ln, p, cs, ce in zip(toff_l, tlen_l, tpos_l, tcs_l, tce_l)
        ]

    def tokenize_fast(self, text: str):
        """Builder fast path: returns (terms list[str], positions list[int])
        without Token objects. Falls back to tokenize() when native code or
        plain settings are unavailable."""
        if self._ngram_set is None:
            from ..native import get_native_lib
            lib = get_native_lib()
            if lib is not None:
                if self._strip is not None:
                    text = self._strip(text)
                return self._tokenize_native_fast(lib, text)
        toks = self.tokenize(text)
        return [t.text for t in toks], [t.position for t in toks]

    def _tokenize_native_fast(self, lib, text: str):
        raw = text.encode("utf-8")
        if not raw:
            return [], []
        n = len(raw)
        (codes, toff, tlen, tpos, tcs, tce), ptrs = self._native_buffers(n)
        cap = self._buf_cap

        with self._native_mutex:
            cnt = lib.mt_tokenize(
                raw, n, self._fold_ptr, self._fold_len,
                self.settings.min_word_len, self.settings.overshort_step,
                ptrs[0], cap, ptrs[1], ptrs[2], ptrs[3],
                ptrs[4], ptrs[5], cap)
            if not cnt:
                return [], []
            total = int(toff[cnt - 1] + tlen[cnt - 1])
            big = codes[:total].astype(np.uint32).tobytes().decode("utf-32-le")
            toff_l = toff[:cnt].tolist()
            tlen_l = tlen[:cnt].tolist()
            pos_l = tpos[:cnt].tolist()
        return ([big[o:o + ln] for o, ln in zip(toff_l, tlen_l)], pos_l)

    def tokenize_terms(self, text: str) -> list[str]:
        return [t.text for t in self.tokenize(text)]
