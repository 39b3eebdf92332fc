"""Text pipeline tests: charset folding, tokenizer, morphology, dictionary.

Modeled on the reference's gtests_tokenizer.cpp / gtests_text.cpp coverage
(SURVEY §4): folding parity cases, token boundaries, min/max word length,
Porter stemmer vectors.
"""
import numpy as np
import pytest

from manticoresearch_tpu.text.charset import (CharsetError, get_lowercaser,
                                              parse_charset_spec)
from manticoresearch_tpu.text.dictionary import Dictionary, DictSettings
from manticoresearch_tpu.text.morphology import porter_stem, soundex
from manticoresearch_tpu.text.tokenizer import Tokenizer, TokenizerSettings


class TestCharset:
    def test_english_alias(self):
        lc = get_lowercaser("english")
        folded = lc.fold_str("Hello WORLD")
        assert folded.tolist() == [
            ord(c) if c != " " else 0 for c in "hello world"
        ]

    def test_explicit_ranges(self):
        lc = get_lowercaser("a..z, A..Z->a..z, 0..9, _")
        assert lc.fold_str("Ab_9 ?").tolist() == [
            ord("a"), ord("b"), ord("_"), ord("9"), 0, 0
        ]

    def test_default_non_cjk_accents(self):
        lc = get_lowercaser()
        # U+00C9 (É) -> e, U+00F1 (ñ) -> n per non_cjk.txt
        assert lc.fold_str("É").tolist() == [ord("e")]
        assert lc.fold_str("ñ").tolist() == [ord("n")]
        # Russian upper -> lower
        assert lc.fold_str("Ж").tolist() == [ord("ж")]

    def test_single_remap(self):
        lc = get_lowercaser("a..z, U+0041->U+0061")
        assert lc.fold_str("A").tolist() == [ord("a")]
        assert lc.fold_str("B").tolist() == [0]

    def test_checkerboard(self):
        # U+0100..U+012F/2 : Ā->ā etc.
        lc = get_lowercaser("U+0100..U+012F/2")
        assert lc.fold_str("Ā").tolist() == [0x0101]
        assert lc.fold_str("ā").tolist() == [0x0101]

    def test_stray_comma_rejected(self):
        with pytest.raises(CharsetError):
            parse_charset_spec(", a..z")

    def test_dest_below_space_rejected(self):
        with pytest.raises(CharsetError):
            parse_charset_spec("a->U+01")

    def test_length_mismatch_rejected(self):
        with pytest.raises(CharsetError):
            parse_charset_spec("a..c->a..b")


class TestTokenizer:
    def test_basic(self):
        t = Tokenizer()
        toks = t.tokenize("Hello, World! This is a test.")
        assert [x.text for x in toks] == ["hello", "world", "this", "is", "a", "test"]
        assert [x.position for x in toks] == [1, 2, 3, 4, 5, 6]

    def test_numbers_and_punct(self):
        t = Tokenizer()
        assert t.tokenize_terms("year-2024 v1.5") == ["year", "2024", "v1", "5"]

    def test_min_word_len(self):
        t = Tokenizer(TokenizerSettings(min_word_len=3))
        toks = t.tokenize("a bb ccc dddd")
        assert [x.text for x in toks] == ["ccc", "dddd"]
        # overshort tokens still advance positions by overshort_step=1
        assert [x.position for x in toks] == [3, 4]

    def test_max_word_len_clip(self):
        t = Tokenizer()
        long = "x" * 100
        toks = t.tokenize(long)
        assert len(toks) == 1
        assert toks[0].text == "x" * 42  # SPH_MAX_WORD_LEN

    def test_accents_fold(self):
        t = Tokenizer()
        assert t.tokenize_terms("Café UPPER") == ["cafe", "upper"]

    def test_empty(self):
        t = Tokenizer()
        assert t.tokenize("") == []
        assert t.tokenize("...!!!") == []


class TestMorphology:
    # classic Porter vectors (matches the reference's stem_en behavior for
    # plain words; sphinxstemen.cpp implements the same 1980 algorithm)
    @pytest.mark.parametrize("word,stem", [
        ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
        ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
        ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
        ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
        ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
        ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
        ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
        ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
        ("conditional", "condit"), ("rational", "ration"),
        ("valenci", "valenc"), ("hesitanci", "hesit"),
        ("digitizer", "digit"), ("conformabli", "conform"),
        ("radicalli", "radic"), ("differentli", "differ"),
        ("vileli", "vile"), ("analogousli", "analog"),
        ("vietnamization", "vietnam"), ("predication", "predic"),
        ("operator", "oper"), ("feudalism", "feudal"),
        ("decisiveness", "decis"), ("hopefulness", "hope"),
        ("callousness", "callous"), ("formaliti", "formal"),
        ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
        ("triplicate", "triplic"), ("formative", "form"),
        ("formalize", "formal"), ("electriciti", "electr"),
        ("electrical", "electr"), ("hopeful", "hope"),
        ("goodness", "good"), ("revival", "reviv"),
        ("allowance", "allow"), ("inference", "infer"),
        ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
        ("adjustable", "adjust"), ("defensible", "defens"),
        ("irritant", "irrit"), ("replacement", "replac"),
        ("adjustment", "adjust"), ("dependent", "depend"),
        ("adoption", "adopt"), ("homologou", "homolog"),
        ("communism", "commun"), ("activate", "activ"),
        ("angulariti", "angular"), ("homologous", "homolog"),
        ("effective", "effect"), ("bowdlerize", "bowdler"),
        ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
        ("controll", "control"), ("roll", "roll"),
    ])
    def test_porter(self, word, stem):
        assert porter_stem(word) == stem

    def test_soundex(self):
        # reference stem_soundex (sphinxsoundex.cpp) — NOT standard
        # Soundex: codes collapse across vowels ('z'/'k' both 2 in
        # tymczak merge), golden-verified against test_012 models
        assert soundex("robert") == "r163"
        assert soundex("rupert") == "r163"
        assert soundex("tymczak") == "t520"
        assert soundex("admin") == "a350"


class TestDictionary:
    def test_stopwords(self):
        d = Dictionary(DictSettings(stopwords=frozenset({"the", "a"})))
        assert d.process("the") == []
        assert d.process("cat") == ["cat"]

    def test_morphology_chain(self):
        d = Dictionary(DictSettings(morphology=("stem_en",)))
        assert d.process("running") == ["run"]

    def test_exact_words(self):
        d = Dictionary(DictSettings(morphology=("stem_en",), index_exact_words=True))
        assert d.process("running") == ["run", "=running"]

    def test_wordforms_priority_over_morph(self):
        d = Dictionary(DictSettings(
            morphology=("stem_en",), wordforms=(("running", "jog"),)
        ))
        assert d.process("running") == ["jog"]


class TestRussianAndMetaphone:
    def test_stem_ru(self):
        from manticoresearch_tpu.text.morphology import get_morph
        ru = get_morph("stem_ru")
        assert ru("книги") == ru("книгами") == "книг"
        assert ru("красивый") == ru("красивая") == "красив"

    def test_metaphone(self):
        from manticoresearch_tpu.text.morphology import get_morph
        mp = get_morph("metaphone")
        # Double Metaphone primary codes, UPPERCASE (stem_dmetaphone,
        # sphinxmetaphone.cpp; golden-verified against test_012 models)
        assert mp("knight") == mp("night") == "NT"
        assert mp("phone") == "FN"
        assert mp("admin") == "ATMN"
        assert mp("smith") == "SM0"
        assert mp("xavier") == "SF"

    def test_stem_enru_dispatch(self):
        from manticoresearch_tpu.text.morphology import get_morph
        m = get_morph("stem_enru")
        assert m("running") == "run"
        assert m("книги") == "книг"

    def test_russian_index_search(self):
        from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        from manticoresearch_tpu.text.dictionary import DictSettings
        b = IndexBuilder(Schema(fields=["t"]),
                         dict_settings=DictSettings(morphology=("stem_ru",)))
        b.add_documents([
            dict(id=1, t="красивые книги"),
            dict(id=2, t="старый дом"),
        ])
        idx = SearchIndex(b.build())
        r = idx.search(SearchQuery(match="книга"))
        assert [m.docid for m in r.matches] == [1]


class TestHtmlStrip:
    def test_basic_strip(self):
        from manticoresearch_tpu.text.htmlstrip import strip_html
        assert strip_html("<p>hello <b>world</b></p>").split() == \
            ["hello", "world"]

    def test_entities(self):
        from manticoresearch_tpu.text.htmlstrip import strip_html
        assert strip_html("fish &amp; chips &lt;now&gt;").split() == \
            ["fish", "&", "chips", "<now>"]

    def test_comments_and_decls(self):
        from manticoresearch_tpu.text.htmlstrip import strip_html
        s = strip_html("<!DOCTYPE html><!-- secret -->visible<?php x ?>")
        assert s.split() == ["visible"]

    def test_remove_elements(self):
        from manticoresearch_tpu.text.htmlstrip import strip_html
        s = strip_html("a<style>p {color: red}</style>b"
                       "<script>var x=1;</script>c",
                       remove_elements=("style", "script"))
        assert s.split() == ["a", "b", "c"]

    def test_index_attrs(self):
        from manticoresearch_tpu.text.htmlstrip import (parse_index_attrs,
                                                        strip_html)
        ia = parse_index_attrs("img=alt,title; a=title")
        s = strip_html('x <img src="u.png" alt="red cat" title=pet> y '
                       '<a href="z" title="link name">go</a>',
                       index_attrs=ia)
        words = s.split()
        assert words == ["x", "red", "cat", "pet", "y", "link", "name", "go"]

    def test_tag_as_separator(self):
        from manticoresearch_tpu.text.htmlstrip import strip_html
        # no space around tags: tag boundary still separates tokens
        assert strip_html("one<br>two").split() == ["one", "two"]

    def test_tokenizer_integration(self):
        from manticoresearch_tpu.text.tokenizer import (Tokenizer,
                                                        TokenizerSettings)
        tok = Tokenizer(TokenizerSettings(
            html_strip=True, html_remove_elements=("script",)))
        terms = [t.text for t in tok.tokenize(
            "<h1>Big Title</h1><script>bad()</script><p>body&nbsp;text</p>")]
        assert terms == ["big", "title", "body", "text"]
        # fast path agrees
        fast_terms, _ = tok.tokenize_fast(
            "<h1>Big Title</h1><script>bad()</script><p>body&nbsp;text</p>")
        assert fast_terms == terms

    def test_end_to_end_search_not_matching_markup(self):
        from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        from manticoresearch_tpu.text.tokenizer import TokenizerSettings
        b = IndexBuilder(Schema(fields=["body"]),
                         TokenizerSettings(html_strip=True))
        b.add_documents([
            dict(id=1, body="<b>apple</b> <i>pie</i>"),
            dict(id=2, body="<div class=apple>banana</div>"),
        ])
        idx = SearchIndex(b.build())
        r = idx.search(SearchQuery(match="apple"))
        # doc2's 'apple' is markup (a class attr), not content
        assert [m.docid for m in r.matches] == [1]
        r = idx.search(SearchQuery(match='"apple pie"'))
        assert [m.docid for m in r.matches] == [1]


class TestTokenizerFeatures:
    """Round-2 tokenizer tail: exceptions, blend_chars, phrase_boundary,
    regexp_filter (sphinx.cpp:2671-4875)."""

    def test_regexp_filter(self):
        from manticoresearch_tpu.text.tokenizer import (Tokenizer,
                                                        TokenizerSettings)
        t = Tokenizer(TokenizerSettings(
            regexp_filter=(r"(\d+)\s*[Gg][Bb] => \1gb",)))
        assert [tk.text for tk in t.tokenize("8 GB ram")] == ["8gb", "ram"]

    def test_exceptions_single(self):
        from manticoresearch_tpu.text.tokenizer import (Tokenizer,
                                                        TokenizerSettings)
        t = Tokenizer(TokenizerSettings(synonyms=("AT & T => AT&T",)))
        toks = t.tokenize("call AT & T now")
        assert [(tk.text, tk.position) for tk in toks] == \
            [("call", 1), ("at&t", 2), ("now", 3)]

    def test_exceptions_case_and_boundary(self):
        from manticoresearch_tpu.text.tokenizer import (Tokenizer,
                                                        TokenizerSettings)
        t = Tokenizer(TokenizerSettings(synonyms=("C++ => cplusplus",)))
        assert [tk.text for tk in t.tokenize("I like C++ a lot")] == \
            ["i", "like", "cplusplus", "a", "lot"]
        # case-sensitive source: "c++" does not match
        assert [tk.text for tk in t.tokenize("i like c++")] == \
            ["i", "like", "c"]

    def test_exception_not_inside_word(self):
        from manticoresearch_tpu.text.tokenizer import (Tokenizer,
                                                        TokenizerSettings)
        t = Tokenizer(TokenizerSettings(synonyms=("US => usa",)))
        assert [tk.text for tk in t.tokenize("US bonds")] == ["usa", "bonds"]
        # 'US' inside 'BUST' must not match
        assert [tk.text for tk in t.tokenize("BUST it")] == ["bust", "it"]

    def test_blend_chars(self):
        from manticoresearch_tpu.text.tokenizer import (Tokenizer,
                                                        TokenizerSettings)
        t = Tokenizer(TokenizerSettings(blend_chars="@, &"))
        toks = t.tokenize("email @twitter today")
        # whole blended token and first sub-token share a position
        assert [(tk.text, tk.position) for tk in toks] == \
            [("email", 1), ("@twitter", 2), ("twitter", 2), ("today", 3)]
        toks2 = t.tokenize("m&m rocks")
        assert [(tk.text, tk.position) for tk in toks2] == \
            [("m&m", 1), ("m", 1), ("m", 2), ("rocks", 3)]

    def test_blend_mode_trims(self):
        from manticoresearch_tpu.text.tokenizer import (Tokenizer,
                                                        TokenizerSettings)
        t = Tokenizer(TokenizerSettings(
            blend_chars="@", blend_mode="trim_none, trim_head"))
        toks = t.tokenize("@user")
        assert [(tk.text, tk.position) for tk in toks] == \
            [("@user", 1), ("user", 1)]

    def test_phrase_boundary(self):
        from manticoresearch_tpu.text.tokenizer import (Tokenizer,
                                                        TokenizerSettings)
        t = Tokenizer(TokenizerSettings(
            phrase_boundary="., ?, !", phrase_boundary_step=10))
        toks = t.tokenize("one two. three")
        assert [(tk.text, tk.position) for tk in toks] == \
            [("one", 1), ("two", 2), ("three", 13)]

    def test_phrase_boundary_breaks_phrase_match(self):
        from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        from manticoresearch_tpu.text.tokenizer import TokenizerSettings
        schema = Schema(fields=["content"], attrs=[])
        b = IndexBuilder(schema, tokenizer_settings=TokenizerSettings(
            phrase_boundary=".", phrase_boundary_step=100))
        b.add_documents([
            dict(id=1, content="hello world again"),
            dict(id=2, content="hello. world again"),
        ])
        idx = SearchIndex(b.build())
        r = idx.search(SearchQuery(match='"hello world"'))
        assert [m.docid for m in r.matches] == [1]

    def test_blend_search_end_to_end(self):
        from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        from manticoresearch_tpu.text.tokenizer import TokenizerSettings
        schema = Schema(fields=["content"], attrs=[])
        ts = TokenizerSettings(blend_chars="&")
        b = IndexBuilder(schema, tokenizer_settings=ts)
        b.add_documents([
            dict(id=1, content="mm candy from m&m is great"),
            dict(id=2, content="m and m separately"),
        ])
        idx = SearchIndex(b.build())
        # sub-token matches both docs, blended whole form only doc 1
        r1 = idx.search(SearchQuery(match="m"))
        assert {m.docid for m in r1.matches} == {1, 2}
        r2 = idx.search(SearchQuery(match="m&m"))
        assert [m.docid for m in r2.matches] == [1]


class TestLibstemmerPack:
    """Snowball language pack (libstemmer analog, SURVEY #52): golden
    stems per language + config-name aliases + end-to-end search."""

    GOLDEN = {
        "libstemmer_german": [("aufeinanderschlugen", "aufeinanderschlug"),
                              ("häuser", "haus"), ("laufen", "lauf")],
        "libstemmer_fr": [("continuellement", "continuel"),
                          ("mangeaient", "mang")],
        "stem_es": [("torcedores", "torcedor"), ("fácilmente", "facil")],
        "stem_it": [("abbandonata", "abbandon"),
                    ("rapidamente", "rapid")],
        "libstemmer_swedish": [("jaktkarlarne", "jaktkarl"),
                               ("stockholmare", "stockholm")],
        "stem_da": [("indtagelsen", "indtag")],
        "stem_no": [("havnedistriktene", "havnedistrikt")],
        "stem_pt": [("jabuticabeiras", "jabuticabeir")],
        "stem_nl": [("lichamelijkheden", "licham")],
        "stem_fi": [("kolmekymmentä", "kolmekymmen")],
    }

    def test_golden_stems(self):
        from manticoresearch_tpu.text.morphology import get_morph
        for name, pairs in self.GOLDEN.items():
            m = get_morph(name)
            for word, want in pairs:
                assert m(word) == want, (name, word)

    def test_unknown_morph_raises(self):
        import pytest as _pytest
        from manticoresearch_tpu.text.morphology import get_morph
        with _pytest.raises(ValueError):
            get_morph("stem_xx")
        with _pytest.raises(ValueError):
            get_morph("libstemmer_klingon")

    def test_german_search_end_to_end(self):
        from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        from manticoresearch_tpu.text.dictionary import DictSettings
        schema = Schema(fields=["content"], attrs=[])
        b = IndexBuilder(schema,
                         dict_settings=DictSettings(
                             morphology=("libstemmer_de",)))
        b.add_documents([
            dict(id=1, content="die häuser am see"),
            dict(id=2, content="ein haus im wald"),
            dict(id=3, content="wir laufen schnell"),
        ])
        idx = SearchIndex(b.build())
        # 'haus' and 'häuser' stem identically -> both docs match
        r = idx.search(SearchQuery(match="haus"))
        assert {m.docid for m in r.matches} == {1, 2}
        r2 = idx.search(SearchQuery(match="lief")) # different stem: no hit
        assert r2.matches == []
        r3 = idx.search(SearchQuery(match="laufe"))
        assert {m.docid for m in r3.matches} == {3}
