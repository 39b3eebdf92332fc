"""Phrase operator + proximity_bm25 (LCS) ranker golden tests.

Hand-computed from the reference semantics:
- LCS FSM: RankerState_Proximity_fn (sphinxsearch.cpp:1320-1440)
- phrase docs carry the member terms' summed TFIDF (searchnode.cpp:3831)
- phrase nodes emit one ranker hit per occurrence at the phrase start with
  weight = word count (searchnode.cpp:3901-3930)
- weight = int((tfidf+0.5)*1000) + 1000 * sum_f lcs[f]*field_weight[f]
"""
import math

import pytest

from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
from manticoresearch_tpu.index.builder import IndexBuilder
from manticoresearch_tpu.schema import AttrDef, AttrType, Schema

import numpy as np

from tests.test_search import DOCS, ref_idf


def tfidf32(pairs):
    """Mirror the engine's float32 chain (the reference is also all-float32:
    logf/float in sphinxsearch.cpp): pairs of (tf, idf_f64)."""
    acc = np.float32(0)
    for tf, idf in pairs:
        tfq = np.float32(tf) / (np.float32(tf) + np.float32(1.2))
        acc = np.float32(acc + np.float32(tfq * np.float32(idf)))
    return acc


def bm25part32(pairs):
    return int(np.trunc((tfidf32(pairs) + np.float32(0.5)) * np.float32(1000)))


@pytest.fixture(scope="module")
def index():
    schema = Schema(
        fields=["title", "content"],
        attrs=[AttrDef("group_id", AttrType.UINT),
               AttrDef("group_id2", AttrType.UINT)],
    )
    b = IndexBuilder(schema)
    b.add_documents(DOCS)
    return SearchIndex(b.build())


class TestPhrase:
    def test_exact_phrase(self, index):
        r = index.search(SearchQuery(match='"test document"'))
        assert r.error is None
        assert [m.docid for m in r.matches] == [1, 2]
        # tfidf = member sum; lcs[content] = 2 (phrase hit weight 2)
        expect = bm25part32([(2, ref_idf(3, 4, 2)), (1, ref_idf(2, 4, 2))]) + 2 * 1000
        assert [m.weight for m in r.matches] == [expect, expect]

    def test_phrase_not_matching_scattered(self, index):
        # both words exist in doc4's index ("document" doesn't; "number four")
        r = index.search(SearchQuery(match='"number one"'))
        assert [m.docid for m in r.matches] == [1]

    def test_phrase_wrong_order(self, index):
        r = index.search(SearchQuery(match='"document test"'))
        assert r.matches == []

    def test_phrase_single_word_degenerates(self, index):
        r1 = index.search(SearchQuery(match='"groups"'))
        r2 = index.search(SearchQuery(match="groups"))
        assert [m.docid for m in r1.matches] == [m.docid for m in r2.matches]
        assert [m.weight for m in r1.matches] == [m.weight for m in r2.matches]


class TestProximityRanker:
    def test_and_adjacent_words_lcs(self, index):
        # doc1/doc2: title has 'test'@1; content 'test'@4 'document'@5 —
        # adjacent and in query order => lcs[content]=2, lcs[title]=1, rank 3
        r = index.search(SearchQuery(match="test document"))
        assert [m.docid for m in r.matches] == [1, 2]
        expect = bm25part32([(2, ref_idf(3, 4, 2)), (1, ref_idf(2, 4, 2))]) + 3 * 1000
        assert [m.weight for m in r.matches] == [expect, expect]

    def test_and_non_adjacent_lcs1(self, index):
        # 'doc number' both in doc4 title: doc@1 number@2 adjacent => lcs 2
        r = index.search(SearchQuery(match="doc number"))
        assert [m.docid for m in r.matches] == [4]
        assert r.matches[0].weight == bm25part32(
            [(1, ref_idf(2, 4, 2)), (1, ref_idf(3, 4, 2))]) + 2 * 1000

    def test_or_lcs_per_field(self, index):
        # 'one | two': doc1 matches 'one' in title+content => rank 2
        r = index.search(SearchQuery(match="one | two"))
        assert [m.docid for m in r.matches] == [1, 2]
        expect = bm25part32([(2, ref_idf(1, 4, 2))]) + 2 * 1000
        assert [m.weight for m in r.matches] == [expect, expect]

    def test_field_weights_scale_lcs(self, index):
        r = index.search(SearchQuery(match="test document",
                                     field_weights={"title": 10, "content": 3}))
        # lcs[title]=1*10, lcs[content]=2*3 => rank 16
        expect = bm25part32([(2, ref_idf(3, 4, 2)), (1, ref_idf(2, 4, 2))]) + 16 * 1000
        assert [m.weight for m in r.matches] == [expect, expect]

    def test_reversed_order_words_lcs1(self, index):
        # 'document test': reversed in doc => no chain, lcs 1 per field
        r = index.search(SearchQuery(match="document test"))
        assert [m.docid for m in r.matches] == [1, 2]
        # title: test only => lcs 1; content: document@5,test@4 no chain => 1
        expect = bm25part32([(1, ref_idf(2, 4, 2)), (2, ref_idf(3, 4, 2))]) + 2 * 1000
        assert [m.weight for m in r.matches] == [expect, expect]

    def test_three_word_chain(self, index):
        # "my test document": content 'my'@3 'test'@4 'document'@5 => lcs 3
        r = index.search(SearchQuery(match="my test document"))
        assert [m.docid for m in r.matches] == [1, 2]
        # content lcs=3; title: 'test'@1 => lcs 1 => rank 4
        expect = bm25part32([(1, ref_idf(2, 4, 3)), (2, ref_idf(3, 4, 3)),
                             (1, ref_idf(2, 4, 3))]) + 4 * 1000
        assert [m.weight for m in r.matches] == [expect, expect]

    def test_phrase_plus_extra_term(self, index):
        # '"test document" number': phrase hit (w=2,span=2) at content@4
        # (qpos1, delta 3, expdelta 3+2-1=4); 'number'@6 qpos3 has delta 3
        # != 4 => NOT linked per the FSM (sphinxsearch.cpp:1366 "why
        # spanlen??") — chain does not extend across a phrase node, so
        # lcs[content] = 2. Title 'test' hits are consumed by the phrase.
        r = index.search(SearchQuery(match='"test document" number'))
        assert [m.docid for m in r.matches] == [1, 2]
        expect = bm25part32([(2, ref_idf(3, 4, 3)), (1, ref_idf(2, 4, 3)),
                             (1, ref_idf(3, 4, 3))]) + 2 * 1000
        assert [m.weight for m in r.matches] == [expect, expect]


class TestProximityOperator:
    def test_proximity_adjacent_any_order(self, index):
        # "document test"~1: adjacent any order; doc1/2 content has
        # test@4 document@5 -> span 1 <= qlen(1)+1-1 = 1 => match
        r = index.search(SearchQuery(match='"document test"~1'))
        assert sorted(m.docid for m in r.matches) == [1, 2]

    def test_proximity_window_too_small(self, index):
        # 'my'@3 ... 'number'@6: span 3; "my number"~1 needs span <= 1
        r = index.search(SearchQuery(match='"my number"~1'))
        assert r.matches == []

    def test_proximity_window_large_enough(self, index):
        # span 3 <= qlen(1) + 3 - 1 = 3 => match
        r = index.search(SearchQuery(match='"my number"~3'))
        assert sorted(m.docid for m in r.matches) == [1, 2]

    def test_proximity_three_words(self, index):
        # doc1 content: my@3 test@4 document@5 number@6
        r = index.search(SearchQuery(match='"number my test"~2'))
        # need window span <= qlen(2)+2-1=3: positions {3,4,6} span 3 => ok
        assert sorted(m.docid for m in r.matches) == [1, 2]
        r = index.search(SearchQuery(match='"checking number test"~2'))
        # doc1: checking@9, number@6, test@4 span 5 > 3 => no match
        assert r.matches == []

    def test_proximity_cross_field_no_match(self, index):
        # 'one' in doc2? no. doc1 title 'test one'; content 'document';
        # "one document"~5 only matches if same field
        r = index.search(SearchQuery(match='"two document"~5'))
        # doc2: two@title2 and two@content7, document@content5: content has
        # two@7, document@5: span 2 <= 1+5-1 => match via content field
        assert sorted(m.docid for m in r.matches) == [2]


class TestNear:
    def test_near_window(self, index):
        # doc1/2 content: my@3 ... number@6 -> |delta| 3
        r = index.search(SearchQuery(match="my NEAR/3 number"))
        assert sorted(m.docid for m in r.matches) == [1, 2]
        r = index.search(SearchQuery(match="my NEAR/2 number"))
        assert r.matches == []

    def test_near_any_order(self, index):
        r = index.search(SearchQuery(match="document NEAR/1 test"))
        assert sorted(m.docid for m in r.matches) == [1, 2]

    def test_notnear(self, index):
        # test NOTNEAR/1 document: doc1/2 test@title1 qualifies (no document
        # in title); doc4 test@content4 (no document at all)
        r = index.search(SearchQuery(match="test NOTNEAR/1 document"))
        assert sorted(m.docid for m in r.matches) == [1, 2, 4]


class TestSentenceParagraph:
    @pytest.fixture(scope="class")
    def sp_index(self):
        from manticoresearch_tpu.text.tokenizer import TokenizerSettings
        schema = Schema(fields=["body"])
        # paragraph boundaries come from block-level tags under html_strip
        # (EnableParagraphs, sphinx.cpp:20385) — plain blank lines are NOT
        # paragraph breaks in the reference
        b = IndexBuilder(schema,
                         tokenizer_settings=TokenizerSettings(
                             index_sp=True, html_strip=True))
        b.add_documents([
            dict(id=1, body="The cat sat here. The dog ran away.<p>"
                            "A bird flew over the cat."),
            dict(id=2, body="Dogs and cats together in one sentence."),
            dict(id=3, body="No animals here at all. Nothing to see."),
        ])
        return SearchIndex(b.build())

    def test_sentence_same(self, sp_index):
        r = sp_index.search(SearchQuery(match="dogs SENTENCE cats"))
        assert [m.docid for m in r.matches] == [2]

    def test_sentence_split(self, sp_index):
        # doc1: 'cat' in sentence 1 & 3; 'dog' in sentence 2 only
        r = sp_index.search(SearchQuery(match="cat SENTENCE dog"))
        assert r.matches == []
        r = sp_index.search(SearchQuery(match="cat SENTENCE sat"))
        assert [m.docid for m in r.matches] == [1]
        r = sp_index.search(SearchQuery(match="bird SENTENCE cat"))
        assert [m.docid for m in r.matches] == [1]

    def test_paragraph(self, sp_index):
        # doc1: paragraph 1 has cat+dog; paragraph 2 has bird+cat
        r = sp_index.search(SearchQuery(match="cat PARAGRAPH dog"))
        assert [m.docid for m in r.matches] == [1]
        r = sp_index.search(SearchQuery(match="bird PARAGRAPH dog"))
        assert r.matches == []


class TestHandleDupes:
    """Duplicate query keywords (HANDLE_DUPES, sphinxsearch.cpp dupe path):
    each occurrence emits the keyword's hits at its own query position so
    LCS chains pass through repeated words."""

    @pytest.fixture(scope="class")
    def didx(self):
        from manticoresearch_tpu.exec.searcher import SearchIndex
        b = IndexBuilder(Schema(fields=["body"]))
        b.add_documents([
            dict(id=1, body="to be or not to be that is the question"),
            dict(id=2, body="be or not"),
            dict(id=3, body="to be something else to be"),
        ])
        return SearchIndex(b.build())

    def lcs_of(self, idx, q):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        r = idx.search(SearchQuery(match=q, ranker=("expr", "sum(lcs)")))
        assert r.error is None
        return {m.docid: m.weight for m in r.matches}

    def test_full_dup_chain(self, didx):
        # without dupes the best chain is 'to be or not' (4); with dupe
        # handling the whole 6-word prefix chains
        assert self.lcs_of(didx, "to be or not to be") == {1: 6}

    def test_no_dupes_unchanged(self, didx):
        assert self.lcs_of(didx, "be or not") == {1: 3, 2: 3}
        assert self.lcs_of(didx, "not or be") == {1: 2, 2: 1}

    def test_dup_pair(self, didx):
        # doc3 'to be ... to be': query 'to be to be' chains 2 (adjacent
        # pairs), not 4 (gap between the pairs)
        assert self.lcs_of(didx, "to be to be")[3] == 2
        assert self.lcs_of(didx, "to be to be")[1] == 2

    def test_wordcount_counts_per_occurrence(self, didx):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        r = didx.search(SearchQuery(match="to be or not to be",
                                    ranker="wordcount"))
        # qwords to,be,or,not,to,be over doc1 hits (2,2,1,1,2,2) = 10
        assert {m.docid: m.weight for m in r.matches}[1] == 10


class TestGeneralNear:
    """NEAR over phrases and chains (FSMmultinear over child nodes)."""

    @pytest.fixture(scope="class")
    def nidx(self):
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        docs = [
            # "red apple" phrase, 'juice' 2 words after the phrase end
            dict(id=1, content="red apple sweet tangy juice drink"),
            # phrase present, juice far away (9 words after)
            dict(id=2, content="red apple a b c d e f g h i juice"),
            # no phrase (words split)
            dict(id=3, content="red tasty apple juice"),
            # juice BEFORE the phrase, 2 words gap
            dict(id=4, content="juice of the red apple tree"),
            # chain test corpus
            dict(id=5, content="alpha beta gamma"),
            dict(id=6, content="alpha x x x x x beta gamma"),
        ]
        b = IndexBuilder(Schema(fields=["content"], attrs=[]))
        b.add_documents(docs)
        from manticoresearch_tpu.exec.searcher import SearchIndex
        return SearchIndex(b.build())

    def ids(self, idx, q):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        r = idx.search(SearchQuery(match=q))
        assert r.error is None, (q, r.error)
        return sorted(m.docid for m in r.matches)

    def test_phrase_near_term(self, nidx):
        assert self.ids(nidx, '"red apple" NEAR/4 juice') == [1, 4]
        assert self.ids(nidx, '"red apple" NEAR/10 juice') == [1, 2, 4]
        assert self.ids(nidx, '"red apple" NEAR/1 juice') == []

    def test_term_near_phrase(self, nidx):
        assert self.ids(nidx, 'juice NEAR/4 "red apple"') == [1, 4]

    def test_near_chain(self, nidx):
        assert self.ids(nidx, "alpha NEAR/2 beta NEAR/2 gamma") == [5]
        assert self.ids(nidx, "alpha NEAR/6 beta NEAR/2 gamma") == [5, 6]


class TestBigrams:
    """bigram_index: 2-word phrases answered by pair terms; weights must
    be IDENTICAL to the non-bigram index (anchors are the same)."""

    def _build(self, bigram, docs, **tok):
        from manticoresearch_tpu.exec.searcher import SearchIndex
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        from manticoresearch_tpu.text.tokenizer import TokenizerSettings
        ts = TokenizerSettings(bigram_index=bigram, **tok)
        b = IndexBuilder(Schema(fields=["c"], attrs=[]), ts)
        b.add_documents(docs)
        return SearchIndex(b.build())

    DOCS = [
        dict(id=1, c="the quick brown fox jumps"),
        dict(id=2, c="quick thinking saves the brown bear"),
        dict(id=3, c="a fox and a bear"),
        dict(id=4, c="quick brown quick brown"),
    ]

    def test_bigram_all_matches_plain(self):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        plain = self._build("", self.DOCS)
        bg = self._build("all", self.DOCS)
        # the plan actually uses the pair term
        cq = bg.plan(SearchQuery(match='"quick brown"'))
        assert cq.sig.expr[0] == "bigram_phrase", cq.sig.expr
        assert "quick brown" in cq.slot_terms
        for q in ('"quick brown"', '"brown fox"', '"a fox"',
                  'fox | "brown bear"'):
            a = plain.search(SearchQuery(match=q, limit=10))
            b = bg.search(SearchQuery(match=q, limit=10))
            assert a.error is None and b.error is None
            assert [(m.docid, m.weight) for m in a.matches] == \
                   [(m.docid, m.weight) for m in b.matches], q

    def test_freq_modes(self):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        bg = self._build("first_freq", self.DOCS,
                         bigram_freq_words=("the", "a"))
        cq = bg.plan(SearchQuery(match='"the quick"'))
        assert cq.sig.expr[0] == "bigram_phrase"
        cq2 = bg.plan(SearchQuery(match='"quick brown"'))
        assert cq2.sig.expr[0] == "phrase"     # 'quick' not a freq word
        r = bg.search(SearchQuery(match='"the quick"'))
        assert [m.docid for m in r.matches] == [1]
