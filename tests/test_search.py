"""End-to-end single-shard search tests with hand-computed golden weights.

Corpus = the reference's example.sql documents table (4 docs). Golden weights
computed by hand from the exact reference formulas (SURVEY.md Appendix A):
  idf = log((N-n+1)/n) / (2*log(1+N)) / num_query_words
  tfidf_doc = sum over matched terms of tf/(tf+1.2) * idf
  bm25part = int((tfidf + 0.5) * 1000)
  weight (WeightSum/bm25 ranker) = bm25part + 1000 * sum(matched field weights)
"""
import math

import numpy as np
import pytest

from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
from manticoresearch_tpu.index.builder import IndexBuilder
from manticoresearch_tpu.query.planner import AttrFilterDef
from manticoresearch_tpu.schema import AttrDef, AttrType, Schema

DOCS = [
    dict(id=1, group_id=1, group_id2=5, title="test one",
         content="this is my test document number one. also checking "
                 "search within phrases."),
    dict(id=2, group_id=1, group_id2=6, title="test two",
         content="this is my test document number two"),
    dict(id=3, group_id=2, group_id2=7, title="another doc",
         content="this is another group"),
    dict(id=4, group_id=2, group_id2=8, title="doc number four",
         content="this is to test groups"),
]


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


def ref_idf(df, n_total, n_qwords=1):
    n = max(n_total, df)
    return math.log((n - df + 1) / df) / (2 * math.log(1 + n)) / n_qwords


def bm25part(tfidf):
    return int((tfidf + 0.5) * 1000)


class TestSingleTerm:
    def test_match_test(self, index):
        r = index.search(SearchQuery(match="test"))
        assert r.error is None
        assert [m.docid for m in r.matches] == [1, 2, 4]
        idf = ref_idf(3, 4)
        w12 = bm25part(2 / 3.2 * idf) + 2000   # tf=2, both fields matched
        w4 = bm25part(1 / 2.2 * idf) + 1000    # tf=1, content only
        assert [m.weight for m in r.matches] == [w12, w12, w4]
        assert r.total_found == 3
        assert r.word_stats[0].word == "test"
        assert r.word_stats[0].docs == 3
        assert r.word_stats[0].hits == 5

    def test_missing_term(self, index):
        r = index.search(SearchQuery(match="zzzmissing"))
        assert r.matches == [] and r.total_found == 0

    def test_case_folding(self, index):
        r = index.search(SearchQuery(match="TEST"))
        assert [m.docid for m in r.matches] == [1, 2, 4]


class TestBoolean:
    def test_implicit_and(self, index):
        r = index.search(SearchQuery(match="test one"))
        assert [m.docid for m in r.matches] == [1]
        idf_test = ref_idf(3, 4, 2)
        idf_one = ref_idf(1, 4, 2)
        tfidf = 2 / 3.2 * idf_test + 2 / 3.2 * idf_one
        # proximity_bm25 LCS: title "test one" adjacent => lcs[title]=2,
        # content test@4/one@7 => lcs[content]=1, rank 3
        assert r.matches[0].weight == bm25part(tfidf) + 3000

    def test_or(self, index):
        r = index.search(SearchQuery(match="groups | phrases"))
        assert sorted(m.docid for m in r.matches) == [1, 4]

    def test_not(self, index):
        r = index.search(SearchQuery(match="test -two"))
        assert [m.docid for m in r.matches] == [1, 4]

    def test_and_or_precedence(self, index):
        # OR binds tighter: test (one | groups)
        r = index.search(SearchQuery(match="test one | groups"))
        assert sorted(m.docid for m in r.matches) == [1, 4]

    def test_parens(self, index):
        r = index.search(SearchQuery(match="(one | two) document"))
        assert sorted(m.docid for m in r.matches) == [1, 2]

    def test_field_limit(self, index):
        r = index.search(SearchQuery(match="@title test"))
        assert sorted(m.docid for m in r.matches) == [1, 2]

    def test_quorum(self, index):
        r = index.search(SearchQuery(match='"this my document test"/3'))
        assert sorted(m.docid for m in r.matches) == [1, 2]


class TestFilters:
    def test_eq(self, index):
        r = index.search(SearchQuery(
            match="test",
            filters=[AttrFilterDef("group_id", "values", values=[1])]))
        assert [m.docid for m in r.matches] == [1, 2]

    def test_range(self, index):
        r = index.search(SearchQuery(
            match="",
            filters=[AttrFilterDef("group_id2", "range_i", lo=6, hi=7)]))
        assert sorted(m.docid for m in r.matches) == [2, 3]

    def test_exclude(self, index):
        r = index.search(SearchQuery(
            match="test",
            filters=[AttrFilterDef("group_id", "values", values=[1],
                                   exclude=True)]))
        assert [m.docid for m in r.matches] == [4]

    def test_fullscan_all(self, index):
        r = index.search(SearchQuery(match=""))
        assert [m.docid for m in r.matches] == [1, 2, 3, 4]
        assert r.total_found == 4


class TestOrderingPaging:
    def test_order_by_attr_desc(self, index):
        r = index.search(SearchQuery(
            match="", sort=[("group_id2", False)]))
        assert [m.docid for m in r.matches] == [4, 3, 2, 1]

    def test_order_by_attr_asc(self, index):
        r = index.search(SearchQuery(match="test", sort=[("group_id2", True)]))
        assert [m.docid for m in r.matches] == [1, 2, 4]

    def test_limit_offset(self, index):
        r = index.search(SearchQuery(match="", limit=2, offset=1))
        assert [m.docid for m in r.matches] == [2, 3]
        assert r.total_found == 4

    def test_attrs_hydrated(self, index):
        r = index.search(SearchQuery(match="test one"))
        attrs = r.matches[0].attrs
        assert attrs["group_id"] == 1 and attrs["group_id2"] == 5
        # stored fields (docstore) hydrate too
        assert attrs["title"] == "test one"


class TestDelete:
    def test_delete_doc(self):
        schema = Schema(fields=["title", "content"],
                        attrs=[AttrDef("group_id", AttrType.UINT),
                               AttrDef("group_id2", AttrType.UINT)])
        b = IndexBuilder(schema)
        b.add_documents(DOCS)
        idx = SearchIndex(b.build())
        assert idx.delete_documents([2]) == 1
        r = idx.search(SearchQuery(match="test"))
        assert [m.docid for m in r.matches] == [1, 4]
        # idempotent
        assert idx.delete_documents([2]) == 0


class TestRankers:
    def test_ranker_none(self, index):
        r = index.search(SearchQuery(match="test", ranker="none"))
        assert all(m.weight == 1 for m in r.matches)

    def test_ranker_wordcount(self, index):
        # weight = sum of field_weight per hit: doc1 'test' hits title+content
        r = index.search(SearchQuery(match="test", ranker="wordcount"))
        assert r.error is None
        w = {m.docid: m.weight for m in r.matches}
        assert w[1] == 2 and w[2] == 2 and w[4] == 1
        r = index.search(SearchQuery(match="test", ranker="wordcount",
                                     field_weights={"title": 10, "content": 3}))
        w = {m.docid: m.weight for m in r.matches}
        assert w[1] == 13 and w[4] == 3

    def test_ranker_fieldmask(self, index):
        r = index.search(SearchQuery(match="test", ranker="fieldmask"))
        w = {m.docid: m.weight for m in r.matches}
        assert w[1] == 3 and w[4] == 2  # title|content vs content only

    def test_ranker_matchany(self, index):
        r = index.search(SearchQuery(match="test one", ranker="matchany"))
        assert r.error is None
        assert [m.docid for m in r.matches] == [1]
        # phraseK = (1+1)*2 = 4; title: mask {test,one} cnt 2 lcs 2 ->
        # (2 + 1*4)*1 = 6; content: cnt 2 lcs 1 -> (2+0)*1 = 2; rank 8
        assert r.matches[0].weight == 8


class TestMva:
    @pytest.fixture(scope="class")
    def mva_index(self):
        schema = Schema(fields=["t"],
                        attrs=[AttrDef("tags", AttrType.MVA)])
        b = IndexBuilder(schema)
        # the example.sql tags table pattern
        b.add_documents([
            dict(id=1, t="one", tags=[1, 3, 5, 7]),
            dict(id=2, t="two", tags=[6, 4, 2]),
            dict(id=3, t="three", tags=[15]),
            dict(id=4, t="four", tags=[7, 40]),
        ])
        return SearchIndex(b.build())

    def test_mva_any_value(self, mva_index):
        r = mva_index.search(SearchQuery(
            match="", filters=[AttrFilterDef("tags", "values", values=[7])]))
        assert [m.docid for m in r.matches] == [1, 4]

    def test_mva_any_multi_values(self, mva_index):
        r = mva_index.search(SearchQuery(
            match="", filters=[AttrFilterDef("tags", "values",
                                             values=[2, 15])]))
        assert [m.docid for m in r.matches] == [2, 3]

    def test_mva_any_range(self, mva_index):
        r = mva_index.search(SearchQuery(
            match="", filters=[AttrFilterDef("tags", "range_i",
                                             lo=10, hi=20)]))
        assert [m.docid for m in r.matches] == [3]

    def test_mva_all(self, mva_index):
        r = mva_index.search(SearchQuery(
            match="", filters=[AttrFilterDef("tags", "mva_all",
                                             values=[1, 5])]))
        assert [m.docid for m in r.matches] == [1]

    def test_mva_exclude(self, mva_index):
        r = mva_index.search(SearchQuery(
            match="", filters=[AttrFilterDef("tags", "values", values=[7],
                                             exclude=True)]))
        assert [m.docid for m in r.matches] == [2, 3]

    def test_mva_hydrates(self, mva_index):
        r = mva_index.search(SearchQuery(match="one"))
        assert r.matches[0].attrs["tags"] == [1, 3, 5, 7]


class TestFieldStartEnd:
    def test_field_start(self, index):
        # ^test: 'test' must be the first token of a field
        r = index.search(SearchQuery(match="^test"))
        assert sorted(m.docid for m in r.matches) == [1, 2]  # titles
        r = index.search(SearchQuery(match="^this"))
        assert sorted(m.docid for m in r.matches) == [1, 2, 3, 4]

    def test_field_end(self, index):
        # two$: last token of a field (doc2 title 'test two', content '...two')
        r = index.search(SearchQuery(match="two$"))
        assert [m.docid for m in r.matches] == [2]
        r = index.search(SearchQuery(match="four$"))
        assert [m.docid for m in r.matches] == [4]

    def test_start_and_field_limit(self, index):
        r = index.search(SearchQuery(match="@content ^this"))
        assert sorted(m.docid for m in r.matches) == [1, 2, 3, 4]
        r = index.search(SearchQuery(match="@title ^this"))
        assert r.matches == []


class TestManyTerms:
    """>32 unique terms: multi-word termmask planes (slot s -> word s>>5)."""

    @pytest.fixture(scope="class")
    def bigindex(self):
        from manticoresearch_tpu.text.dictionary import DictSettings
        schema = Schema(fields=["content"],
                        attrs=[AttrDef("gid", AttrType.UINT)])
        b = IndexBuilder(schema,
                         dict_settings=DictSettings(min_prefix_len=1))
        docs = []
        for d in range(50):
            # doc d contains words w{d} and w{d+1} .. plus shared "common"
            words = [f"w{d:03d}", f"w{(d + 1) % 50:03d}", "common"]
            docs.append(dict(id=d + 1, gid=d % 4, content=" ".join(words)))
        b.add_documents(docs)
        return SearchIndex(b.build())

    # wildcard tests need expansion enabled (min_prefix_len, like the
    # reference: wildcards are off unless prefix/infix indexing is on)

    def test_or_over_40_terms(self, bigindex):
        q = " | ".join(f"w{i:03d}" for i in range(40))
        r = bigindex.search(SearchQuery(match=q, limit=60, ranker="none"))
        assert r.error is None
        # doc d holds w{d}, w{(d+1)%50}: matches for d in 0..39, plus
        # d=49 whose second word wraps to w000
        want = set(range(1, 41)) | {50}
        assert {m.docid for m in r.matches} == want

    def test_wildcard_expansion_over_32(self, bigindex):
        r = bigindex.search(SearchQuery(match="w0*", limit=60,
                                        ranker="none"))
        assert r.error is None
        # w000..w049 all start with w0 -> every doc matches
        assert len(r.matches) == 50

    def test_expansion_limit(self, bigindex):
        r = bigindex.search(SearchQuery(match="w0*", limit=60, ranker="none",
                                        expansion_limit=2))
        assert r.error is None
        # only w000, w001 expanded -> docs 1, 2, 50 (w000) and 1,2 (w001)
        assert {m.docid for m in r.matches} == {1, 2, 50}

    def test_quorum_and_bm25_over_32(self, bigindex):
        q = '"%s"/2' % " ".join(f"w{i:03d}" for i in range(40))
        r = bigindex.search(SearchQuery(match=q, limit=60))
        assert r.error is None
        # quorum >= 2: docs whose BOTH words are in w000..w039 -> d=0..38
        assert {m.docid for m in r.matches} == set(range(1, 40))


class TestMaybe:
    """MAYBE: matches follow the left arm; the right arm boosts rank when
    present (ExtMaybe, searchnode.cpp)."""

    @pytest.fixture(scope="class")
    def midx(self):
        schema = Schema(fields=["content"], attrs=[])
        b = IndexBuilder(schema)
        b.add_documents([
            dict(id=1, content="apple pie with cream"),
            dict(id=2, content="apple tart plain"),
            dict(id=3, content="cream only here"),
            dict(id=4, content="unrelated words entirely"),
        ])
        return SearchIndex(b.build())

    def test_maybe_match_set(self, midx):
        r = midx.search(SearchQuery(match="apple MAYBE cream"))
        assert r.error is None
        # matching = left arm only: doc 3 (cream only) must NOT match
        assert {m.docid for m in r.matches} == {1, 2}

    def test_maybe_boosts_weight(self, midx):
        r = midx.search(SearchQuery(match="apple MAYBE cream"))
        w = {m.docid: m.weight for m in r.matches}
        rb = midx.search(SearchQuery(match="apple"))
        wb = {m.docid: m.weight for m in rb.matches}
        # doc1 (has cream) gains rank over the bare query; doc2 unchanged
        # relative ordering: doc1 must now outrank doc2
        assert w[1] > w[2]
        assert r.matches[0].docid == 1
        # the MAYBE arm's tfidf flows into the weight of doc1
        assert wb[1] == wb[2]   # bare query can't split the pair
        idf_apple = ref_idf(2, 4, 2)
        idf_cream = ref_idf(2, 4, 2)
        # doc1: both words tf=1 -> tfidf = (1/2.2)*(idf_a+idf_c);
        # apple@1 cream@4 not adjacent -> lcs rank 1
        want1 = bm25part(1 / 2.2 * (idf_apple + idf_cream)) + 1000
        assert w[1] == want1


class TestFilterFirstPreselection:
    """FT queries with a selective numeric filter run over the filter's
    secondary-index window (CreateFilteredIterator ∩ term postings,
    secondaryindex.h:36) — results must equal the term-first path."""

    @pytest.fixture(scope="class")
    def ffindex(self):
        schema = Schema(fields=["content"],
                        attrs=[AttrDef("year", AttrType.UINT)])
        b = IndexBuilder(schema)
        rng = np.random.RandomState(4)
        docs = []
        for i in range(1, 3001):
            words = ["common"] * 3 + [f"w{rng.randint(40):02d}"]
            docs.append(dict(id=i, content=" ".join(words),
                             year=2000 + (i % 100)))
        b.add_documents(docs)
        return SearchIndex(b.build())

    def test_ft_filter_first_parity(self, ffindex, monkeypatch):
        # year window of ~60 rows vs 'common' df=3000: filter-first wins
        filt = [AttrFilterDef("year", "range_i", lo=2003, hi=2004)]
        for match, ranker in (("common", "bm25"),
                              ("common w07", "bm25"),
                              ("common | w03", "none"),
                              ("common -w05", "bm25"),
                              ("common", "proximity_bm25")):
            q = SearchQuery(match=match, filters=filt, ranker=ranker,
                            limit=50)
            monkeypatch.setenv("MT_SPARSE", "never")
            ffindex._plan_cache.clear()
            base = ffindex.search(q)
            monkeypatch.setenv("MT_SPARSE", "auto")
            ffindex._plan_cache.clear()
            fast = ffindex.search(q)
            assert base.error is None and fast.error is None
            assert [(m.docid, m.weight) for m in base.matches] == \
                [(m.docid, m.weight) for m in fast.matches], (match, ranker)
            assert base.total_found == fast.total_found

    def test_ft_filter_first_plan_selected(self, ffindex, monkeypatch):
        monkeypatch.setenv("MT_SPARSE", "auto")
        ffindex._plan_cache.clear()
        q = SearchQuery(match="common", filters=[
            AttrFilterDef("year", "range_i", lo=2003, hi=2004)],
            ranker="bm25", limit=10)
        cq = ffindex.plan(q)
        assert cq.sig.scan_index == "year"    # filter-first engaged
