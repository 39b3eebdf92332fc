"""Expression ranker (OPTION ranker=expr) + BM25F factors."""
import pytest

from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
from manticoresearch_tpu.exec.session import Catalog, Session
from manticoresearch_tpu.index.builder import IndexBuilder
from manticoresearch_tpu.schema import AttrDef, AttrType, Schema

from tests.test_search import DOCS


@pytest.fixture(scope="module")
def index():
    schema = Schema(fields=["title", "content"],
                    attrs=[AttrDef("group_id", AttrType.UINT)])
    b = IndexBuilder(schema)
    b.add_documents(DOCS)
    return SearchIndex(b.build())


class TestExprRanker:
    def test_default_formula_equals_builtin(self, index):
        """sum(lcs*user_weight)*1000+bm25 IS the proximity_bm25 definition
        (sphinxsearch.cpp expr ranker docs) — must match exactly."""
        r1 = index.search(SearchQuery(match="test document"))
        r2 = index.search(SearchQuery(
            match="test document",
            ranker=("expr", "sum(lcs*user_weight)*1000+bm25")))
        assert [(m.docid, m.weight) for m in r1.matches] == \
               [(m.docid, m.weight) for m in r2.matches]

    def test_bm25f(self, index):
        r = index.search(SearchQuery(
            match="test document", ranker=("expr", "bm25f(1.2, 0.7)*1000")))
        assert r.error is None
        assert len(r.matches) == 2

    def test_bm25f_field_weights(self, index):
        r = index.search(SearchQuery(
            match="test document",
            ranker=("expr", "bm25f(1.2, 0.7, {title=5, content=1})*1000")))
        assert r.error is None

    def test_count_factors(self, index):
        r = index.search(SearchQuery(
            match="test", ranker=("expr", "sum(hit_count)*10 + "
                                          "doc_word_count")))
        assert {m.docid: m.weight for m in r.matches} == {1: 21, 2: 21, 4: 11}

    def test_field_mask_word_count(self, index):
        r = index.search(SearchQuery(
            match="test one", ranker=("expr", "field_mask*100 + "
                                              "sum(word_count)")))
        # doc1: both words in title (mask includes title+content for test,
        # one in title+content) => field_mask 3; word_count t=2,c=2 => 304
        assert r.matches[0].weight == 304

    def test_sql_option_ranker_expr(self):
        s = Session(Catalog())
        for q in s.execute("CREATE TABLE t (body text)"):
            assert q.error is None
        s.execute("INSERT INTO t (id, body) VALUES (1, 'aa bb cc'), "
                  "(2, 'aa aa bb')")
        r = s.execute("SELECT id, weight() FROM t WHERE MATCH('aa bb') "
                      "OPTION ranker=expr('sum(hit_count)*100')")[0]
        assert r.error is None
        assert r.rows == [(2, 300), (1, 200)]

    def test_min_hit_pos(self, index):
        r = index.search(SearchQuery(
            match="number", ranker=("expr", "sum(min_hit_pos)")))
        # doc1/2: number@content6; doc4: number@title2
        assert {m.docid: m.weight for m in r.matches} == {1: 6, 2: 6, 4: 2}
