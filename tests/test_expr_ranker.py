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


class TestIdfFactors:
    def test_single_term_idf_identities(self, index):
        """For a single-keyword query sum_idf == min_idf == max_idf in every
        matched field — exact f32 identity."""
        r = index.search(SearchQuery(
            match="one",
            ranker=("expr", "sum((sum_idf-min_idf)+(sum_idf-max_idf))"
                            "*1000 + 7")))
        assert {m.docid: m.weight for m in r.matches} == {1: 7}

    def test_min_max_idf_ordering(self, index):
        # doc1 matches both 'test' (df=3, negative idf) and 'one' (df=1,
        # positive idf) in both fields -> max_idf > min_idf in both
        r = index.search(SearchQuery(
            match="test one",
            ranker=("expr", "sum(max_idf > min_idf)")))
        assert {m.docid: m.weight for m in r.matches} == {1: 2}

    def test_sum_idf_value(self, index):
        import numpy as np
        from tests.test_search import ref_idf
        idf = np.float32(ref_idf(1, 4))     # 'one', df=1, N=4
        per_field = idf                      # S=1: sum(seen*idf) == idf
        total = np.float32(np.float32(per_field + per_field)
                           * np.float32(1000))
        r = index.search(SearchQuery(
            match="one", ranker=("expr", "sum(sum_idf)*1000")))
        assert {m.docid: m.weight for m in r.matches} == {1: int(total)}


class TestExactOrder:
    def test_in_order(self, index):
        # doc1/doc2 content: test@4 < document@5 -> content ordered, title
        # lacks 'document' -> per-doc sum == 1
        r = index.search(SearchQuery(
            match="test document", ranker=("expr", "sum(exact_order)")))
        assert {m.docid: m.weight for m in r.matches} == {1: 1, 2: 1}

    def test_reversed_query_not_ordered(self, index):
        r = index.search(SearchQuery(
            match="document test", ranker=("expr", "sum(exact_order)")))
        assert {m.docid: m.weight for m in r.matches} == {1: 0, 2: 0}

    def test_non_adjacent_still_ordered(self, index):
        # doc1 content: test@4 ... one@7 (gap) -> still exact order; title
        # test@1 one@2 also ordered -> sum == 2
        r = index.search(SearchQuery(
            match="test one", ranker=("expr", "sum(exact_order)")))
        assert {m.docid: m.weight for m in r.matches} == {1: 2}


class TestSph04:
    def test_sph04_golden(self, index):
        from tests.test_proximity import bm25part32
        from tests.test_search import ref_idf
        idf = ref_idf(3, 4)  # 'test'
        # doc1/doc2: title lcs1 @pos1 (field-start, not exact: len>1) -> 6;
        # content lcs1 @pos4 -> 4; rank 10. tf=2 across doc.
        w12 = 10 * 1000 + bm25part32([(2, idf)])
        w4 = 4 * 1000 + bm25part32([(1, idf)])   # doc4: content test@4
        r = index.search(SearchQuery(match="test", ranker="sph04"))
        assert {m.docid: m.weight for m in r.matches} == \
               {1: w12, 2: w12, 4: w4}

    def test_sph04_exact_hit_boost(self):
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        b = IndexBuilder(Schema(fields=["title"]))
        b.add_documents([dict(id=1, title="hello"),
                         dict(id=2, title="hello world")])
        idx = SearchIndex(b.build())
        r = idx.search(SearchQuery(match="hello", ranker="sph04"))
        w = {m.docid: m.weight for m in r.matches}
        # doc1: 4+2+1=7 (exact field); doc2: 4+2+0=6 -> 1000 apart
        assert w[1] - w[2] == 1000


class TestLccs:
    def test_lccs_query_order_sensitive(self, index):
        # doc1/2 content: test@4 document@5 with qpos 1,2 -> chain of 2;
        # title has only 'test' -> 1; sum = 3
        r = index.search(SearchQuery(
            match="test document", ranker=("expr", "sum(lccs)")))
        assert {m.docid: m.weight for m in r.matches} == {1: 3, 2: 3}
        # reversed query: doc positions advance but query positions don't
        r = index.search(SearchQuery(
            match="document test", ranker=("expr", "sum(lccs)")))
        assert {m.docid: m.weight for m in r.matches} == {1: 2, 2: 2}

    def test_lccs_single_term(self, index):
        r = index.search(SearchQuery(
            match="number", ranker=("expr", "sum(lccs)")))
        # number appears once per doc in one field -> 1 everywhere
        assert {m.docid: m.weight for m in r.matches} == {1: 1, 2: 1, 4: 1}

    def test_wlccs_equals_sum_idf_for_single_term(self, index):
        r = index.search(SearchQuery(
            match="one",
            ranker=("expr", "sum((wlccs-sum_idf)*1000) + 42")))
        assert {m.docid: m.weight for m in r.matches} == {1: 42}

    def test_lccs_three_word_chain(self):
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        b = IndexBuilder(Schema(fields=["body"]))
        b.add_documents([
            dict(id=1, body="the quick brown fox jumps"),
            dict(id=2, body="quick fox brown the jumps"),
        ])
        idx = SearchIndex(b.build())
        r = idx.search(SearchQuery(
            match="quick brown fox", ranker=("expr", "sum(lccs)")))
        w = {m.docid: m.weight for m in r.matches}
        assert w[1] == 3    # contiguous in doc1
        assert w[2] == 1    # scattered in doc2


class TestSpanFactors:
    def test_min_best_span_pos(self):
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        b = IndexBuilder(Schema(fields=["body"]))
        b.add_documents([
            dict(id=1, body="x quick brown y quick brown fox z"),
            dict(id=2, body="quick y brown fox"),
        ])
        idx = SearchIndex(b.build())
        r = idx.search(SearchQuery(
            match="quick brown fox", ranker=("expr", "sum(min_best_span_pos)")))
        w = {m.docid: m.weight for m in r.matches}
        # doc1: best (full 3-word) span starts at pos 5 ('quick brown fox')
        assert w[1] == 5
        # doc2: best span is 'brown fox' at pos 3
        assert w[2] == 3

    def test_max_window_hits(self):
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        b = IndexBuilder(Schema(fields=["body"]))
        b.add_documents([
            dict(id=1, body="a a x x x x x x x a a a"),   # 3 a's in window 3
            dict(id=2, body="a x x x a x x x a"),          # never 2 in 3
        ])
        idx = SearchIndex(b.build())
        r = idx.search(SearchQuery(
            match="a", ranker=("expr", "sum(max_window_hits(3))")))
        assert {m.docid: m.weight for m in r.matches} == {1: 3, 2: 1}


class TestPackedFactors:
    def test_packedfactors_select(self):
        from manticoresearch_tpu.exec.session import Catalog, Session
        s = Session(Catalog())
        s.execute("CREATE TABLE pf (title text, body text)")
        s.execute("INSERT INTO pf (id, title, body) VALUES "
                  "(1, 'red apple', 'fresh apple pie'), "
                  "(2, 'pear', 'apple tart')")
        r = s.execute("SELECT id, PACKEDFACTORS() FROM pf WHERE "
                      "MATCH('apple') OPTION "
                      "ranker=expr('sum(lcs)*1000+bm25')")[0]
        assert r.error is None
        by_id = {row[0]: row[1] for row in r.rows}
        # doc1: apple in both fields (mask 3, tf 2); doc2: body only
        assert "field_mask=3" in by_id[1] and "word0=(tf=2" in by_id[1]
        assert "field_mask=2" in by_id[2] and "word0=(tf=1" in by_id[2]
        assert "field0=(lcs=1" in by_id[1]
        assert "min_hit_pos=1" in by_id[2]   # 'apple tart' starts with it

    def test_packedfactors_requires_expr_ranker(self):
        from manticoresearch_tpu.exec.session import Catalog, Session
        s = Session(Catalog())
        s.execute("CREATE TABLE pf2 (body text)")
        s.execute("INSERT INTO pf2 (id, body) VALUES (1, 'x')")
        r = s.execute("SELECT id, PACKEDFACTORS() FROM pf2 "
                      "WHERE MATCH('x')")[0]
        # the default ranker now collects factors too (reference parity,
        # golden test_234): no error, blob rendered
        assert r.error is None
        assert "bm25=" in r.rows[0][1]


class TestMinGapsAtc:
    """min_gaps (UpdateMinGaps minimum-window) + atc (TermTC closeness)."""

    @pytest.fixture(scope="class")
    def gidx(self):
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.schema import Schema
        b = IndexBuilder(Schema(fields=["content"], attrs=[]))
        b.add_documents([
            dict(id=1, content="alpha beta"),             # gaps 0
            dict(id=2, content="alpha filler beta"),      # gaps 1
            dict(id=3, content="alpha x y beta alpha"),   # gaps 0 (b@4,a@5)
            dict(id=4, content="alpha w w w beta"),       # gaps 3
            dict(id=5, content="alpha only here"),        # one word -> 0
        ])
        from manticoresearch_tpu.exec.searcher import SearchIndex
        return SearchIndex(b.build())

    def test_min_gaps_golden(self, gidx):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        r = gidx.search(SearchQuery(
            match="alpha | beta",
            ranker=("expr", "sum(min_gaps)*100"), limit=10))
        assert r.error is None
        got = {m.docid: m.weight for m in r.matches}
        assert got[1] == 0 and got[2] == 100 and got[3] == 0
        assert got[4] == 300 and got[5] == 0

    def test_atc_golden(self, gidx):
        import math
        from manticoresearch_tpu.exec.searcher import SearchQuery
        from manticoresearch_tpu.query.planner import compute_idf
        r = gidx.search(SearchQuery(
            match="alpha | beta",
            ranker=("expr", "sum(atc)*10000"), limit=10))
        assert r.error is None
        got = {m.docid: m.weight for m in r.matches}
        # doc1 "alpha beta": tc(alpha)=idf_b/1^1.75, tc(beta)=idf_a/1^1.75
        # atc = log(1 + idf_a*tc_a... accumulate per-term then * idf:
        #   A[a]=idf_b, A[b]=idf_a -> atc=log(1+2*idf_a*idf_b)
        idf_a = compute_idf(5, 5, n_qwords=2)   # alpha: df=5 of 5
        idf_b = compute_idf(4, 5, n_qwords=2)   # beta: df=4 of 5
        want1 = int(math.log1p(2 * idf_a * idf_b) * 10000)
        assert abs(got[1] - want1) <= 1
        # doc2 distance 2: contributions /2^1.75
        want2 = int(math.log1p(2 * idf_a * idf_b / 2 ** 1.75) * 10000)
        assert abs(got[2] - want2) <= 1
        # single-word doc: no neighbors -> 0
        assert got[5] == 0
