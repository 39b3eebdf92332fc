"""Group-by / aggregates (CSphKBufferGroupSorter semantics) + expressions."""
import numpy as np
import pytest

from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
from manticoresearch_tpu.index.builder import IndexBuilder
from manticoresearch_tpu.query.expr import ExprError, parse_expr
from manticoresearch_tpu.query.planner import AttrFilterDef
from manticoresearch_tpu.schema import AttrDef, AttrType, Schema

DOCS = [
    # id, cat, price, qty, text
    (1, 1, 10.0, 2, "red apple fruit"),
    (2, 1, 20.0, 1, "green apple fruit"),
    (3, 2, 5.0, 7, "yellow banana fruit"),
    (4, 2, 8.0, 3, "green banana fruit"),
    (5, 2, 50.0, 1, "dried banana snack"),
    (6, 3, 99.0, 9, "red cherry fruit"),
]


@pytest.fixture(scope="module")
def index():
    schema = Schema(
        fields=["text"],
        attrs=[AttrDef("cat", AttrType.UINT),
               AttrDef("price", AttrType.FLOAT),
               AttrDef("qty", AttrType.UINT)],
    )
    b = IndexBuilder(schema)
    for i, cat, price, qty, text in DOCS:
        b.add_document(dict(id=i, cat=cat, price=price, qty=qty, text=text))
    return SearchIndex(b.build())


class TestGroupBy:
    def test_count_star(self, index):
        r = index.search(SearchQuery(
            match="", group_by="cat", select=["count(*)"],
            sort=[("cat", True)]))
        assert r.error is None
        assert r.total_found == 3  # 3 groups
        got = [(m.attrs["cat"], m.attrs["count(*)"]) for m in r.matches]
        assert got == [(1, 2), (2, 3), (3, 1)]

    def test_group_rep_is_best_weight_then_id(self, index):
        # fullscan: all weights 1 => rep = lowest docid in group
        r = index.search(SearchQuery(
            match="", group_by="cat", sort=[("cat", True)]))
        assert [m.docid for m in r.matches] == [1, 3, 6]

    def test_sum_min_max_avg(self, index):
        r = index.search(SearchQuery(
            match="", group_by="cat",
            select=["sum(price)", "min(price)", "max(price)", "avg(qty)"],
            sort=[("cat", True)]))
        m2 = r.matches[1].attrs  # cat=2
        assert m2["sum(price)"] == pytest.approx(63.0)
        assert m2["min(price)"] == pytest.approx(5.0)
        assert m2["max(price)"] == pytest.approx(50.0)
        assert m2["avg(qty)"] == pytest.approx((7 + 3 + 1) / 3)

    def test_count_distinct(self, index):
        r = index.search(SearchQuery(
            match="", group_by="cat", select=["count(distinct qty)"],
            sort=[("cat", True)]))
        # cat=2 has qty {7,3,1} -> 3 distinct; cat=1 {2,1} -> 2
        got = [m.attrs["count(distinct qty)"] for m in r.matches]
        assert got == [2, 3, 1]

    def test_group_with_match_and_filter(self, index):
        r = index.search(SearchQuery(
            match="fruit", group_by="cat", select=["count(*)"],
            filters=[AttrFilterDef("qty", "range_i", lo=2, hi=10)],
            sort=[("cat", True)]))
        # fruit docs with qty in [2,10]: 1(cat1), 3,4(cat2), 6(cat3)
        got = [(m.attrs["cat"], m.attrs["count(*)"]) for m in r.matches]
        assert got == [(1, 1), (2, 2), (3, 1)]

    def test_order_by_count_desc(self, index):
        r = index.search(SearchQuery(
            match="", group_by="cat", select=["count(*)"],
            sort=[("count(*)", False)]))
        counts = [m.attrs["count(*)"] for m in r.matches]
        assert counts == [3, 2, 1]

    def test_order_by_float_attr(self, index):
        r = index.search(SearchQuery(
            match="", group_by="cat", select=["count(*)"],
            sort=[("price", False)]))
        # rep of each group is min-docid (weight tie): cat1->d1(10.0),
        # cat2->d3(5.0), cat3->d6(99.0); order by rep price desc
        assert [m.attrs["cat"] for m in r.matches] == [3, 1, 2]

    def test_having(self, index):
        r = index.search(SearchQuery(
            match="", group_by="cat", select=["count(*)"],
            sort=[("cat", True)], having=("count(*)", ">", 1)))
        assert [m.attrs["cat"] for m in r.matches] == [1, 2]

    def test_group_by_expression(self, index):
        r = index.search(SearchQuery(
            match="", group_by="qty%2", select=["count(*)"],
            sort=[("@groupby", True)]))
        # qty: 2,1,7,3,1,9 -> even {2}, odd {1,7,3,1,9}
        got = [(m.attrs["qty%2"], m.attrs["count(*)"]) for m in r.matches]
        assert got == [(0, 1), (1, 5)]

    def test_limit_groups(self, index):
        r = index.search(SearchQuery(
            match="", group_by="cat", select=["count(*)"],
            sort=[("cat", True)], limit=2))
        assert len(r.matches) == 2
        assert r.total_found == 3


class TestExprParse:
    def test_arith(self):
        assert parse_expr("1+2*3") == (
            "add", ("num", 1.0), ("mul", ("num", 2.0), ("num", 3.0)))

    def test_cmp_and(self):
        t = parse_expr("price > 5 AND qty < 3")
        assert t[0] == "and"

    def test_func(self):
        assert parse_expr("IF(a>1, 2, 3)")[0] == "call"

    def test_weight(self):
        assert parse_expr("weight()") == ("weight",)

    def test_unknown_func(self):
        with pytest.raises(ExprError):
            parse_expr("NOSUCH(1)")

    def test_interval(self):
        t = parse_expr("INTERVAL(price, 10, 50)")
        assert t == ("call", "INTERVAL",
                     (("attr", "price"), ("num", 10.0), ("num", 50.0)))


def test_grouped_queries_in_search_batch():
    """search_batch defers grouped launches and overlaps their fetches;
    results must equal one-by-one execution."""
    from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
    from manticoresearch_tpu.index.builder import IndexBuilder
    from manticoresearch_tpu.schema import AttrDef, AttrType, Schema
    b = IndexBuilder(Schema(fields=["c"],
                            attrs=[AttrDef("g", AttrType.UINT),
                                   AttrDef("v", AttrType.UINT)]))
    b.add_documents([dict(id=i, c=f"word tag{i % 5}", g=i % 3, v=i)
                     for i in range(1, 61)])
    idx = SearchIndex(b.build())
    qs = [SearchQuery(match="word", group_by="g",
                      select=["count(*)", "sum(v)"],
                      sort=[("@count", False)], limit=5),
          SearchQuery(match="tag1", limit=10),
          SearchQuery(match="tag2", group_by="g", select=["count(*)"],
                      sort=[("@count", False)], limit=5)]
    batch = idx.search_batch(qs)
    solo = [idx.search(q) for q in qs]
    for rb, rs in zip(batch, solo):
        assert rb.error is None and rs.error is None
        assert [(m.docid, m.weight, tuple(sorted(m.attrs.items())))
                for m in rb.matches] == \
               [(m.docid, m.weight, tuple(sorted(m.attrs.items())))
                for m in rs.matches]
