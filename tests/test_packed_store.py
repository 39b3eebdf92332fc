"""Packed posting store: search results over packed terms must equal the
raw-array formulation exactly (rowids, tf, fieldmask, weights).

The corpus is sized so hot terms cross PACK_MIN (df >= 128) and land in
the bit-plane classes while tail terms stay in the residual stream —
every query below mixes both.
"""
import numpy as np
import pytest

from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
from manticoresearch_tpu.index.builder import IndexBuilder
from manticoresearch_tpu.ops.packed_store import PACK_MIN
from manticoresearch_tpu.query.planner import AttrFilterDef
from manticoresearch_tpu.schema import AttrDef, AttrType, Schema


@pytest.fixture(scope="module")
def corpus():
    import random
    rng = random.Random(991)
    hot = ["alpha", "beta", "gamma"]          # df >> PACK_MIN
    warm = ["delta", "epsilon"]               # df around PACK_MIN
    cold = [f"rare{i:03d}" for i in range(40)]
    docs = []
    for i in range(1, 501):
        words = []
        words += [hot[i % 3]] * rng.randint(1, 4)
        if i % 2 == 0:
            words.append(hot[(i + 1) % 3])
        if i % 3 == 0:
            words.append(warm[i % 2])
        words.append(cold[i % 40])
        rng.shuffle(words)
        docs.append(dict(id=i, title=" ".join(words[:2]),
                         content=" ".join(words),
                         price=i % 50))
    return docs


@pytest.fixture(scope="module")
def index(corpus):
    schema = Schema(fields=["title", "content"],
                    attrs=[AttrDef("price", AttrType.UINT)])
    b = IndexBuilder(schema)
    b.add_documents(corpus)
    return SearchIndex(b.build())


def test_hot_terms_are_packed(index):
    st = index.packed.packed_store()
    hot_tid = index.packed.term_id("alpha")
    assert index.packed.term_docs[hot_tid] >= PACK_MIN
    assert st.term_class[hot_tid, 0] > 0
    cold_tid = index.packed.term_id("rare007")
    assert st.term_class[cold_tid, 0] == 0
    # packed streams beat the raw arrays they replace
    raw = (index.packed.post_rowid.nbytes + index.packed.post_tfq.nbytes
           + index.packed.post_fieldmask.nbytes)
    assert st.nbytes() < raw


def _brute(corpus, want, field=None):
    out = []
    for d in corpus:
        text = d["title" if field == "title" else "content"] if field \
            else d["title"] + " " + d["content"]
        if want in text.split():
            out.append(d["id"])
    return set(out)


def test_packed_term_search_exact(index, corpus):
    for term in ("alpha", "beta", "delta", "rare007"):
        r = index.search(SearchQuery(match=term, limit=500, ranker="none"))
        assert r.error is None
        assert {m.docid for m in r.matches} == _brute(corpus, term), term


def test_mixed_packed_residual_boolean(index, corpus):
    r = index.search(SearchQuery(match="alpha rare007", limit=500,
                                 ranker="none"))
    want = _brute(corpus, "alpha") & _brute(corpus, "rare007")
    assert {m.docid for m in r.matches} == want
    r2 = index.search(SearchQuery(match="delta | rare001", limit=500,
                                  ranker="none"))
    want2 = _brute(corpus, "delta") | _brute(corpus, "rare001")
    assert {m.docid for m in r2.matches} == want2


def test_packed_bm25_weights_match_sharded_raw(index, corpus):
    """The 8-way sharded path still reads raw arrays — its merged weights
    are the ground truth for the packed single-shard path."""
    from manticoresearch_tpu.parallel.sharded import (ShardedIndex,
                                                      make_mesh,
                                                      partition_documents)
    schema = index.schema
    shards = []
    for part in partition_documents(corpus, 4):
        bb = IndexBuilder(schema)
        bb.add_documents(part)
        shards.append(bb.build())
    sh = ShardedIndex(shards, make_mesh(4))
    for q in (SearchQuery(match="alpha", limit=30),
              SearchQuery(match="alpha beta", limit=30),
              SearchQuery(match="gamma | delta", limit=30,
                          filters=[AttrFilterDef("price", "range_i",
                                                 lo=5, hi=30)]),
              SearchQuery(match='"alpha beta"', limit=30)):
        a = index.search(q)
        bres = sh.search(q)
        assert a.error is None and bres.error is None, (a.error, bres.error)
        assert [(m.docid, m.weight) for m in a.matches] == \
               [(m.docid, m.weight) for m in bres.matches], q.match


def test_packed_fieldmask_ranker(index, corpus):
    # bm25 (ws_bm25) uses the decoded fieldmask planes
    r = index.search(SearchQuery(match="@title alpha", limit=500,
                                 ranker="none"))
    want = _brute(corpus, "alpha", field="title")
    assert {m.docid for m in r.matches} == want


class TestScanIndex:
    """Filtered fullscan pre-selection via the attr secondary index
    (histogram/filter-iterator analog, sphinx.cpp:12676)."""

    @pytest.fixture(scope="class")
    def sidx(self):
        import random
        rng = random.Random(5)
        schema = Schema(fields=["content"],
                        attrs=[AttrDef("price", AttrType.UINT),
                               AttrDef("score", AttrType.FLOAT)])
        b = IndexBuilder(schema)
        docs = []
        for i in range(1, 4001):
            docs.append(dict(id=i, content=f"text {i}",
                             price=rng.randint(0, 999),
                             score=round(rng.random() * 100, 2)))
        b.add_documents(docs)
        return SearchIndex(b.build()), docs

    def test_scan_plan_selected(self, sidx):
        idx, docs = sidx
        cq = idx.plan(SearchQuery(
            match="", filters=[AttrFilterDef("price", "range_i",
                                             lo=100, hi=120)]))
        assert cq.sig.scan_index == "price" and cq.sig.sparse

    def test_range_scan_exact(self, sidx):
        idx, docs = sidx
        r = idx.search(SearchQuery(
            match="", limit=4000, max_matches=4000,
            filters=[AttrFilterDef("price", "range_i", lo=100, hi=120)]))
        assert r.error is None
        want = {d["id"] for d in docs if 100 <= d["price"] <= 120}
        assert {m.docid for m in r.matches} == want
        assert r.total_found == len(want)

    def test_combined_filters_on_slice(self, sidx):
        idx, docs = sidx
        r = idx.search(SearchQuery(
            match="", limit=4000, max_matches=4000,
            filters=[AttrFilterDef("price", "range_i", lo=0, hi=50),
                     AttrFilterDef("score", "range_f", lo=0.0, hi=25.0)]))
        want = {d["id"] for d in docs
                if d["price"] <= 50 and 0.0 <= round(d["score"], 2) <= 25.0}
        got = {m.docid for m in r.matches}
        assert got == want

    def test_wide_filter_stays_dense(self, sidx):
        idx, docs = sidx
        cq = idx.plan(SearchQuery(
            match="", filters=[AttrFilterDef("price", "range_i",
                                             lo=0, hi=998)]))
        assert not cq.sig.scan_index
        r = idx.search(SearchQuery(
            match="", limit=4000, max_matches=4000,
            filters=[AttrFilterDef("price", "range_i", lo=0, hi=998)]))
        want = {d["id"] for d in docs if d["price"] <= 998}
        assert {m.docid for m in r.matches} == want

    def test_order_by_attr_on_scan(self, sidx):
        idx, docs = sidx
        r = idx.search(SearchQuery(
            match="", limit=10, sort=[("price", True), ("id", True)],
            filters=[AttrFilterDef("price", "range_i", lo=400, hi=420)]))
        sel = sorted((d["price"], d["id"]) for d in docs
                     if 400 <= d["price"] <= 420)[:10]
        assert [(m.attrs["price"], m.docid) for m in r.matches] == sel
