"""Distributed (mesh-sharded) search: results must equal the single-index
engine on the same corpus — docids, weights, order, total counts.

This is the reference's agent fan-out path (searchd.cpp:6550) as one XLA
program over a virtual 8-device CPU mesh.
"""
import numpy as np
import pytest

from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
from manticoresearch_tpu.index.builder import IndexBuilder
from manticoresearch_tpu.parallel.sharded import (ShardedIndex, make_mesh,
                                                  partition_documents)
from manticoresearch_tpu.query.planner import AttrFilterDef
from manticoresearch_tpu.schema import AttrDef, AttrType, Schema

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "search", "engine", "index", "query"]


def make_docs(n=64, seed=3):
    rng = np.random.RandomState(seed)
    docs = []
    for i in range(1, n + 1):
        nw = rng.randint(3, 12)
        body = " ".join(WORDS[j] for j in rng.randint(0, len(WORDS), nw))
        docs.append(dict(
            id=i,
            title=" ".join(WORDS[j] for j in rng.randint(0, len(WORDS), 2)),
            content=body,
            year=int(2000 + rng.randint(0, 20)),
            score=float(rng.rand()),
        ))
    return docs


SCHEMA = Schema(
    fields=["title", "content"],
    attrs=[AttrDef("year", AttrType.UINT), AttrDef("score", AttrType.FLOAT)],
)


@pytest.fixture(scope="module")
def corpus():
    return make_docs()


@pytest.fixture(scope="module")
def single(corpus):
    b = IndexBuilder(SCHEMA)
    b.add_documents(corpus)
    return SearchIndex(b.build())


@pytest.fixture(scope="module")
def sharded(corpus):
    parts = partition_documents(corpus, 8)
    shards = []
    for part in parts:
        b = IndexBuilder(SCHEMA)
        b.add_documents(part)
        shards.append(b.build())
    return ShardedIndex(shards, make_mesh(8))


QUERIES = [
    SearchQuery(match="alpha"),
    SearchQuery(match="search engine"),
    SearchQuery(match="alpha | omega"),
    SearchQuery(match="alpha -beta"),
    SearchQuery(match="query", filters=[
        AttrFilterDef("year", "range_i", lo=2005, hi=2015)]),
    SearchQuery(match="", filters=[
        AttrFilterDef("year", "values", values=[2003, 2007])]),
    SearchQuery(match="@title kappa"),
    SearchQuery(match="alpha beta gamma", limit=50),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_sharded_equals_single(single, sharded, qi):
    q = QUERIES[qi]
    r1 = single.search(q)
    r2 = sharded.search(q)
    assert r1.error is None and r2.error is None, (r1.error, r2.error)
    assert r2.total_found == r1.total_found
    assert [m.docid for m in r2.matches] == [m.docid for m in r1.matches]
    assert [m.weight for m in r2.matches] == [m.weight for m in r1.matches]
    assert [m.attrs for m in r2.matches] == [m.attrs for m in r1.matches]


def test_mesh_is_8_devices(sharded):
    assert sharded.mesh.devices.size == 8


QUERIES_POSITIONAL = [
    SearchQuery(match='"search engine"'),
    SearchQuery(match='"engine search"~2'),
    SearchQuery(match="alpha NEAR/3 beta"),
]


@pytest.mark.parametrize("qi", range(len(QUERIES_POSITIONAL)))
def test_sharded_positional_equals_single(single, sharded, qi):
    q = QUERIES_POSITIONAL[qi]
    r1 = single.search(q)
    r2 = sharded.search(q)
    assert r1.error is None and r2.error is None, (r1.error, r2.error)
    assert [m.docid for m in r2.matches] == [m.docid for m in r1.matches]
    assert [m.weight for m in r2.matches] == [m.weight for m in r1.matches]


def test_sharded_group_by(single, sharded):
    q = SearchQuery(match="", group_by="year",
                    select=["count(*)", "sum(score)"],
                    sort=[("year", True)], limit=50)
    r1 = single.search(q)
    r2 = sharded.search(q)
    assert r1.error is None and r2.error is None, (r1.error, r2.error)
    g1 = [(m.attrs["year"], m.attrs["count(*)"]) for m in r1.matches]
    g2 = [(m.attrs["year"], m.attrs["count(*)"]) for m in r2.matches]
    assert g1 == g2
    s1 = [round(m.attrs["sum(score)"], 3) for m in r1.matches]
    s2 = [round(m.attrs["sum(score)"], 3) for m in r2.matches]
    assert s1 == s2


def test_sharded_order_by_attr(single, sharded):
    q = SearchQuery(match="alpha", sort=[("year", False)], limit=20)
    r1 = single.search(q)
    r2 = sharded.search(q)
    assert [m.docid for m in r2.matches] == [m.docid for m in r1.matches]


class TestIciAttrOrder:
    def test_attr_order_takes_single_program(self, monkeypatch):
        """Numeric attr ORDER BY rides the one shard_mapped program (the
        host-merge fallback must NOT be hit)."""
        import numpy as np
        from manticoresearch_tpu.exec.searcher import SearchQuery
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.parallel.sharded import (ShardedIndex,
                                                          make_mesh,
                                                          partition_documents)
        from manticoresearch_tpu.schema import AttrDef, AttrType, Schema
        schema = Schema(fields=["c"],
                        attrs=[AttrDef("price", AttrType.UINT),
                               AttrDef("score", AttrType.FLOAT)])
        docs = [dict(id=i, c="word common", price=(i * 37) % 100,
                     score=((i * 13) % 50) / 2.0)
                for i in range(1, 201)]
        shards = []
        for part in partition_documents(docs, 4):
            b = IndexBuilder(schema)
            b.add_documents(part)
            shards.append(b.build())
        sh = ShardedIndex(shards, make_mesh(4))

        def boom(q):
            raise AssertionError("host fallback used for attr order")
        monkeypatch.setattr(sh, "_per_shard_search", boom)

        for col, asc, is_float in (("price", True, False),
                                   ("price", False, False),
                                   ("score", True, True),
                                   ("score", False, True)):
            r = sh.search(SearchQuery(match="common", limit=20,
                                      sort=[(col, asc), ("id", True)]))
            assert r.error is None, r.error
            want = sorted(docs, key=lambda d: (d[col] if asc else -d[col],
                                               d["id"]))[:20]
            got = [(m.attrs[col], m.docid) for m in r.matches]
            assert got == [(d[col], d["id"]) for d in want], (col, asc)


def test_search_batch_equals_sequential(single, sharded):
    """search_batch must return exactly what per-query search returns —
    one shard_mapped launch per plan shape, one fetch for the whole batch
    (the batched agent fan-out; exec/searcher.py:search_batch is the
    single-index analog)."""
    gq = SearchQuery(match="alpha", group_by="year",
                     select=["count(*)"], sort=[("year", True)], limit=50)
    batch = list(QUERIES) + list(QUERIES_POSITIONAL) + [gq]
    rs_batch = sharded.search_batch(batch)
    for q, rb in zip(batch, rs_batch):
        r1 = single.search(q)
        assert (rb.error is None) == (r1.error is None), (rb.error, r1.error)
        assert rb.total_found == r1.total_found
        if q.group_by:
            # grouped: key+count parity (group representatives may differ
            # between the part merge and the single engine)
            assert [(m.attrs["year"], m.attrs["count(*)"])
                    for m in rb.matches] == \
                [(m.attrs["year"], m.attrs["count(*)"])
                 for m in r1.matches]
            continue
        assert [m.docid for m in rb.matches] == [m.docid for m in r1.matches]
        assert [m.weight for m in rb.matches] == \
            [m.weight for m in r1.matches]


def test_search_batch_mixed_shapes(sharded, single):
    """A batch mixing several plan shapes still groups correctly and pads
    each group to a pow2 batch dim."""
    batch = [SearchQuery(match="alpha"), SearchQuery(match="beta"),
             SearchQuery(match="gamma"), SearchQuery(match="search engine"),
             SearchQuery(match="kappa"), SearchQuery(match="zeta")]
    rs = sharded.search_batch(batch)
    for q, rb in zip(batch, rs):
        r1 = single.search(q)
        assert [m.docid for m in rb.matches] == [m.docid for m in r1.matches]
