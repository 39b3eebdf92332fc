"""RT index: insert/commit/delete/replace/update, segment merge, WAL replay,
snapshot save/load (RtIndex_c / RtBinlog_c behavioral tests)."""
import os

import pytest

from manticoresearch_tpu.exec.searcher import SearchQuery
from manticoresearch_tpu.index.rt import RtIndex
from manticoresearch_tpu.index.storage import load_packed, save_packed
from manticoresearch_tpu.schema import AttrDef, AttrType, Schema

SCHEMA = Schema(fields=["title", "content"],
                attrs=[AttrDef("gid", AttrType.UINT),
                       AttrDef("price", AttrType.FLOAT)])


def make_rt(tmp=None):
    return RtIndex("t", SCHEMA, data_dir=tmp)


class TestRtBasics:
    def test_insert_commit_search(self):
        rt = make_rt()
        rt.insert(dict(id=1, title="hello world", content="first doc", gid=1))
        rt.insert(dict(id=2, title="hello there", content="second doc", gid=2))
        assert rt.commit() == 2
        r = rt.search(SearchQuery(match="hello"))
        assert [m.docid for m in r.matches] == [1, 2]
        assert r.total_found == 2

    def test_uncommitted_not_visible(self):
        rt = make_rt()
        rt.insert(dict(id=1, title="x", content="y", gid=1))
        r = rt.search(SearchQuery(match="x"))
        assert r.matches == []
        rt.commit()
        assert len(rt.search(SearchQuery(match="x")).matches) == 1

    def test_duplicate_insert_rejected(self):
        rt = make_rt()
        rt.insert(dict(id=1, title="a", content="", gid=1))
        rt.commit()
        with pytest.raises(ValueError):
            rt.insert(dict(id=1, title="b", content="", gid=1))

    def test_replace(self):
        rt = make_rt()
        rt.insert(dict(id=1, title="old text", content="", gid=1))
        rt.commit()
        rt.insert(dict(id=1, title="new text", content="", gid=1),
                  replace=True)
        rt.commit()
        assert rt.search(SearchQuery(match="old")).matches == []
        r = rt.search(SearchQuery(match="new"))
        assert [m.docid for m in r.matches] == [1]
        assert rt.n_docs == 1

    def test_delete(self):
        rt = make_rt()
        for i in range(1, 5):
            rt.insert(dict(id=i, title=f"doc {i}", content="word", gid=i))
        rt.commit()
        assert rt.delete([2, 3]) == 2
        rt.commit()
        r = rt.search(SearchQuery(match="word"))
        assert [m.docid for m in r.matches] == [1, 4]

    def test_multi_segment_search_and_global_idf(self):
        rt = make_rt()
        # two commits -> two segments; results must merge and rank globally
        rt.insert(dict(id=1, title="apple pie", content="", gid=1))
        rt.commit()
        rt.insert(dict(id=2, title="apple sauce", content="", gid=2))
        rt.insert(dict(id=3, title="banana", content="", gid=3))
        rt.commit()
        assert len(rt.segments) == 2
        r = rt.search(SearchQuery(match="apple"))
        # MergeSegments re-sorts RAM segments by row count desc on every
        # commit (sphinxrt.cpp:2633), so the 2-row segment (docs 2,3)
        # leads; doc 1 and doc 2 then tie on (weight, rowid=0) and the
        # shared match queue's flatten order resolves the tie
        # (CSphMatchQueue artifact; golden test_066/test_412 pin this)
        assert [m.docid for m in r.matches] == [1, 2]
        # same weight in both segments (global df=2, total=3)
        assert r.matches[0].weight == r.matches[1].weight

    def test_update_attrs(self):
        rt = make_rt()
        rt.insert(dict(id=1, title="a", content="", gid=1, price=10.0))
        rt.commit()
        assert rt.update_attrs([1], {"price": 99.5, "gid": 7}) == 1
        r = rt.search(SearchQuery(match="a"))
        assert r.matches[0].attrs["price"] == pytest.approx(99.5)
        assert r.matches[0].attrs["gid"] == 7

    def test_truncate(self):
        rt = make_rt()
        rt.insert(dict(id=1, title="a", content="", gid=1))
        rt.commit()
        rt.truncate()
        assert rt.n_docs == 0
        assert rt.search(SearchQuery(match="a")).matches == []

    def test_optimize_merges_to_one(self):
        rt = make_rt()
        for i in range(1, 6):
            rt.insert(dict(id=i, title=f"word{i} common", content="", gid=i))
            rt.commit()
        assert len(rt.segments) == 5
        rt.optimize()
        assert len(rt.segments) == 1
        r = rt.search(SearchQuery(match="common"))
        assert r.total_found == 5

    def test_progressive_merge_caps_segments(self):
        rt = make_rt()
        for i in range(1, 16):
            rt.insert(dict(id=i, title=f"t{i} shared", content="", gid=i))
            rt.commit()
        assert len(rt.segments) <= rt.MERGE_SEGMENT_LIMIT + 1
        assert rt.search(SearchQuery(match="shared")).total_found == 15


class TestWalAndSnapshot:
    def test_binlog_replay(self, tmp_path):
        d = str(tmp_path / "idx")
        rt = make_rt(d)
        rt.insert(dict(id=1, title="persisted doc", content="", gid=1))
        rt.commit()
        rt.insert(dict(id=2, title="another persisted", content="", gid=2))
        rt.commit()
        rt.delete([1])
        rt.commit()
        # simulate crash: new instance replays WAL
        rt2 = make_rt(d)
        r = rt2.search(SearchQuery(match="persisted"))
        assert [m.docid for m in r.matches] == [2]

    def test_flush_snapshot_and_reload(self, tmp_path):
        d = str(tmp_path / "idx2")
        rt = make_rt(d)
        for i in range(1, 4):
            rt.insert(dict(id=i, title=f"snap doc{i}", content="", gid=i))
        rt.commit()
        rt.flush()
        # binlog reset; snapshot should carry the data
        rt2 = make_rt(d)
        assert rt2.n_docs == 3
        assert rt2.search(SearchQuery(match="snap")).total_found == 3

    def test_torn_binlog_tail_ignored(self, tmp_path):
        d = str(tmp_path / "idx3")
        rt = make_rt(d)
        rt.insert(dict(id=1, title="good record", content="", gid=1))
        rt.commit()
        with open(os.path.join(d, "binlog.jsonl"), "a") as f:
            f.write('{"op": "commit", "docs": [{"id": 2')  # torn write
        rt2 = make_rt(d)
        assert rt2.n_docs == 1


class TestPackedStorage:
    def test_save_load_roundtrip(self, tmp_path):
        from manticoresearch_tpu.exec.searcher import SearchIndex
        from manticoresearch_tpu.index.builder import IndexBuilder
        from tests.test_search import DOCS

        schema = Schema(fields=["title", "content"],
                        attrs=[AttrDef("group_id", AttrType.UINT),
                               AttrDef("group_id2", AttrType.UINT)])
        b = IndexBuilder(schema)
        b.add_documents(DOCS)
        packed = b.build()
        path = str(tmp_path / "plain")
        save_packed(packed, path)
        loaded = load_packed(path)
        idx1 = SearchIndex(packed)
        idx2 = SearchIndex(loaded)
        for match in ("test", "test one", '"test document"', ""):
            r1 = idx1.search(SearchQuery(match=match))
            r2 = idx2.search(SearchQuery(match=match))
            assert [(m.docid, m.weight) for m in r1.matches] == \
                   [(m.docid, m.weight) for m in r2.matches]


class TestPostingMerge:
    """OPTIMIZE/progressive merge run at the posting level (index/merge.py):
    merged output must be indistinguishable from a from-scratch build."""

    def _mk_rt(self):
        from manticoresearch_tpu.index.rt import RtIndex
        from manticoresearch_tpu.schema import AttrDef, AttrType, Schema
        schema = Schema(
            fields=["title", "body"],
            attrs=[AttrDef("price", AttrType.UINT),
                   AttrDef("name", AttrType.STRING),
                   AttrDef("tags", AttrType.MVA),
                   AttrDef("score", AttrType.FLOAT)])
        return RtIndex("m", schema)

    def _docs(self):
        import random
        rng = random.Random(31337)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                 "shared", "rare"]
        docs = []
        for i in range(1, 61):
            docs.append(dict(
                id=i,
                title=" ".join(rng.choices(words, k=4)),
                body=" ".join(rng.choices(words, k=10)),
                price=rng.randint(1, 50),
                name=rng.choice(["ann", "bob", "cat"]),
                tags=[rng.randint(1, 9) for _ in range(rng.randint(0, 3))],
                score=round(rng.random() * 10, 2)))
        return docs

    def _check_equal(self, rt, ref_idx):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        from manticoresearch_tpu.query.planner import AttrFilterDef
        queries = [
            SearchQuery(match="shared", limit=100),
            SearchQuery(match="alpha beta", limit=100),
            SearchQuery(match='"alpha beta"', limit=100),
            SearchQuery(match="gamma | rare", limit=100,
                        ranker="proximity_bm25"),
            SearchQuery(match="@title delta", limit=100),
            SearchQuery(match="shared", limit=100, filters=[
                AttrFilterDef("price", "range_i", lo=10, hi=40)]),
            SearchQuery(match="shared", limit=100, filters=[
                AttrFilterDef("tags", "mva_any", values=[3, 5])]),
            SearchQuery(match="shared", limit=100,
                        sort=[("price", True), ("id", True)]),
        ]
        for q in queries:
            a = rt.search(q)
            b = ref_idx.search(q)
            assert a.error is None and b.error is None, (a.error, b.error)
            assert [(m.docid, m.weight) for m in a.matches] == \
                   [(m.docid, m.weight) for m in b.matches], q.match

    def test_optimize_matches_rebuild(self):
        from manticoresearch_tpu.exec.searcher import SearchIndex
        from manticoresearch_tpu.index.builder import IndexBuilder
        rt = self._mk_rt()
        docs = self._docs()
        # commit in 6 chunks -> 6 segments; delete some; replace some
        for c in range(6):
            for d in docs[c * 10:(c + 1) * 10]:
                rt.insert(d)
            rt.commit()
        rt.delete([5, 17, 33])
        rt.commit()
        for d in docs[2:5]:
            d2 = dict(d)
            d2["title"] = "replaced words here"
            rt.insert(d2, replace=True)
        rt.commit()
        assert len(rt.segments) > 1
        rt.optimize()
        assert len(rt.segments) == 1
        # reference: fresh single build over the surviving docs
        live = {d["id"]: d for d in docs if d["id"] not in (5, 17, 33)}
        for d in docs[2:5]:
            d2 = dict(d)
            d2["title"] = "replaced words here"
            live[d2["id"]] = d2
        b = IndexBuilder(rt.schema, rt.tok_settings, rt.dict_settings)
        b.add_documents(live.values())
        ref_idx = SearchIndex(b.build())
        self._check_equal(rt, ref_idx)
        # docstore survives the merge (docs[2:5] are ids 3..5)
        assert rt.get_document(3)["title"] == "replaced words here"
        assert rt.get_document(6)["title"] == live[6]["title"]
        assert rt.get_document(5)["title"] == "replaced words here"
        assert rt.get_document(17) is None

    def test_merged_zones_and_sp(self):
        from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.index.merge import merge_packed
        from manticoresearch_tpu.schema import Schema
        from manticoresearch_tpu.text.tokenizer import TokenizerSettings
        ts = TokenizerSettings(html_strip=True, index_zones=("h1",),
                               index_sp=True)
        schema = Schema(fields=["content"], attrs=[])
        docs1 = [dict(id=1, content="<h1>big title</h1> plain text. more")]
        docs2 = [dict(id=2, content="other <h1>second heading</h1> words")]
        b1 = IndexBuilder(schema, ts)
        b1.add_documents(docs1)
        b2 = IndexBuilder(schema, ts)
        b2.add_documents(docs2)
        merged = merge_packed([b1.build(), b2.build()])
        bb = IndexBuilder(schema, ts)
        bb.add_documents(docs1 + docs2)
        ref = bb.build()
        mi, ri = SearchIndex(merged), SearchIndex(ref)
        for qs in ["ZONE:(h1) title", "ZONE:(h1) heading",
                   "ZONE:(h1) plain", '"plain text" SENTENCE more']:
            qa = mi.search(SearchQuery(match=qs))
            qb = ri.search(SearchQuery(match=qs))
            assert [(m.docid, m.weight) for m in qa.matches] == \
                   [(m.docid, m.weight) for m in qb.matches], qs
