"""ZONE operator: index_zones extraction + ZONE:(...) query limits
(reference: zone indexing in CSphHTMLStripper + zone filtering in the
ExtTerm hit stream, sphinxquery.y zone grammar)."""
import numpy as np
import pytest

from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
from manticoresearch_tpu.exec.session import Catalog, Session
from manticoresearch_tpu.index.builder import IndexBuilder
from manticoresearch_tpu.schema import Schema
from manticoresearch_tpu.text.tokenizer import TokenizerSettings

DOCS = [
    dict(id=1, body="<h1>apple banana</h1> cherry <em>apple</em> plain"),
    dict(id=2, body="apple outside zones <h1>cherry only</h1>"),
    dict(id=3, body="no zones at all apple"),
]


@pytest.fixture(scope="module")
def index():
    b = IndexBuilder(Schema(fields=["body"]),
                     TokenizerSettings(html_strip=True,
                                       index_zones=("h1", "em")))
    b.add_documents(DOCS)
    return SearchIndex(b.build())


class TestZones:
    def ids(self, index, q):
        r = index.search(SearchQuery(match=q))
        assert r.error is None, (q, r.error)
        return sorted(m.docid for m in r.matches)

    def test_zone_limits_matching(self, index):
        assert self.ids(index, "ZONE:h1 apple") == [1]
        assert self.ids(index, "ZONE:h1 cherry") == [2]
        assert self.ids(index, "ZONE:em apple") == [1]
        assert self.ids(index, "apple") == [1, 2, 3]

    def test_zone_list(self, index):
        assert self.ids(index, "ZONE:(h1,em) apple") == [1]
        assert self.ids(index, "ZONE:(h1,em) banana") == [1]

    def test_zone_resets_in_parens(self, index):
        # zone applies inside the group only
        assert self.ids(index, "(ZONE:h1 apple) cherry") == [1]
        # after the group, 'plain' is unzoned
        assert self.ids(index, "(ZONE:h1 banana) plain") == [1]

    def test_zone_and_unzoned_mix(self, index):
        # zoned apple AND unzoned plain
        assert self.ids(index, "(ZONE:h1 apple) plain") == [1]

    def test_unknown_zone_matches_nothing(self, index):
        assert self.ids(index, "ZONE:title apple") == []

    def test_zone_spans_persist(self, index, tmp_path):
        from manticoresearch_tpu.index.storage import load_packed, save_packed
        save_packed(index.packed, str(tmp_path / "z"))
        p2 = load_packed(str(tmp_path / "z"))
        assert set(p2.zones) == {"h1", "em"}
        for k in p2.zones:
            for a, b in zip(p2.zones[k], index.packed.zones[k]):
                assert np.array_equal(a, b)
        idx2 = SearchIndex(p2)
        assert self.ids(idx2, "ZONE:h1 apple") == [1]

    def test_zone_via_sql(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE zt (body text) html_strip='1' "
                  "index_zones='h1,em'")
        for d in DOCS:
            s.execute(f"INSERT INTO zt (id, body) VALUES "
                      f"({d['id']}, '{d['body'].replace(chr(39), '')}')")
        r = s.execute("SELECT id FROM zt WHERE MATCH('ZONE:h1 apple')")[0]
        assert r.error is None and [row[0] for row in r.rows] == [1]
        r = s.execute("SELECT id FROM zt WHERE MATCH('ZONE:em apple')")[0]
        assert [row[0] for row in r.rows] == [1]

    def test_zonespan_accepted(self, index):
        # ZONESPAN currently approximated by ZONE semantics
        assert self.ids(index, "ZONESPAN:h1 apple banana") == [1]


class TestZonesSharded:
    def test_zone_on_sharded_mesh(self):
        from manticoresearch_tpu.parallel.sharded import (
            ShardedIndex, make_mesh, partition_documents)
        docs = [dict(id=i, body=(f"<h1>apple {i}</h1> banana" if i % 2
                                 else f"apple {i} banana"))
                for i in range(1, 17)]
        ts = TokenizerSettings(html_strip=True, index_zones=("h1",))
        shards = []
        for part in partition_documents(docs, 8):
            b = IndexBuilder(Schema(fields=["body"]), ts)
            b.add_documents(part)
            shards.append(b.build())
        sh = ShardedIndex(shards, make_mesh(8))
        r = sh.search(SearchQuery(match="ZONE:h1 apple"))
        assert r.error is None
        assert sorted(m.docid for m in r.matches) == list(range(1, 17, 2))
        r = sh.search(SearchQuery(match="apple"))
        assert len(r.matches) == 16


class TestZonespan:
    """ZONESPAN: all keywords inside the SAME zone instance
    (sphinxsearch zones same-span constraint)."""

    @pytest.fixture(scope="class")
    def zidx(self):
        docs = [
            # doc 1: apple+banana together in ONE h1 span
            dict(id=1, body="<h1>apple banana</h1> filler"),
            # doc 2: apple and banana in DIFFERENT h1 spans
            dict(id=2, body="<h1>apple pie</h1> mid <h1>banana split</h1>"),
            # doc 3: apple in h1, banana outside any zone
            dict(id=3, body="<h1>apple core</h1> banana loose"),
            # doc 4: no zones
            dict(id=4, body="apple banana plain"),
        ]
        b = IndexBuilder(Schema(fields=["body"]),
                         TokenizerSettings(html_strip=True,
                                           index_zones=("h1",)))
        b.add_documents(docs)
        return SearchIndex(b.build())

    def ids(self, index, q):
        r = index.search(SearchQuery(match=q))
        assert r.error is None, (q, r.error)
        return sorted(m.docid for m in r.matches)

    def test_same_span_required(self, zidx):
        # ZONE (any-instance) matches docs 1 and 2; ZONESPAN only doc 1
        assert self.ids(zidx, "ZONE:h1 apple banana") == [1, 2]
        assert self.ids(zidx, "ZONESPAN:h1 apple banana") == [1]

    def test_single_term_equals_zone(self, zidx):
        assert self.ids(zidx, "ZONESPAN:h1 apple") == \
            self.ids(zidx, "ZONE:h1 apple") == [1, 2, 3]

    def test_three_words_same_span(self, zidx):
        assert self.ids(zidx, "ZONESPAN:h1 apple pie") == [2]
        assert self.ids(zidx, "ZONESPAN:h1 apple split") == []
