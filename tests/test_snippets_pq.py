"""Snippets/highlighting + percolate index end-to-end."""
import pytest

from manticoresearch_tpu.exec.session import Catalog, Session
from manticoresearch_tpu.exec.snippets import SnippetOptions, build_snippet
from manticoresearch_tpu.text.dictionary import Dictionary
from manticoresearch_tpu.text.tokenizer import Tokenizer


@pytest.fixture()
def sess():
    return Session(Catalog())


def one(sess, sql):
    rs = sess.execute(sql)
    assert len(rs) >= 1
    return rs[0]


class TestSnippets:
    tok = Tokenizer()
    dic = Dictionary()

    def test_basic_highlight(self):
        out = build_snippet("The quick brown fox jumps over the lazy dog",
                            "fox", self.tok, self.dic)
        assert "<b>fox</b>" in out
        assert "quick brown" in out

    def test_around_window_and_separator(self):
        text = " ".join(f"w{i}" for i in range(50)) + " target " + \
            " ".join(f"x{i}" for i in range(50))
        out = build_snippet(text, "target", self.tok, self.dic,
                            SnippetOptions(around=3))
        assert "<b>target</b>" in out
        # reference-exact edges: the chunk separator " ... " is emitted
        # verbatim at clipped edges, and FlushPassage's token-wise trim
        # can leave an edge space inside the passage (PackAsString,
        # sphinxexcerpt.cpp:1279; golden test_040 model shows
        # "ловил он  ... " / " ...  ел её" double-space forms)
        assert out.lstrip().startswith("...")
        assert out.rstrip().endswith("...")
        assert "w46" not in out and "w47" in out
        assert "x3" not in out and "x2" in out

    def test_no_match_returns_doc_start(self):
        out = build_snippet("some document text here", "missing",
                            self.tok, self.dic)
        assert out.startswith("some document")

    def test_multiple_matches_merge(self):
        out = build_snippet("alpha beta gamma beta delta", "beta",
                            self.tok, self.dic)
        assert out.count("<b>beta</b>") == 2

    def test_custom_tags(self):
        out = build_snippet("hello world", "world", self.tok, self.dic,
                            SnippetOptions(before_match="[", after_match="]"))
        assert "[world]" in out

    def test_call_snippets_sql(self, sess):
        one(sess, "CREATE TABLE t (content text)")
        r = one(sess, "CALL SNIPPETS('The quick brown fox', 't', 'fox')")
        assert r.error is None
        assert "<b>fox</b>" in r.rows[0][0]

    def test_call_snippets_options(self, sess):
        one(sess, "CREATE TABLE t (content text)")
        r = one(sess, "CALL SNIPPETS('a b c fox d', 't', 'fox', "
                      "'[m]' AS before_match, '[/m]' AS after_match)")
        assert "[m]fox[/m]" in r.rows[0][0]

    def test_highlight_in_select(self, sess):
        one(sess, "CREATE TABLE art (title text, body text)")
        one(sess, "INSERT INTO art (id, title, body) VALUES "
                  "(1, 'fox story', 'the quick brown fox ran away')")
        r = one(sess, "SELECT id, HIGHLIGHT() FROM art WHERE MATCH('fox')")
        assert r.error is None
        assert "<b>fox</b>" in r.rows[0][1]


class TestPercolate:
    def test_pq_create_insert_match(self, sess):
        one(sess, "CREATE TABLE pq (content text, gid uint) type='pq'")
        r = one(sess, "INSERT INTO pq (query) VALUES ('shoes | boots')")
        assert r.error is None
        one(sess, "INSERT INTO pq (query, filters) VALUES "
                  "('@content red', 'gid>5')")
        r = one(sess, "SELECT * FROM pq")
        assert len(r.rows) == 2

        r = one(sess, "CALL PQ('pq', ('i love my red shoes', "
                      "'blue sky above'), 1 AS docs, 0 AS docs_json)")
        assert r.error is None
        # only query 1 matches doc 1 ('red' query has filter gid>5, and the
        # bare-text doc has gid=0)
        UID1 = (100000 << 24) + 1   # UidShort test-mode base (sphinxutils.cpp)
        assert [(row[0], row[1]) for row in r.rows] == [(UID1, "1")]

    def test_pq_json_docs_with_attrs(self, sess):
        one(sess, "CREATE TABLE pq2 (content text, gid uint) type='pq'")
        one(sess, "INSERT INTO pq2 (query, filters) VALUES "
                  "('alert', 'gid=7')")
        r = one(sess, 'CALL PQ(\'pq2\', (\'{"content": "alert now", '
                      '"gid": 7}\', \'{"content": "alert", "gid": 1}\'), '
                      "1 AS docs, 1 AS docs_json)")
        assert r.error is None
        UID1 = (100000 << 24) + 1   # UidShort test-mode base (sphinxutils.cpp)
        assert [(row[0], row[1]) for row in r.rows] == [(UID1, "1")]

    def test_pq_delete(self, sess):
        one(sess, "CREATE TABLE pq3 (content text) type='pq'")
        one(sess, "INSERT INTO pq3 (query) VALUES ('a'), ('b')")
        uid1 = (100000 << 24) + 1      # auto ids are UidShort
        r = one(sess, f"DELETE FROM pq3 WHERE id = {uid1}")
        assert r.affected == 1
        assert len(one(sess, "SELECT * FROM pq3").rows) == 1

    def test_pq_bad_query_rejected(self, sess):
        one(sess, "CREATE TABLE pq4 (content text) type='pq'")
        r = one(sess, "INSERT INTO pq4 (query) VALUES ('\\\"unbalanced')")
        assert r.error is not None

    def test_pq_persistence(self, tmp_path):
        c1 = Catalog(str(tmp_path))
        s1 = Session(c1)
        one(s1, "CREATE TABLE p (content text) type='pq'")
        one(s1, "INSERT INTO p (query) VALUES ('hello world')")
        c2 = Catalog(str(tmp_path))
        s2 = Session(c2)
        r = one(s2, "SELECT * FROM p")
        assert len(r.rows) == 1
        assert r.rows[0][1] == "hello world"


class TestJsonHighlight:
    def test_highlight_in_json_search(self):
        import json as _json
        from manticoresearch_tpu.exec.session import Catalog, Session
        from manticoresearch_tpu.server.http import HttpServer
        cat = Catalog()
        s = Session(cat)
        s.execute("CREATE TABLE hl (title text, body text)")
        s.execute("INSERT INTO hl (id, title, body) VALUES "
                  "(1, 'red apple', 'a very fresh red apple from the tree'), "
                  "(2, 'green pear', 'sweet pear juice')")
        h = HttpServer(cat)
        st, _, payload = h.handle_request("POST", "/json/search", {},
            _json.dumps({
                "index": "hl",
                "query": {"match": {"_all": "apple"}},
                # pre_tags/post_tags are strict strings in the reference
                # (FetchStrItem, sphinxjsonquery.cpp:1857 — ES-style
                # arrays are rejected with "should be a string")
                "highlight": {"fields": {"body": {}},
                              "pre_tags": "<em>",
                              "post_tags": "</em>"},
            }).encode())
        assert st.startswith("200")
        out = _json.loads(payload)
        hits = out["hits"]["hits"]
        assert len(hits) == 1 and hits[0]["_id"] == 1
        frags = hits[0]["highlight"]["body"]
        assert any("<em>apple</em>" in f for f in frags)
        assert "title" not in hits[0]["highlight"]

    def test_highlight_defaults_all_fields(self):
        import json as _json
        from manticoresearch_tpu.exec.session import Catalog, Session
        from manticoresearch_tpu.server.http import HttpServer
        cat = Catalog()
        s = Session(cat)
        s.execute("CREATE TABLE hl2 (title text, body text)")
        s.execute("INSERT INTO hl2 (id, title, body) VALUES "
                  "(1, 'apple pie', 'made with apple and sugar')")
        h = HttpServer(cat)
        st, _, payload = h.handle_request("POST", "/json/search", {},
            _json.dumps({"index": "hl2",
                         "query": {"match": {"_all": "apple"}},
                         "highlight": {}}).encode())
        out = _json.loads(payload)
        hl = out["hits"]["hits"][0]["highlight"]
        assert "<b>apple</b>" in hl["title"][0]
        assert "<b>apple</b>" in hl["body"][0]


class TestSnippetOptions:
    """Round-2 option surface (sphinxexcerpt.cpp passage options)."""

    def _mk(self):
        from manticoresearch_tpu.text.dictionary import Dictionary
        from manticoresearch_tpu.text.tokenizer import Tokenizer
        return Tokenizer(), Dictionary()

    def test_passage_id_macro(self):
        from manticoresearch_tpu.exec.snippets import (SnippetOptions,
                                                       build_snippet)
        tok, dic = self._mk()
        text = ("alpha beta gamma delta epsilon zeta eta theta iota " * 4
                + " needle " + "kappa lamda mu nu xi omicron pi rho " * 4
                + " needle again")
        s = build_snippet(text, "needle", tok, dic, SnippetOptions(
            before_match="<span id=%PASSAGE_ID%>", after_match="</span>",
            around=2, limit=0))
        assert "<span id=1>needle</span>" in s
        assert "<span id=2>needle</span>" in s

    def test_weight_order_and_limit_passages(self):
        from manticoresearch_tpu.exec.snippets import (SnippetOptions,
                                                       build_snippet)
        tok, dic = self._mk()
        filler = "word " * 30
        text = ("one fish here " + filler
                + " two fish and red fish swim " + filler
                + " blue fish")
        # weight_order: densest passage (3 hits) first
        s = build_snippet(text, "fish", tok, dic, SnippetOptions(
            around=2, weight_order=True, limit=0))
        first = s.split(" ... ")[0] if " ... " in s else s
        assert "two" in first or "red" in first
        # limit_passages=1 keeps only the densest
        s2 = build_snippet(text, "fish", tok, dic, SnippetOptions(
            around=2, limit_passages=1, limit=0))
        assert s2.count("<b>fish</b>") >= 2 and "one fish" not in s2

    def test_limit_words(self):
        from manticoresearch_tpu.exec.snippets import (SnippetOptions,
                                                       build_snippet)
        tok, dic = self._mk()
        filler = "pad " * 40
        text = "hit alpha " + filler + " hit beta " + filler + " hit gamma"
        s = build_snippet(text, "hit", tok, dic, SnippetOptions(
            around=3, limit=0, limit_words=8))
        assert len(s.replace("<b>", "").replace("</b>", "").split()) <= 14

    def test_force_all_words(self):
        from manticoresearch_tpu.exec.snippets import (SnippetOptions,
                                                       build_snippet)
        tok, dic = self._mk()
        filler = "x " * 200
        text = "apple starts here " + filler + " banana finishes there"
        s = build_snippet(text, "apple banana", tok, dic, SnippetOptions(
            around=1, limit=30, force_all_words=True))
        assert "<b>apple</b>" in s and "<b>banana</b>" in s

    def test_passage_boundary_sentence(self):
        from manticoresearch_tpu.exec.snippets import (SnippetOptions,
                                                       build_snippet)
        tok, dic = self._mk()
        text = "first sentence stops. the needle is here. third part"
        s = build_snippet(text, "needle", tok, dic, SnippetOptions(
            around=10, limit=0, passage_boundary="sentence"))
        assert "first" not in s and "third" not in s
        assert "<b>needle</b>" in s

    def test_html_strip_mode(self):
        from manticoresearch_tpu.exec.snippets import (SnippetOptions,
                                                       build_snippet)
        tok, dic = self._mk()
        text = "<p>the <i>needle</i> here</p>"
        s = build_snippet(text, "needle", tok, dic, SnippetOptions(
            limit=0, html_strip_mode="strip"))
        assert "<i>" not in s and "<b>needle</b>" in s
