"""SphinxQL end-to-end: parse -> session -> engine (the CSphinxqlSession
surface, searchd.cpp:15180). Drives the full SQL dialect subset."""
import pytest

from manticoresearch_tpu.exec.session import Catalog, QLResult, Session


@pytest.fixture()
def sess():
    return Session(Catalog())


@pytest.fixture()
def loaded(sess):
    r = sess.execute(
        "CREATE TABLE products (title text, descr text, price float, "
        "cat uint, qty uint)")
    assert r[0].error is None
    r = sess.execute(
        "INSERT INTO products (id, title, descr, price, cat, qty) VALUES "
        "(1, 'red apple', 'fresh red apple fruit', 10.5, 1, 5), "
        "(2, 'green apple', 'tasty green apple', 8.0, 1, 3), "
        "(3, 'banana', 'yellow banana fruit', 3.5, 2, 10), "
        "(4, 'cherry pie', 'sweet cherry dessert', 15.0, 3, 2)")
    assert r[0].error is None
    assert r[0].affected == 4
    return sess


def one(sess, sql) -> QLResult:
    rs = sess.execute(sql)
    assert len(rs) >= 1
    return rs[0]


class TestDDL:
    def test_create_show_desc_drop(self, sess):
        assert one(sess, "CREATE TABLE t1 (body text, gid uint)").error is None
        r = one(sess, "SHOW TABLES")
        assert ("t1", "rt") in r.rows
        r = one(sess, "DESC t1")
        assert ("id", "bigint", "") in r.rows
        assert ("body", "text", "indexed stored") in r.rows
        assert ("gid", "uint", "") in r.rows
        assert one(sess, "DROP TABLE t1").error is None
        assert one(sess, "SHOW TABLES").rows == []
        assert one(sess, "DROP TABLE t1").error is not None
        assert one(sess, "DROP TABLE IF EXISTS t1").error is None

    def test_create_duplicate(self, sess):
        one(sess, "CREATE TABLE t1 (body text)")
        assert one(sess, "CREATE TABLE t1 (body text)").error is not None
        assert one(sess, "CREATE TABLE IF NOT EXISTS t1 (body text)").error \
            is None


class TestSelect:
    def test_match_select(self, loaded):
        r = one(loaded, "SELECT id, weight() FROM products "
                        "WHERE MATCH('apple')")
        assert r.error is None
        assert r.columns == ["id", "weight()"]
        assert [row[0] for row in r.rows] == [1, 2]

    def test_star(self, loaded):
        r = one(loaded, "SELECT * FROM products WHERE MATCH('banana')")
        assert r.columns[0] == "id"
        assert "price" in r.columns
        assert r.rows[0][0] == 3

    def test_where_attr_filters(self, loaded):
        r = one(loaded, "SELECT id FROM products WHERE cat=1")
        assert [row[0] for row in r.rows] == [1, 2]
        r = one(loaded, "SELECT id FROM products WHERE price >= 8.0 "
                        "AND price <= 12.0")
        assert [row[0] for row in r.rows] == [1, 2]
        r = one(loaded, "SELECT id FROM products WHERE qty BETWEEN 3 AND 5")
        assert [row[0] for row in r.rows] == [1, 2]
        r = one(loaded, "SELECT id FROM products WHERE cat IN (2, 3)")
        assert [row[0] for row in r.rows] == [3, 4]

    def test_id_filter(self, loaded):
        r = one(loaded, "SELECT id FROM products WHERE id IN (2, 4)")
        assert [row[0] for row in r.rows] == [2, 4]

    def test_order_limit(self, loaded):
        r = one(loaded, "SELECT id, price FROM products "
                        "ORDER BY price DESC LIMIT 2")
        assert [row[0] for row in r.rows] == [4, 1]
        r = one(loaded, "SELECT id FROM products ORDER BY price ASC "
                        "LIMIT 1, 2")
        assert [row[0] for row in r.rows] == [2, 1]

    def test_select_expression(self, loaded):
        r = one(loaded, "SELECT id, price * qty AS total FROM products "
                        "WHERE MATCH('banana')")
        assert r.rows[0] == (3, 35.0)

    def test_select_no_from(self, sess):
        r = one(sess, "SELECT 1+2")
        assert r.rows == [(3,)]

    def test_group_by(self, loaded):
        r = one(loaded, "SELECT cat, count(*) FROM products "
                        "GROUP BY cat ORDER BY cat ASC")
        assert r.rows == [(1, 2), (2, 1), (3, 1)]

    def test_group_by_having(self, loaded):
        r = one(loaded, "SELECT cat, count(*) FROM products GROUP BY cat "
                        "HAVING count(*) > 1 ORDER BY cat ASC")
        assert r.rows == [(1, 2)]

    def test_facet(self, loaded):
        rs = loaded.execute(
            "SELECT id FROM products WHERE MATCH('fruit') "
            "FACET cat ORDER BY cat ASC")
        assert len(rs) == 2
        assert rs[0].error is None and rs[1].error is None
        # fruit matches docs 1, 3 -> cats 1 and 2
        assert rs[1].rows == [(1, 1), (2, 1)]

    def test_option_ranker(self, loaded):
        r = one(loaded, "SELECT id, weight() FROM products "
                        "WHERE MATCH('apple') OPTION ranker=none")
        assert all(row[1] == 1 for row in r.rows)

    def test_option_field_weights(self, loaded):
        r = one(loaded, "SELECT id, weight() FROM products WHERE "
                        "MATCH('apple') OPTION field_weights=(title=10, "
                        "descr=1)")
        assert r.error is None
        assert r.rows[0][1] > 10000  # title lcs * 10 * 1000

    def test_show_meta_after_select(self, loaded):
        one(loaded, "SELECT id FROM products WHERE MATCH('apple')")
        r = one(loaded, "SHOW META")
        d = dict(r.rows)
        assert d["total_found"] == "2"
        assert d["keyword[0]"] == "apple"
        assert d["docs[0]"] == "2"

    def test_syntax_error(self, sess):
        r = one(sess, "SELEKT nonsense")
        assert r.error is not None

    def test_unknown_table(self, sess):
        r = one(sess, "SELECT id FROM missing_table")
        assert "no such table" in r.error


class TestWrites:
    def test_delete_by_id(self, loaded):
        r = one(loaded, "DELETE FROM products WHERE id = 2")
        assert r.affected == 1
        r = one(loaded, "SELECT id FROM products WHERE MATCH('apple')")
        assert [row[0] for row in r.rows] == [1]

    def test_delete_by_match(self, loaded):
        r = one(loaded, "DELETE FROM products WHERE MATCH('fruit')")
        assert r.affected == 2
        assert one(loaded, "SELECT id FROM products").rows == [(2,), (4,)]

    def test_replace(self, loaded):
        one(loaded, "REPLACE INTO products (id, title, descr, price, cat, "
                    "qty) VALUES (1, 'blue grape', 'juicy', 9.9, 4, 1)")
        r = one(loaded, "SELECT id FROM products WHERE MATCH('grape')")
        assert [row[0] for row in r.rows] == [1]
        assert one(loaded, "SELECT id FROM products "
                           "WHERE MATCH('apple')").rows == [(2,)]

    def test_update(self, loaded):
        r = one(loaded, "UPDATE products SET price=99.0, qty=7 WHERE id=3")
        assert r.affected == 1
        r = one(loaded, "SELECT price, qty FROM products WHERE MATCH('banana')")
        assert r.rows == [(99.0, 7)]

    def test_update_where_filter(self, loaded):
        r = one(loaded, "UPDATE products SET qty=0 WHERE cat=1")
        assert r.affected == 2

    def test_transactions(self, loaded):
        one(loaded, "BEGIN")
        one(loaded, "INSERT INTO products (id, title, descr, price, cat, qty)"
                    " VALUES (10, 'pending doc', 'x', 1.0, 9, 1)")
        assert one(loaded, "SELECT id FROM products "
                           "WHERE MATCH('pending')").rows == []
        one(loaded, "COMMIT")
        assert one(loaded, "SELECT id FROM products "
                           "WHERE MATCH('pending')").rows == [(10,)]

    def test_rollback(self, loaded):
        one(loaded, "BEGIN")
        one(loaded, "INSERT INTO products (id, title, descr, price, cat, qty)"
                    " VALUES (11, 'ghost', 'x', 1.0, 9, 1)")
        one(loaded, "ROLLBACK")
        assert one(loaded, "SELECT id FROM products "
                           "WHERE MATCH('ghost')").rows == []

    def test_truncate(self, loaded):
        one(loaded, "TRUNCATE TABLE products")
        assert one(loaded, "SELECT id FROM products").rows == []

    def test_duplicate_id_insert(self, loaded):
        r = one(loaded, "INSERT INTO products (id, title, descr, price, cat, "
                        "qty) VALUES (1, 'dup', 'x', 1.0, 1, 1)")
        assert "duplicate id" in r.error


class TestAdmin:
    def test_show_status_version_variables(self, sess):
        assert one(sess, "SHOW STATUS").error is None
        assert one(sess, "SHOW VERSION").error is None
        assert one(sess, "SHOW VARIABLES").error is None
        assert one(sess, "SET autocommit = 0").error is None
        assert sess.autocommit is False

    def test_show_create_and_index_status(self, loaded):
        r = one(loaded, "SHOW CREATE TABLE products")
        assert "price float" in r.rows[0][1]
        r = one(loaded, "SHOW TABLE products STATUS")
        d = dict(r.rows)
        assert d["indexed_documents"] == "4"

    def test_optimize_flush(self, loaded):
        one(loaded, "INSERT INTO products (id, title, descr, price, cat, qty)"
                    " VALUES (5, 'kiwi', 'green kiwi', 2.0, 2, 4)")
        assert one(loaded, "OPTIMIZE INDEX products").error is None
        t = loaded.catalog.get("products")
        assert len(t.segments) == 1

    def test_call_keywords(self, loaded):
        r = one(loaded, "CALL KEYWORDS('red apples', 'products')")
        assert r.error is None
        assert r.columns[0] == "qpos"
        assert len(r.rows) == 2

    def test_call_suggest(self, loaded):
        r = one(loaded, "CALL SUGGEST('aple', 'products')")
        assert r.error is None
        assert r.rows and r.rows[0][0] == "apple"

    def test_explain(self, loaded):
        r = one(loaded, "EXPLAIN QUERY products 'apple banana'")
        assert r.error is None


class TestUdfAndPlan:
    def test_create_function_and_use(self, loaded, tmp_path):
        import sys
        mod = tmp_path / "myudfs.py"
        mod.write_text("def double_it(x):\n    return x * 2\n")
        sys.path.insert(0, str(tmp_path))
        try:
            r = one(loaded, "CREATE FUNCTION double_it RETURNS INT "
                            "SONAME 'myudfs:double_it'")
            assert r.error is None
            r = one(loaded, "SHOW PLUGINS")
            assert ("udf", "DOUBLE_IT", "") in r.rows
            r = one(loaded, "SELECT id, DOUBLE_IT(qty) AS d FROM products "
                            "WHERE id = 1")
            assert r.rows == [(1, 10)]
            assert one(loaded, "DROP FUNCTION double_it").error is None
            r = one(loaded, "SELECT id, DOUBLE_IT(qty) FROM products "
                            "WHERE id = 1")
            assert r.error is not None
        finally:
            sys.path.remove(str(tmp_path))

    def test_show_plan(self, loaded):
        one(loaded, "SELECT id FROM products WHERE MATCH('apple banana')")
        r = one(loaded, "SHOW PLAN")
        assert r.error is None
        # reference-format render (RenderPlainBsonPlan)
        assert r.rows[0][1] == ("AND(\n  AND(KEYWORD(apple, querypos=1)), "
                                "\n  AND(KEYWORD(banana, querypos=2)))")


class TestAlterTable:
    def test_add_and_drop_attr(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE a1 (title text, price float)")
        s.execute("INSERT INTO a1 (id, title, price) VALUES "
                  "(1, 'red apple', 10.5), (2, 'green pear', 8.0)")
        r = s.execute("ALTER TABLE a1 ADD COLUMN stock uint")[0]
        assert r.error is None
        # new column defaults to 0 and is filterable/updatable
        r = s.execute("UPDATE a1 SET stock=7 WHERE id=2")[0]
        assert r.error is None
        r = s.execute("SELECT id, stock FROM a1 WHERE stock > 5")[0]
        assert r.error is None and r.rows == [(2, 7)]
        # full-text search still works after the rebuild
        r = s.execute("SELECT id FROM a1 WHERE MATCH('apple')")[0]
        assert [row[0] for row in r.rows] == [1]
        r = s.execute("ALTER TABLE a1 DROP COLUMN price")[0]
        assert r.error is None
        r = s.execute("SELECT id, price FROM a1")[0]
        assert r.error is not None  # price is gone
        r = s.execute("DESC a1")[0]
        names = [row[0] for row in r.rows]
        assert "stock" in names and "price" not in names

    def test_add_text_field(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE a2 (title text)")
        s.execute("INSERT INTO a2 (id, title) VALUES (1, 'hello')")
        r = s.execute("ALTER TABLE a2 ADD COLUMN body text")[0]
        assert r.error is None
        s.execute("INSERT INTO a2 (id, title, body) VALUES "
                  "(2, 'x', 'searchable words')")
        r = s.execute("SELECT id FROM a2 WHERE MATCH('@body searchable')")[0]
        assert [row[0] for row in r.rows] == [2]
        # old doc still searchable
        r = s.execute("SELECT id FROM a2 WHERE MATCH('hello')")[0]
        assert [row[0] for row in r.rows] == [1]

    def test_alter_errors(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE a3 (title text, price float)")
        assert s.execute("ALTER TABLE a3 ADD COLUMN price uint")[0].error
        assert s.execute("ALTER TABLE a3 DROP COLUMN nosuch")[0].error
        assert s.execute("ALTER TABLE a3 ADD COLUMN x badtype")[0].error
        assert s.execute("ALTER TABLE nosuchtable ADD COLUMN x uint")[0].error

    def test_alter_binlog_replay(self, tmp_path):
        d = str(tmp_path)
        c = Catalog(data_dir=d)
        s = Session(c)
        s.execute("CREATE TABLE a4 (title text)")
        s.execute("INSERT INTO a4 (id, title) VALUES (1, 'doc one')")
        s.execute("ALTER TABLE a4 ADD COLUMN grp uint")
        s.execute("UPDATE a4 SET grp=3 WHERE id=1")
        # reopen from disk: binlog replays create/alter/update
        c2 = Catalog(data_dir=d)
        s2 = Session(c2)
        r = s2.execute("SELECT id, grp FROM a4 WHERE grp=3")[0]
        assert r.error is None and r.rows == [(1, 3)]


class TestBigintIds:
    def test_id_filters_beyond_32bit(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE big (title text)")
        ids = [3, 2**31 + 7, 2**33 + 1, 2**40 + 5]
        vals = ", ".join(f"({i}, 'doc word')" for i in ids)
        r = s.execute(f"INSERT INTO big (id, title) VALUES {vals}")[0]
        assert r.error is None
        # IN list crossing the 32-bit boundary
        r = s.execute(f"SELECT id FROM big WHERE id IN ({2**31 + 7}, 3)")[0]
        assert r.error is None
        assert sorted(row[0] for row in r.rows) == [3, 2**31 + 7]
        # range with 64-bit bounds
        r = s.execute(f"SELECT id FROM big WHERE id > {2**32} "
                      f"AND id <= {2**40 + 5} AND MATCH('word')")[0]
        assert sorted(row[0] for row in r.rows) == [2**33 + 1, 2**40 + 5]
        # exclusion
        r = s.execute(f"SELECT id FROM big WHERE id NOT IN ({2**33 + 1})")[0]
        assert sorted(row[0] for row in r.rows) == [3, 2**31 + 7, 2**40 + 5]
        # two ids congruent mod 2^31 must not alias (hi word decides)
        s.execute(f"INSERT INTO big (id, title) VALUES ({7}, 'alias test')")
        r = s.execute(f"SELECT id FROM big WHERE id IN ({2**31 + 7})")[0]
        assert [row[0] for row in r.rows] == [2**31 + 7]


class TestQueryCache:
    def _qstatus(self, s):
        r = s.execute("SHOW STATUS")[0]
        return {k: v for k, v in r.rows}

    def test_qcache_hit_and_invalidate(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE qc (body text, grp uint)")
        s.execute("INSERT INTO qc (id, body, grp) VALUES "
                  "(1, 'aa bb', 1), (2, 'aa cc', 2)")
        # the qcache only covers DISK chunks (reference ties entries to a
        # CSphIndex+TID; RAM chunks are excluded — golden test_229): seal
        # the RAM segment into a disk chunk first
        s.execute("FLUSH RAMCHUNK qc")
        # default threshold is 3000ms -> nothing cached
        s.execute("SELECT id FROM qc WHERE MATCH('aa')")
        assert self._qstatus(s)["qcache_cached_queries"] == "0"
        # lower threshold -> cacheable
        s.execute("SET GLOBAL qcache_thresh_msec=0")
        r1 = s.execute("SELECT id FROM qc WHERE MATCH('aa')")[0]
        assert self._qstatus(s)["qcache_cached_queries"] == "1"
        hits0 = int(self._qstatus(s)["qcache_hits"])
        r2 = s.execute("SELECT id FROM qc WHERE MATCH('aa')")[0]
        assert int(self._qstatus(s)["qcache_hits"]) == hits0 + 1
        assert r1.rows == r2.rows
        # a write bumps the generation: cached entry must not be served
        s.execute("INSERT INTO qc (id, body, grp) VALUES (3, 'aa dd', 3)")
        r3 = s.execute("SELECT id FROM qc WHERE MATCH('aa')")[0]
        assert sorted(row[0] for row in r3.rows) == [1, 2, 3]
        # different query text is a different key
        r4 = s.execute("SELECT id FROM qc WHERE MATCH('cc')")[0]
        assert [row[0] for row in r4.rows] == [2]

    def test_qcache_disabled_by_zero_bytes(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE qc2 (body text)")
        s.execute("INSERT INTO qc2 (id, body) VALUES (1, 'x y')")
        s.execute("SET GLOBAL qcache_thresh_msec=0")
        s.execute("SET GLOBAL qcache_max_bytes=0")
        s.execute("SELECT id FROM qc2 WHERE MATCH('x')")
        assert self._qstatus(s)["qcache_cached_queries"] == "0"

    def test_qcache_update_attrs_invalidates(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE qc3 (body text, grp uint)")
        s.execute("INSERT INTO qc3 (id, body, grp) VALUES (1, 'aa', 5)")
        s.execute("SET GLOBAL qcache_thresh_msec=0")
        r1 = s.execute("SELECT id, grp FROM qc3 WHERE MATCH('aa')")[0]
        assert r1.rows == [(1, 5)]
        s.execute("UPDATE qc3 SET grp=9 WHERE id=1")
        r2 = s.execute("SELECT id, grp FROM qc3 WHERE MATCH('aa')")[0]
        assert r2.rows == [(1, 9)]


class TestCreateTableOptions:
    def test_morphology_and_stopwords(self):
        s = Session(Catalog())
        r = s.execute("CREATE TABLE m1 (body text) "
                      "morphology='stem_en' stopwords='the a'")[0]
        assert r.error is None
        s.execute("INSERT INTO m1 (id, body) VALUES "
                  "(1, 'the running dogs'), (2, 'a dog runs')")
        # stemming: running/runs -> run; dogs/dog -> dog
        r = s.execute("SELECT id FROM m1 WHERE MATCH('run')")[0]
        assert sorted(row[0] for row in r.rows) == [1, 2]
        r = s.execute("SELECT id FROM m1 WHERE MATCH('dogs')")[0]
        assert sorted(row[0] for row in r.rows) == [1, 2]
        # stopword never matches
        r = s.execute("SELECT id FROM m1 WHERE MATCH('the')")[0]
        assert r.rows == []

    def test_html_strip_option(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE m2 (body text) html_strip='1' "
                  "html_remove_elements='script'")
        s.execute("INSERT INTO m2 (id, body) VALUES "
                  "(1, '<b>apple</b><script>pear()</script>')")
        r = s.execute("SELECT id FROM m2 WHERE MATCH('apple')")[0]
        assert [row[0] for row in r.rows] == [1]
        r = s.execute("SELECT id FROM m2 WHERE MATCH('pear')")[0]
        assert r.rows == []

    def test_wordforms_inline(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE m3 (body text) "
                  "wordforms='walks > walk, walked > walk'")
        s.execute("INSERT INTO m3 (id, body) VALUES (1, 'he walks home')")
        r = s.execute("SELECT id FROM m3 WHERE MATCH('walked')")[0]
        assert [row[0] for row in r.rows] == [1]

    def test_options_survive_reopen(self, tmp_path):
        d = str(tmp_path)
        s = Session(Catalog(data_dir=d))
        s.execute("CREATE TABLE m4 (body text) morphology='stem_en'")
        s.execute("INSERT INTO m4 (id, body) VALUES (1, 'running fast')")
        s2 = Session(Catalog(data_dir=d))
        # new docs must be stemmed identically after reopen
        s2.execute("INSERT INTO m4 (id, body) VALUES (2, 'runs slowly')")
        r = s2.execute("SELECT id FROM m4 WHERE MATCH('run')")[0]
        assert sorted(row[0] for row in r.rows) == [1, 2]


class TestStringJsonAttrs:
    @pytest.fixture()
    def sess(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE sj (body text, tag string, j json)")
        s.execute("""INSERT INTO sj (id, body, tag, j) VALUES
         (1, 'x', 'red', '{"price": 10, "meta": {"cat": "a"}, "tags": [5, 9]}'),
         (2, 'x', 'blue', '{"price": 3, "meta": {"cat": "b"}}'),
         (3, 'x', 'green', '{"price": 7}')""")
        return s

    def q(self, s, sql):
        r = s.execute(sql)[0]
        assert r.error is None, (sql, r.error)
        return r.rows

    def test_string_eq_in_ne(self, sess):
        assert self.q(sess, "SELECT id FROM sj WHERE tag='red'") == [(1,)]
        assert self.q(sess, "SELECT id FROM sj WHERE tag IN "
                            "('red','green')") == [(1,), (3,)]
        assert self.q(sess, "SELECT id FROM sj WHERE tag != 'blue'") == \
            [(1,), (3,)]
        assert self.q(sess, "SELECT id FROM sj WHERE tag='nope'") == []

    def test_string_range_lexicographic(self, sess):
        assert self.q(sess, "SELECT id FROM sj WHERE tag > 'blue'") == \
            [(1,), (3,)]
        assert self.q(sess, "SELECT id FROM sj WHERE tag <= 'green'") == \
            [(2,), (3,)]

    def test_string_order_by(self, sess):
        assert self.q(sess, "SELECT id FROM sj ORDER BY tag ASC") == \
            [(2,), (3,), (1,)]
        assert self.q(sess, "SELECT id FROM sj ORDER BY tag DESC") == \
            [(1,), (3,), (2,)]

    def test_string_order_across_segments(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE sj2 (body text, tag string)")
        # separate commits -> separate segments with different ordinal maps
        for i, tag in enumerate(["mango", "apple", "zebra", "kiwi"], 1):
            s.execute(f"INSERT INTO sj2 (id, body, tag) VALUES "
                      f"({i}, 'x', '{tag}')")
        rows = self.q(s, "SELECT tag FROM sj2 ORDER BY tag ASC")
        assert [r[0] for r in rows] == ["apple", "kiwi", "mango", "zebra"]
        rows = self.q(s, "SELECT tag FROM sj2 ORDER BY tag DESC")
        assert [r[0] for r in rows] == ["zebra", "mango", "kiwi", "apple"]

    def test_json_select_paths(self, sess):
        assert self.q(sess, "SELECT id, j.price FROM sj") == \
            [(1, 10), (2, 3), (3, 7)]
        assert self.q(sess, "SELECT id, j.meta.cat FROM sj WHERE id=1") == \
            [(1, 'a')]
        assert self.q(sess, "SELECT id, j.tags.1 FROM sj WHERE id=1") == \
            [(1, 9)]

    def test_json_filters(self, sess):
        assert self.q(sess, "SELECT id FROM sj WHERE j.price > 5") == \
            [(1,), (3,)]
        assert self.q(sess, "SELECT id FROM sj WHERE j.price > 5 AND "
                            "j.price <= 7") == [(3,)]
        assert self.q(sess, "SELECT id FROM sj WHERE j.meta.cat = 'a'") == \
            [(1,)]
        assert self.q(sess, "SELECT id FROM sj WHERE j.nosuch = 1") == []
        assert self.q(sess, "SELECT id FROM sj WHERE j.price "
                            "BETWEEN 3 AND 7") == [(2,), (3,)]

    def test_json_filter_with_match(self, sess):
        sess.execute("INSERT INTO sj (id, body, tag, j) VALUES "
                     "(4, 'findme', 'red', '{\"price\": 100}')")
        rows = self.q(sess, "SELECT id FROM sj WHERE MATCH('findme') "
                            "AND j.price > 50")
        assert rows == [(4,)]


class TestAggregateExtras:
    @pytest.fixture()
    def sess(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE ag (body text, grp uint, lat float, "
                  "lon float, tag string)")
        s.execute("""INSERT INTO ag (id, body, grp, lat, lon, tag) VALUES
         (1, 'x a', 1, 0.6, 0.1, 'r'), (2, 'x b', 1, 0.7, 0.2, 'g'),
         (3, 'y c', 2, 0.8, 0.3, 'r')""")
        return s

    def q(self, s, sql):
        r = s.execute(sql)[0]
        assert r.error is None, (sql, r.error)
        return r.rows

    def test_group_concat(self, sess):
        assert self.q(sess, "SELECT grp, GROUP_CONCAT(id) FROM ag "
                            "GROUP BY grp") == [(1, '1,2'), (2, '3')]
        # default grouped order ties (weight desc) break by the group
        # REP's rowid asc (sphinxsort.cpp:4678): 'r' (rep doc 1) first
        assert self.q(sess, "SELECT tag, GROUP_CONCAT(id) FROM ag "
                            "GROUP BY tag") == [('r', '1,3'), ('g', '2')]

    def test_group_concat_respects_match(self, sess):
        assert self.q(sess, "SELECT grp, GROUP_CONCAT(id) FROM ag "
                            "WHERE MATCH('x') GROUP BY grp") == [(1, '1,2')]

    def test_having_alias(self, sess):
        assert self.q(sess, "SELECT grp, count(*) c FROM ag GROUP BY grp "
                            "HAVING c > 1") == [(1, 2)]

    def test_group_by_string_attr_shows_values(self, sess):
        assert self.q(sess, "SELECT tag, count(*) FROM ag GROUP BY tag") == \
            [('r', 2), ('g', 1)]

    def test_order_by_expression_alias(self, sess):
        rows = self.q(sess, "SELECT id, GEODIST(lat, lon, 0.65, 0.15) AS d "
                            "FROM ag ORDER BY d ASC")
        assert [r[0] for r in rows] == [2, 1, 3]
        rows = self.q(sess, "SELECT id, grp*-10 AS nk FROM ag ORDER BY nk "
                            "ASC")
        assert [r[0] for r in rows] == [3, 1, 2]

    def test_string_literals_in_expressions(self, sess):
        rows = self.q(sess, "SELECT id, IF(grp=1, 'one', 'other') FROM ag")
        assert rows == [(1, 'one'), (2, 'one'), (3, 'other')]

    def test_implicit_alias(self, sess):
        r = sess.execute("SELECT grp g2, count(*) c FROM ag GROUP BY grp")[0]
        assert r.columns == ["g2", "c"]


class TestCutoffAndShowTables:
    def test_cutoff(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE co (body text)")
        s.execute("INSERT INTO co (id, body) VALUES " + ", ".join(
            f"({i}, 'common word')" for i in range(1, 8)))
        r = s.execute("SELECT id FROM co WHERE MATCH('common') "
                      "OPTION cutoff=2")[0]
        assert r.error is None and len(r.rows) == 2
        meta = {k: v for k, v in s.execute("SHOW META")[0].rows}
        assert meta["total_found"] == "2"

    def test_show_tables_types(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE rt1 (body text)")
        s.execute("CREATE TABLE pq1 (body text) type='percolate'")
        rows = dict(s.execute("SHOW TABLES")[0].rows)
        assert rows["rt1"] == "rt" and rows["pq1"] == "percolate"


class TestImplicitAggregation:
    def test_count_star_without_group_by(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE ia (body text, grp uint)")
        s.execute("INSERT INTO ia (id, body, grp) VALUES "
                  "(1,'x',3),(2,'x y',5),(3,'y',9)")
        assert s.execute("SELECT COUNT(*) FROM ia")[0].rows == [(3,)]
        assert s.execute("SELECT COUNT(*) FROM ia WHERE MATCH('x')"
                         )[0].rows == [(2,)]
        r = s.execute("SELECT COUNT(*), SUM(grp), MIN(grp), MAX(grp) "
                      "FROM ia")[0]
        assert r.rows == [(3, 17, 3, 9)]
        # empty match set -> one zero row (SQL semantics)
        assert s.execute("SELECT COUNT(*) FROM ia WHERE MATCH('zz')"
                         )[0].rows == [(0,)]

    def test_order_by_rand(self):
        s = Session(Catalog())
        s.execute("CREATE TABLE ir (body text)")
        s.execute("INSERT INTO ir (id, body) VALUES (1,'x'),(2,'x'),(3,'x')")
        r = s.execute("SELECT id FROM ir ORDER BY RAND() LIMIT 2")[0]
        assert r.error is None and len(r.rows) == 2
        assert {row[0] for row in r.rows} <= {1, 2, 3}


class TestQueryTransforms:
    """OPTION boolean_simplify / expand_keywords (sphinxquery.cpp
    transforms + sphinx.cpp ExpandKeywords)."""

    def _sess(self):
        cat = Catalog()
        s = Session(cat)
        s.execute("CREATE TABLE qt (content text) index_exact_words='1' "
                  "morphology='stem_en' min_prefix_len='1'")
        docs = ["running shoes for speed", "running fast daily",
                "shoes polish kit", "runningback position"]
        for i, c in enumerate(docs, 1):
            s.execute(f"INSERT INTO qt (id, content) VALUES ({i}, '{c}')")
        return s

    def test_boolean_simplify_factoring(self):
        s = self._sess()
        plain = s.execute("SELECT id FROM qt WHERE "
                          "MATCH('(running shoes) | (running fast)')")[0]
        simp = s.execute("SELECT id FROM qt WHERE "
                         "MATCH('(running shoes) | (running fast)') "
                         "OPTION boolean_simplify=1")[0]
        assert plain.error is None and simp.error is None
        # boolean_simplify may perturb ranking (documented); the match
        # SET must be identical
        assert {r[0] for r in plain.rows} == {r[0] for r in simp.rows}
        # factored plan has 3 unique slots but a smaller tree: check via
        # EXPLAIN-like plan repr (or at least identical match sets)
        assert {r[0] for r in simp.rows} == {1, 2}

    def test_expand_keywords_matches_prefix_and_exact(self):
        s = self._sess()
        # stem_en: 'running' stems to 'run'; doc4 'runningback' matches
        # only via the expanded prefix form running*
        base = s.execute("SELECT id FROM qt WHERE MATCH('running')")[0]
        assert {r[0] for r in base.rows} == {1, 2}
        exp = s.execute("SELECT id FROM qt WHERE MATCH('running') "
                        "OPTION expand_keywords=1")[0]
        assert exp.error is None, exp.error
        assert {r[0] for r in exp.rows} == {1, 2, 4}


class TestTokenFilterPlugins:
    def test_create_plugin_token_filter(self, tmp_path):
        import sys
        (tmp_path / "mytf.py").write_text(
            "def camel_split(token, field=None):\n"
            "    # emit extra 'alpha' for prefixed tokens; drop 'xxx'\n"
            "    if token == 'xxx':\n"
            "        return []\n"
            "    if token.startswith('prefix'):\n"
            "        return [token, token[len('prefix'):]]\n"
            "    return [token]\n")
        sys.path.insert(0, str(tmp_path))
        cat = Catalog()
        s = Session(cat)
        (r,) = s.execute("CREATE PLUGIN splitter TYPE 'index_token_filter' "
                         "SONAME 'mytf:camel_split'")
        assert r.error is None, r.error
        s.execute("CREATE TABLE tf (c text) token_filter='splitter'")
        s.execute("INSERT INTO tf (id, c) VALUES (1, 'prefixalpha xxx')")
        s.execute("INSERT INTO tf (id, c) VALUES (2, 'alpha beta')")
        # filter emitted both 'prefixalpha' and 'alpha' for doc1; 'xxx'
        # was dropped entirely
        r1 = s.execute("SELECT id FROM tf WHERE MATCH('alpha')")[0]
        assert {row[0] for row in r1.rows} == {1, 2}
        r2 = s.execute("SELECT id FROM tf WHERE MATCH('prefixalpha')")[0]
        assert {row[0] for row in r2.rows} == {1}
        r3 = s.execute("SELECT id FROM tf WHERE MATCH('xxx')")[0]
        assert r3.rows == []
        (p,) = s.execute("SHOW PLUGINS")
        assert ("index_token_filter", "splitter", "") in p.rows
        (d,) = s.execute("DROP PLUGIN splitter")
        assert d.error is None
        s.close()


class TestCollation:
    def test_utf8_general_ci_filters(self):
        cat = Catalog()
        s = Session(cat)
        s.execute("CREATE TABLE cl (c text, name string)")
        s.execute("INSERT INTO cl (id, c, name) VALUES (1, 'x', 'Alice')")
        s.execute("INSERT INTO cl (id, c, name) VALUES (2, 'x', 'alice')")
        s.execute("INSERT INTO cl (id, c, name) VALUES (3, 'x', 'Bob')")
        # default collation is libc_ci (case-insensitive, like the
        # reference daemon); binary must be requested explicitly
        r0 = s.execute("SELECT id FROM cl WHERE name='alice'")[0]
        assert sorted(row[0] for row in r0.rows) == [1, 2]
        s.execute("SET collation_connection='binary'")
        r = s.execute("SELECT id FROM cl WHERE name='alice'")[0]
        assert [row[0] for row in r.rows] == [2]
        # utf8_general_ci: case-folded comparison
        s.execute("SET collation_connection='utf8_general_ci'")
        r2 = s.execute("SELECT id FROM cl WHERE name='ALICE'")[0]
        assert r2.error is None, r2.error
        assert sorted(row[0] for row in r2.rows) == [1, 2]
        r3 = s.execute("SELECT id FROM cl WHERE name='bob'")[0]
        assert [row[0] for row in r3.rows] == [3]
        s.close()


class TestJsonOrderBy:
    def test_order_by_json_path(self):
        cat = Catalog()
        s = Session(cat)
        s.execute("CREATE TABLE jo (c text, j json)")
        rows = [(1, 30), (2, 10), (3, 20), (4, None)]
        for i, v in rows:
            jv = '{}' if v is None else '{"rank": %d}' % v
            s.execute(f"INSERT INTO jo (id, c, j) VALUES "
                      f"({i}, 'word', '{jv}')")
        r = s.execute("SELECT id FROM jo WHERE MATCH('word') "
                      "ORDER BY j.rank ASC")[0]
        assert r.error is None, r.error
        # missing json keys sort as the smallest value (reference
        # semantics: null==0 — golden test_234)
        assert [row[0] for row in r.rows] == [4, 2, 3, 1]
        r2 = s.execute("SELECT id FROM jo WHERE MATCH('word') "
                       "ORDER BY j.rank DESC")[0]
        assert [row[0] for row in r2.rows] == [1, 3, 2, 4]
        s.close()


class TestJsonGroupBy:
    def test_group_by_json_path(self):
        import json as _json
        cat = Catalog()
        s = Session(cat)
        s.execute("CREATE TABLE jg (c text, j json)")
        data = [(1, "red", 5), (2, "red", 7), (3, "blue", 1),
                (4, "red", 2), (5, "blue", 9)]
        for i, color, score in data:
            jv = _json.dumps({"color": color, "score": score}).replace(
                '"', '\\"')
            s.execute(f"INSERT INTO jg (id, c, j) VALUES "
                      f"({i}, 'word', '{jv}')")
        r = s.execute("SELECT j.color, count(*), sum(j.score) FROM jg "
                      "WHERE MATCH('word') GROUP BY j.color "
                      "ORDER BY count(*) DESC")[0]
        assert r.error is None, r.error
        got = {row[0]: (row[1], row[2]) for row in r.rows}
        assert got == {"red": (3, 14), "blue": (2, 10)}
        assert r.rows[0][0] == "red"     # count desc ordering
        s.close()


class TestAutocomplete:
    def test_call_autocomplete(self):
        cat = Catalog()
        s = Session(cat)
        s.execute("CREATE TABLE ac (c text)")
        docs = ["program in python", "programming languages",
                "program flow", "progress report", "prose text"]
        for i, c in enumerate(docs, 1):
            s.execute(f"INSERT INTO ac (id, c) VALUES ({i}, '{c}')")
        (r,) = s.execute("CALL AUTOCOMPLETE('prog', 'ac')")
        assert r.error is None
        words = [row[0] for row in r.rows]
        # 'program' df=2 ranks first; all completions share the prefix
        assert words[0] == "program"
        assert set(words) == {"program", "programming", "progress"}
        (r2,) = s.execute("CALL AUTOCOMPLETE('prog', 'ac', 1 as limit)")
        assert [row[0] for row in r2.rows] == ["program"]
        s.close()
