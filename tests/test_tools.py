"""Config, indexer/indextool CLIs, ATTACH INDEX."""
import json
import os

import pytest

from manticoresearch_tpu.config import ConfigError, load_config
from manticoresearch_tpu.exec.session import Catalog, Session
from manticoresearch_tpu.tools.indexer import main as indexer_main
from manticoresearch_tpu.tools.indextool import check_index, main as it_main


@pytest.fixture()
def corpus_jsonl(tmp_path):
    path = tmp_path / "docs.jsonl"
    docs = [
        dict(id=1, title="red apple", body="fresh fruit", price=10.5, cat=1),
        dict(id=2, title="green pear", body="sweet fruit", price=8.25, cat=1),
        dict(id=3, title="blue car", body="fast vehicle", price=999.0, cat=2),
    ]
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    return str(path)


@pytest.fixture()
def config_file(tmp_path, corpus_jsonl):
    conf = tmp_path / "conf.toml"
    conf.write_text(f'''
[searchd]
listen_mysql = 19306
listen_http = 19308
data_dir = "{tmp_path}/data"

[index.products]
type = "plain"
source = "{corpus_jsonl}"
path = "{tmp_path}/idx/products"
fields = ["title", "body"]
attrs = {{ price = "float", cat = "uint" }}

[index.rt1]
type = "rt"
fields = ["body"]
attrs = {{ gid = "uint" }}

[index.rt1.dict]
morphology = ["stem_en"]
''')
    return str(conf)


class TestConfig:
    def test_load(self, config_file):
        cfg = load_config(config_file)
        assert cfg.searchd.listen_mysql == 19306
        assert cfg.indexes["products"].type == "plain"
        assert cfg.indexes["rt1"].dict.morphology == ("stem_en",)
        assert cfg.indexes["products"].schema.fields == ["title", "body"]

    def test_bad_attr_type(self, tmp_path):
        p = tmp_path / "bad.toml"
        p.write_text('[index.x]\nattrs = { a = "nosuch" }\n')
        with pytest.raises(ConfigError):
            load_config(str(p))


class TestIndexerTool:
    def test_build_from_config_and_check(self, config_file, tmp_path, capsys):
        assert indexer_main(["--config", config_file]) == 0
        out_dir = str(tmp_path / "idx" / "products")
        assert os.path.exists(os.path.join(out_dir, "arrays.npz"))
        assert check_index(out_dir) == []
        assert it_main(["--check", out_dir]) == 0
        assert it_main(["--dumpdict", out_dir, "--limit", "5"]) == 0

    def test_adhoc_build(self, corpus_jsonl, tmp_path):
        out = str(tmp_path / "adhoc")
        assert indexer_main([
            "--source", corpus_jsonl, "--fields", "title,body",
            "--attrs", "price=float,cat=uint", "--out", out, "--quiet"]) == 0
        assert check_index(out) == []

    def test_corrupted_index_detected(self, corpus_jsonl, tmp_path):
        out = str(tmp_path / "bad")
        indexer_main(["--source", corpus_jsonl, "--fields", "title",
                      "--out", out, "--quiet"])
        import numpy as np
        z = dict(np.load(os.path.join(out, "arrays.npz")))
        z["post_tf"] = z["post_tf"] * 0          # break tf invariant
        np.savez(os.path.join(out, "arrays.npz"), **z)
        assert check_index(out) != []


class TestAttach:
    def test_attach_and_query(self, corpus_jsonl, tmp_path):
        out = str(tmp_path / "plain1")
        indexer_main(["--source", corpus_jsonl, "--fields", "title,body",
                      "--attrs", "price=float,cat=uint", "--out", out,
                      "--quiet"])
        s = Session(Catalog())
        r = s.execute(f"ATTACH INDEX '{out}' TO TABLE products")[0]
        assert r.error is None and r.affected == 3
        r = s.execute("SELECT id, price FROM products "
                      "WHERE MATCH('fruit') ORDER BY price DESC")[0]
        assert r.rows == [(1, 10.5), (2, 8.25)]
        # attached table is writable (RT semantics after ATTACH)
        r = s.execute("INSERT INTO products (id, title, body, price, cat) "
                      "VALUES (4, 'new doc', 'fresh fruit too', 1.0, 3)")[0]
        assert r.error is None
        r = s.execute("SELECT id FROM products WHERE MATCH('fruit')")[0]
        assert len(r.rows) == 3


class TestDocstore:
    def test_blocked_roundtrip(self, tmp_path):
        from manticoresearch_tpu.index.docstore import (BlockedDocstore,
                                                        load_docstore,
                                                        save_docstore)
        vals = [f"document text number {i} " + "x" * (i % 97)
                for i in range(1000)]
        ds = BlockedDocstore.from_list(vals, block_size=64)
        assert len(ds) == 1000
        assert ds[0] == vals[0] and ds[999] == vals[999]
        assert ds[123:126] == vals[123:126]
        assert ds.compressed_bytes < sum(len(v) for v in vals)
        p = str(tmp_path / "ds.bin")
        save_docstore({"content": ds, "title": ["a", "b"]}, p)
        back = load_docstore(p)
        assert back["content"].tolist() == vals
        assert back["title"].tolist() == ["a", "b"]

    def test_save_load_packed_uses_docstore(self, tmp_path):
        from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.index.docstore import BlockedDocstore
        from manticoresearch_tpu.index.storage import (load_packed,
                                                       save_packed)
        from manticoresearch_tpu.schema import Schema
        b = IndexBuilder(Schema(fields=["content"], attrs=[]))
        b.add_documents([dict(id=i, content=f"hello world doc {i}")
                         for i in range(1, 201)])
        packed = b.build()
        p = str(tmp_path / "idx")
        save_packed(packed, p)
        back = load_packed(p)
        assert isinstance(back.stored_fields["content"], BlockedDocstore)
        assert back.stored_fields["content"][41] == "hello world doc 42"
        r = SearchIndex(back).search(SearchQuery(match="hello"))
        assert len(r.matches) == 20


class TestSources:
    def test_xmlpipe2(self, tmp_path):
        from manticoresearch_tpu.tools.indexer import read_source
        p = tmp_path / "dump.xml"
        p.write_text(
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<sphinx:docset xmlns:sphinx="sphinx">\n'
            '<sphinx:schema>\n'
            '  <sphinx:field name="subject"/>\n'
            '  <sphinx:attr name="published" type="timestamp"/>\n'
            '</sphinx:schema>\n'
            '<sphinx:document id="11"><subject>hello xml</subject>'
            '<published>1000</published></sphinx:document>\n'
            '<sphinx:document id="12"><subject>second doc</subject>'
            '<published>2000</published></sphinx:document>\n'
            '</sphinx:docset>\n')
        docs = list(read_source(str(p)))
        assert [d["id"] for d in docs] == [11, 12]
        assert docs[0]["subject"] == "hello xml"
        assert docs[1]["published"] == "2000"

    def test_sqlite_source(self, tmp_path):
        import sqlite3
        from manticoresearch_tpu.tools.indexer import read_source
        p = str(tmp_path / "src.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE documents (id INTEGER, title TEXT, "
                    "price INTEGER)")
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)",
                        [(1, "first row", 10), (2, "second row", 20)])
        con.commit()
        con.close()
        docs = list(read_source(p))
        assert [d["id"] for d in docs] == [1, 2]
        assert docs[1]["title"] == "second row"
        docs2 = list(read_source(p, "SELECT id, title FROM documents "
                                    "WHERE price > 15"))
        assert [d["id"] for d in docs2] == [2]

    def test_xmlpipe2_build_end_to_end(self, tmp_path):
        from manticoresearch_tpu.exec.searcher import SearchIndex, SearchQuery
        from manticoresearch_tpu.index.storage import load_packed
        from manticoresearch_tpu.tools.indexer import main as indexer_main
        p = tmp_path / "d.xml"
        p.write_text(
            '<sphinx:docset xmlns:sphinx="s">'
            '<sphinx:document id="1"><body>green apples</body>'
            '<price>3</price></sphinx:document>'
            '<sphinx:document id="2"><body>red apples</body>'
            '<price>5</price></sphinx:document>'
            '</sphinx:docset>')
        out = str(tmp_path / "idx")
        rc = indexer_main(["--source", str(p), "--fields", "body",
                           "--attrs", "price=uint", "--out", out,
                           "--quiet"])
        assert rc == 0
        idx = SearchIndex(load_packed(out))
        r = idx.search(SearchQuery(match="apples"))
        assert {m.docid for m in r.matches} == {1, 2}


class TestIndextoolDepth:
    @pytest.fixture(scope="class")
    def saved(self, tmp_path_factory):
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.index.storage import save_packed
        from manticoresearch_tpu.schema import AttrDef, AttrType, Schema
        d = tmp_path_factory.mktemp("itool")
        b = IndexBuilder(Schema(
            fields=["content"],
            attrs=[AttrDef("price", AttrType.UINT),
                   AttrDef("tags", AttrType.MVA)]))
        docs = [dict(id=i, content=f"common word{i % 7} text",
                     price=i, tags=[i % 3, 5]) for i in range(1, 201)]
        b.add_documents(docs)
        p = str(d / "idx")
        save_packed(b.build(), p)
        return p

    def test_deep_check_passes(self, saved, capsys):
        from manticoresearch_tpu.tools.indextool import main
        assert main(["--check", saved]) == 0
        assert "check passed" in capsys.readouterr().out

    def test_check_catches_corruption(self, saved, tmp_path):
        import shutil
        from manticoresearch_tpu.index.storage import load_packed, save_packed
        from manticoresearch_tpu.tools.indextool import check_index
        bad = str(tmp_path / "bad")
        shutil.copytree(saved, bad)
        p = load_packed(bad)
        p.hit_packed[0] = (99 << 24) | 5      # field 99 out of range
        save_packed(p, bad)
        errs = check_index(bad)
        assert any("field id" in e for e in errs)

    def test_dumpdocids_and_hitlist(self, saved, capsys):
        from manticoresearch_tpu.tools.indextool import main
        assert main(["--dumpdocids", saved, "--limit", "5"]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert out == ["1", "2", "3", "4", "5"]
        assert main(["--dumphitlist", saved, "--word", "common",
                     "--limit", "3"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert lines[0] == "docid\tfield\tpos\tend"
        assert lines[1].startswith("1\t0\t1")

    def test_stats(self, saved, capsys):
        from manticoresearch_tpu.tools.indextool import main
        assert main(["--stats", saved]) == 0
        out = capsys.readouterr().out
        assert "docs:         200" in out and "posting packed" in out


class TestGlobalIdf:
    def test_buildidf_and_option(self, tmp_path):
        import math
        from manticoresearch_tpu.exec.session import Catalog, Session
        from manticoresearch_tpu.index.builder import IndexBuilder
        from manticoresearch_tpu.index.storage import save_packed
        from manticoresearch_tpu.query.planner import compute_idf
        from manticoresearch_tpu.schema import Schema
        from manticoresearch_tpu.tools.indextool import (build_global_idf,
                                                         load_global_idf)
        # two shards with different df for 'shared'
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        for p, rng in ((p1, range(1, 6)), (p2, range(6, 16))):
            b = IndexBuilder(Schema(fields=["c"], attrs=[]))
            b.add_documents([dict(id=i, c="shared plus w%d" % i)
                             for i in rng])
            save_packed(b.build(), p)
        idf_path = str(tmp_path / "g.idf")
        build_global_idf([p1, p2], idf_path)
        df, total = load_global_idf(idf_path)
        assert df["shared"] == 15 and total == 15

        cat = Catalog()
        s = Session(cat)
        s.execute("CREATE TABLE t (c text)")
        for i in range(1, 4):
            s.execute(f"INSERT INTO t (id, c) VALUES ({i}, 'shared x{i}')")
        cat.get("t").options["global_idf"] = idf_path
        r_local = s.execute("SELECT id, weight() FROM t "
                            "WHERE MATCH('shared')")[0]
        r_glob = s.execute("SELECT id, weight() FROM t "
                           "WHERE MATCH('shared') OPTION global_idf=1")[0]
        assert r_glob.error is None, r_glob.error
        # local: df=3/3 docs; global: df=15/15 docs — weights must differ
        # per the reference idf formula with the overridden stats
        w_l = r_local.rows[0][1]
        w_g = r_glob.rows[0][1]
        lidf = compute_idf(3, 3)
        gidf = compute_idf(15, 15)
        assert w_l == int((1 / 2.2 * lidf + 0.5) * 1000) + 1000
        assert w_g == int((1 / 2.2 * gidf + 0.5) * 1000) + 1000
        s.close()


class TestReplay:
    def test_log_and_replay(self, tmp_path):
        import io
        from manticoresearch_tpu.exec.session import Catalog, Session
        from manticoresearch_tpu.tools.replay import main as replay_main
        dd = str(tmp_path / "data")
        cat = Catalog(dd)
        s = Session(cat)
        log = io.StringIO()
        s.query_log = log
        s.execute("CREATE TABLE r (c text)")
        s.execute("INSERT INTO r (id, c) VALUES (1, 'replay me twice')")
        s.execute("SELECT id FROM r WHERE MATCH('replay')")
        s.execute("SELECT id FROM r WHERE MATCH('twice') LIMIT 5")
        s.close()
        logfile = tmp_path / "q.log"
        logfile.write_text(log.getvalue())
        assert "MATCH('replay')" in log.getvalue()   # replayable verbatim
        # replay against the same data dir
        rc = replay_main(["--log", str(logfile), "--data-dir", dd,
                          "--quiet"])
        assert rc == 0
