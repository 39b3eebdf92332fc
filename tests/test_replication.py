"""Primary->replica binlog shipping (searchdreplication.cpp analog:
write-set replication re-designed as Raft-style WAL streaming)."""
import asyncio
import threading
import time

import pytest

from manticoresearch_tpu.exec.searcher import SearchQuery
from manticoresearch_tpu.exec.session import Catalog, Session
from manticoresearch_tpu.server.repl import Replica, ReplicationServer


@pytest.fixture()
def primary(tmp_path):
    cat = Catalog(data_dir=str(tmp_path / "primary"))
    s = Session(cat)
    s.execute("CREATE TABLE t (body text, grp uint)")
    loop = asyncio.new_event_loop()
    srv = ReplicationServer(cat, port=0)
    started = threading.Event()
    holder = {}

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.start())
        holder["port"] = srv._server.sockets[0].getsockname()[1]
        started.set()
        loop.run_forever()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert started.wait(10)
    yield cat, s, holder["port"]
    loop.call_soon_threadsafe(loop.stop)


class TestReplication:
    def test_stream_and_catchup(self, primary, tmp_path):
        cat, s, port = primary
        # writes BEFORE the replica exists (catch-up path)
        s.execute("INSERT INTO t (id, body, grp) VALUES (1, 'aa bb', 1)")
        s.execute("INSERT INTO t (id, body, grp) VALUES (2, 'aa cc', 2)")

        fcat = Catalog(data_dir=str(tmp_path / "replica"))
        fs = Session(fcat)
        fs.execute("CREATE TABLE t (body text, grp uint)")
        rep = Replica(fcat.get("t"), "127.0.0.1", port)
        rep.start()
        try:
            assert rep.wait_for(2), rep.error
            r = fs.execute("SELECT id FROM t WHERE MATCH('aa')")[0]
            assert sorted(x[0] for x in r.rows) == [1, 2]

            # live writes stream through: insert + update + delete
            s.execute("INSERT INTO t (id, body, grp) VALUES (3, 'aa dd', 3)")
            s.execute("UPDATE t SET grp=9 WHERE id=1")
            s.execute("DELETE FROM t WHERE id=2")
            assert rep.wait_for(5), rep.error
            time.sleep(0.1)
            r = fs.execute("SELECT id, grp FROM t WHERE MATCH('aa')")[0]
            assert sorted(r.rows) == [(1, 9), (3, 3)]
        finally:
            rep.stop()

    def test_replica_restart_resumes(self, primary, tmp_path):
        cat, s, port = primary
        s.execute("INSERT INTO t (id, body, grp) VALUES (1, 'xx', 1)")
        fdir = str(tmp_path / "replica2")
        fcat = Catalog(data_dir=fdir)
        Session(fcat).execute("CREATE TABLE t (body text, grp uint)")
        rep = Replica(fcat.get("t"), "127.0.0.1", port)
        rep.start()
        assert rep.wait_for(1), rep.error
        rep.stop()

        # reopen the replica from disk: local WAL replay restores state,
        # and a new subscription resumes from the persisted offset
        fcat2 = Catalog(data_dir=fdir)
        t2 = fcat2.get("t")
        assert t2.n_docs == 1
        s.execute("INSERT INTO t (id, body, grp) VALUES (2, 'xx yy', 2)")
        rep2 = Replica(t2, "127.0.0.1", port)
        rep2.applied = 1   # resume after the already-applied record
        rep2.start()
        try:
            assert rep2.wait_for(2), rep2.error
            r = Session(fcat2).execute("SELECT id FROM t WHERE "
                                       "MATCH('xx')")[0]
            assert sorted(x[0] for x in r.rows) == [1, 2]
        finally:
            rep2.stop()


class TestSST:
    def test_replica_joins_via_snapshot(self, primary, tmp_path):
        """A replica with no history joins after the primary's binlog was
        truncated by FLUSH: only SST can produce the full state."""
        cat, s, port = primary
        for i in range(1, 6):
            s.execute(f"INSERT INTO t (id, body, grp) VALUES "
                      f"({i}, 'early doc {i}', 1)")
        s.execute("FLUSH TABLE t")          # snapshot + binlog reset
        for i in range(6, 9):
            s.execute(f"INSERT INTO t (id, body, grp) VALUES "
                      f"({i}, 'late doc {i}', 2)")
        # joining replica: empty table, own data_dir, sst=True
        from manticoresearch_tpu.index.rt import RtIndex
        prim_t = cat.get("t")
        rep = RtIndex("t", prim_t.schema, prim_t.tok_settings,
                      prim_t.dict_settings,
                      data_dir=str(tmp_path / "replica_sst"))
        r = Replica(rep, "127.0.0.1", port, sst=True)
        r.start()
        try:
            t0 = time.time()
            while time.time() - t0 < 15:
                if r.error:
                    raise AssertionError(r.error)
                if rep.n_docs == 8:
                    break
                time.sleep(0.05)
            assert rep.n_docs == 8
            res = rep.search(SearchQuery(match="early", limit=10))
            assert {m.docid for m in res.matches} == {1, 2, 3, 4, 5}
            res2 = rep.search(SearchQuery(match="late", limit=10))
            assert {m.docid for m in res2.matches} == {6, 7, 8}
            # live stream continues after the snapshot
            s.execute("INSERT INTO t (id, body, grp) VALUES "
                      "(9, 'fresh doc', 3)")
            t0 = time.time()
            while time.time() - t0 < 15 and rep.n_docs < 9:
                time.sleep(0.05)
            assert rep.n_docs == 9
        finally:
            r.stop()
