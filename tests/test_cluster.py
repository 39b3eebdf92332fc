"""Multi-master cluster replication (searchdreplication.cpp semantics via
the sequencer-ordered log, server/cluster.py): writes land on ANY node,
every member applies the same total order, conflicting writes certify
identically everywhere."""
import tempfile
import time

import pytest

from manticoresearch_tpu.exec.session import Catalog, Session
from manticoresearch_tpu.server.cluster import ClusterService

BASE_PORT = 19410


def _node(tmp, i):
    cat = Catalog(data_dir=f"{tmp}/node{i}")
    svc = ClusterService(cat, port=BASE_PORT + i)
    svc.start()
    cat.cluster_service = svc
    return cat, Session(cat), svc


def _rows(sess, q):
    r = sess.execute(q)[0]
    assert r.error is None, r.error
    return r.rows


def _wait_converged(cats, cluster, seq, timeout=10.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if all(c.clusters[cluster].applied >= seq for c in cats):
            return True
        time.sleep(0.02)
    return False


@pytest.fixture()
def three_nodes():
    with tempfile.TemporaryDirectory() as tmp:
        nodes = [_node(tmp, i) for i in range(3)]
        try:
            yield nodes
        finally:
            for _cat, _s, svc in nodes:
                svc.stop()


class TestCluster:
    def test_three_node_convergence(self, three_nodes):
        (cat_a, sa, _), (cat_b, sb, _), (cat_c, sc, _) = three_nodes
        assert sa.execute("CREATE TABLE t (body text, gid uint)")[0].error \
            is None
        assert sa.execute("CREATE CLUSTER posts")[0].error is None
        assert sa.execute("ALTER CLUSTER posts ADD t")[0].error is None
        # seed a row before the others join: JOIN must SST it over
        assert sa.execute(
            "INSERT INTO posts:t (id, body, gid) VALUES (1, 'seed', 1)"
        )[0].error is None

        addr = f"127.0.0.1:{BASE_PORT}"
        assert sb.execute(
            f"JOIN CLUSTER posts AT '{addr}'")[0].error is None
        assert sc.execute(
            f"JOIN CLUSTER posts AT '{addr}'")[0].error is None

        # writes land on every node
        assert sb.execute(
            "INSERT INTO posts:t (id, body, gid) VALUES (2, 'from b', 2)"
        )[0].error is None
        assert sc.execute(
            "INSERT INTO posts:t (id, body, gid) VALUES (3, 'from c', 3)"
        )[0].error is None
        assert sa.execute(
            "INSERT INTO posts:t (id, body, gid) VALUES (4, 'from a', 4)"
        )[0].error is None

        seq = cat_a.clusters["posts"].applied
        assert _wait_converged([cat_a, cat_b, cat_c], "posts", seq)
        for s in (sa, sb, sc):
            rows = _rows(s, "SELECT id, gid FROM t ORDER BY id ASC")
            assert [(r[0], r[1]) for r in rows] == [
                (1, 1), (2, 2), (3, 3), (4, 4)]

        # searching via MATCH works on a replica
        rows = _rows(sc, "SELECT id FROM t WHERE MATCH('seed')")
        assert [r[0] for r in rows] == [1]

    def test_conflicting_writes_certify_identically(self, three_nodes):
        (cat_a, sa, _), (cat_b, sb, _), (cat_c, sc, _) = three_nodes
        sa.execute("CREATE TABLE t (body text, gid uint)")
        sa.execute("CREATE CLUSTER c2")
        sa.execute("ALTER CLUSTER c2 ADD t")
        addr = f"127.0.0.1:{BASE_PORT}"
        assert sb.execute(f"JOIN CLUSTER c2 AT '{addr}'")[0].error is None
        assert sc.execute(f"JOIN CLUSTER c2 AT '{addr}'")[0].error is None

        # conflicting REPLACEs of the same id from two different nodes:
        # the sequencer's total order makes the same one win everywhere
        assert sb.execute(
            "REPLACE INTO c2:t (id, body, gid) VALUES (7, 'b wins?', 20)"
        )[0].error is None
        assert sc.execute(
            "REPLACE INTO c2:t (id, body, gid) VALUES (7, 'c wins?', 30)"
        )[0].error is None

        seq = max(c.clusters["c2"].applied for c in (cat_a, cat_b, cat_c))
        assert _wait_converged([cat_a, cat_b, cat_c], "c2", seq)
        vals = set()
        for s in (sa, sb, sc):
            rows = _rows(s, "SELECT gid FROM t WHERE id=7")
            assert len(rows) == 1
            vals.add(rows[0][0])
        assert len(vals) == 1        # identical certification outcome
        # the later sequence number won (c's write followed b's)
        assert vals == {30}

        # cluster UPDATE + DELETE replicate too
        assert sa.execute(
            "UPDATE c2:t SET gid=99 WHERE id=7")[0].error is None
        seq = cat_a.clusters["c2"].applied
        assert _wait_converged([cat_a, cat_b, cat_c], "c2", seq)
        for s in (sa, sb, sc):
            assert _rows(s, "SELECT gid FROM t WHERE id=7")[0][0] == 99
        assert sb.execute("DELETE FROM c2:t WHERE id=7")[0].error is None
        seq = cat_b.clusters["c2"].applied
        assert _wait_converged([cat_a, cat_b, cat_c], "c2", seq)
        for s in (sa, sb, sc):
            assert _rows(s, "SELECT gid FROM t WHERE id=7") == []

    def test_plain_write_into_clustered_table_rejected(self, three_nodes):
        (_cat_a, sa, _), _, _ = three_nodes
        sa.execute("CREATE TABLE t (body text)")
        sa.execute("CREATE CLUSTER c3")
        sa.execute("ALTER CLUSTER c3 ADD t")
        r = sa.execute("INSERT INTO t (id, body) VALUES (1, 'x')")[0]
        assert r.error and "c3:t" in r.error

    def test_cluster_status(self, three_nodes):
        (_cat_a, sa, _), _, _ = three_nodes
        sa.execute("CREATE TABLE t (body text)")
        sa.execute("CREATE CLUSTER c4")
        sa.execute("ALTER CLUSTER c4 ADD t")
        rows = _rows(sa, "SHOW STATUS LIKE 'cluster_c4%'")
        names = {r[0] for r in rows}
        assert "cluster_c4_node_state" in names
