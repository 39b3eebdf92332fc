"""DCN host tier: distributed tables over remote agents, mirrors, HA,
failover — the harness's multi-instance-on-localhost method
(helpers.inc:1320 num_agents) applied in-process: a real AgentServer on a
real socket backs the remote side."""
import asyncio
import threading

import pytest

from manticoresearch_tpu.exec.distributed import DistributedTable
from manticoresearch_tpu.exec.session import Catalog, Session
from manticoresearch_tpu.server.agent import (AgentMirror, AgentServer,
                                              MultiAgent, agent_ping,
                                              agent_search, parse_agent_spec,
                                              query_to_payload)

DOCS_A = [
    (1, "the quick brown fox jumps", 2001, 1),
    (2, "quick silver lining", 2002, 1),
    (3, "brown bread and butter", 2003, 2),
]
DOCS_B = [
    (11, "fox hunting is quick business", 2004, 2),
    (12, "silver fox in the snow", 2005, 3),
    (13, "butter and jam sandwich", 2006, 3),
]


def _make_catalog(docs):
    c = Catalog()
    s = Session(c)
    for r in s.execute(
            "CREATE TABLE t (content text, year uint, gid uint)"):
        assert r.error is None, r.error
    vals = ", ".join(f"({i}, '{txt}', {y}, {g})" for i, txt, y, g in docs)
    r = s.execute(f"INSERT INTO t (id, content, year, gid) VALUES {vals}")
    assert r[0].error is None, r[0].error
    return c


@pytest.fixture(scope="module")
def remote():
    """AgentServer thread serving DOCS_B as table 't'."""
    catalog = _make_catalog(DOCS_B)
    srv = AgentServer(catalog, port=0)
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.start())
        started.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(5)
    yield srv
    loop.call_soon_threadsafe(loop.stop)


@pytest.fixture(scope="module")
def master(remote):
    """Master catalog: local table 'ta' (DOCS_A) + distributed table 'dist'
    spanning the local part and the remote agent."""
    catalog = _make_catalog(DOCS_A)
    catalog.tables["ta"] = catalog.tables.pop("t")
    s = Session(catalog)
    for r in s.execute(
        "CREATE TABLE dist type='distributed' local='ta' "
        f"agent='127.0.0.1:{remote.port}:t'"
    ):
        assert r.error is None, r.error
    return catalog


class TestAgentProtocol:
    def test_ping(self, remote):
        m = AgentMirror("127.0.0.1", remote.port, "t")
        assert agent_ping(m)
        assert m.queries == 1 and m.errors == 0

    def test_search_raw(self, remote):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        agent = MultiAgent(parse_agent_spec(f"127.0.0.1:{remote.port}:t"))
        reply = agent_search(agent, query_to_payload(SearchQuery(match="fox")))
        assert reply["error"] is None
        assert sorted(m[0] for m in reply["matches"]) == [11, 12]
        assert reply["total_found"] == 2

    def test_unknown_table_is_remote_error(self, remote):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        from manticoresearch_tpu.server.agent import AgentError
        agent = MultiAgent(parse_agent_spec(
            f"127.0.0.1:{remote.port}:nosuch"))
        with pytest.raises(AgentError):
            agent_search(agent, query_to_payload(SearchQuery(match="fox")),
                         retry_count=0)
        assert agent.mirrors[0].errors == 1


class TestDistributedSearch:
    def test_merged_results_span_parts(self, master):
        s = Session(master)
        out = s.execute("SELECT id FROM dist WHERE MATCH('fox')")
        assert out[0].error is None, out[0].error
        ids = sorted(r[0] for r in out[0].rows)
        assert ids == [1, 11, 12]

    def test_merge_order_weight_desc_docid_asc(self, master):
        s = Session(master)
        out = s.execute("SELECT id, weight() FROM dist WHERE MATCH('quick')")
        assert out[0].error is None
        ws = [r[1] for r in out[0].rows]
        assert ws == sorted(ws, reverse=True)
        # equal weights tie-break by docid asc
        for i in range(len(out[0].rows) - 1):
            if out[0].rows[i][1] == out[0].rows[i + 1][1]:
                assert out[0].rows[i][0] < out[0].rows[i + 1][0]

    def test_word_stats_summed(self, master):
        s = Session(master)
        out = s.execute("SELECT id FROM dist WHERE MATCH('quick')")
        assert out[0].error is None
        meta = dict(s.execute("SHOW META")[0].rows)
        # 'quick' appears in docs 1,2 (local) + 11 (remote)
        assert int(meta.get("docs[0]", 0)) == 3

    def test_filters_travel_to_agents(self, master):
        s = Session(master)
        out = s.execute(
            "SELECT id FROM dist WHERE MATCH('fox') AND year >= 2004")
        assert out[0].error is None
        assert sorted(r[0] for r in out[0].rows) == [11, 12]

    def test_group_by_across_parts(self, master):
        s = Session(master)
        out = s.execute(
            "SELECT gid, count(*) FROM dist GROUP BY gid ORDER BY gid ASC")
        assert out[0].error is None, out[0].error
        got = {r[0]: r[1] for r in out[0].rows}
        assert got == {1: 2, 2: 2, 3: 2}

    def test_writes_rejected(self, master):
        s = Session(master)
        out = s.execute(
            "INSERT INTO dist (id, content, year, gid) VALUES "
            "(99, 'x', 2000, 1)")
        assert out[0].error is not None
        assert "distributed" in out[0].error

    def test_show_tables_reports_type(self, master):
        s = Session(master)
        rows = dict(s.execute("SHOW TABLES")[0].rows)
        assert rows["dist"] == "distributed"

    def test_show_agent_status(self, master):
        s = Session(master)
        out = s.execute("SHOW AGENT STATUS")[0]
        d = dict(out.rows)
        assert any(k.endswith("_addr") for k in d)
        q = [v for k, v in d.items() if k.endswith("_queries")]
        assert any(int(x) > 0 for x in q)


class TestMirrorFailover:
    def test_dead_mirror_fails_over(self, remote):
        """First mirror points at a closed port; retry picks the live one
        (RunSubset retry + mirror re-selection, searchd.cpp:6648)."""
        from manticoresearch_tpu.exec.searcher import SearchQuery

        # grab an unused port by binding and closing
        import socket as pysock
        sock = pysock.socket()
        sock.bind(("127.0.0.1", 0))
        dead_port = sock.getsockname()[1]
        sock.close()

        agent = MultiAgent(
            parse_agent_spec(
                f"127.0.0.1:{dead_port}:t|127.0.0.1:{remote.port}:t"),
            strategy="roundrobin")
        reply = agent_search(agent, query_to_payload(SearchQuery(match="fox")),
                             timeout=1.0, retry_count=2)
        assert reply["error"] is None
        assert sorted(m[0] for m in reply["matches"]) == [11, 12]
        dead = next(m for m in agent.mirrors if m.port == dead_port)
        assert dead.errors >= 1 and dead.is_dead()

    def test_nodeads_prefers_live_mirror(self, remote):
        m_dead = AgentMirror("127.0.0.1", 1, "t")
        m_dead.note_error("down")
        m_live = AgentMirror("127.0.0.1", remote.port, "t")
        agent = MultiAgent([m_dead, m_live], strategy="nodeads")
        order = agent.choose_order()
        assert order[0] is m_live

    def test_all_mirrors_dead_is_error(self):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        from manticoresearch_tpu.server.agent import AgentError
        import socket as pysock
        sock = pysock.socket()
        sock.bind(("127.0.0.1", 0))
        dead_port = sock.getsockname()[1]
        sock.close()
        agent = MultiAgent(parse_agent_spec(f"127.0.0.1:{dead_port}:t"))
        with pytest.raises(AgentError):
            agent_search(agent, query_to_payload(SearchQuery(match="x")),
                         timeout=0.5, retry_count=1)

    def test_distributed_table_partial_agent_failure_reported(self, remote):
        """A distributed table whose agent is down still serves the local
        part's rows and reports the agent failure as a WARNING — the
        reference only fails the query when NO part succeeded
        (searchd.cpp:5298 !m_iSuccesses -> error, else BuildReport ->
        m_sWarning; failed agents are skipped at :6725)."""
        catalog = _make_catalog(DOCS_A)
        import socket as pysock
        sock = pysock.socket()
        sock.bind(("127.0.0.1", 0))
        dead_port = sock.getsockname()[1]
        sock.close()
        catalog.tables["d2"] = DistributedTable(
            "d2", catalog, ["t"], [f"127.0.0.1:{dead_port}:t"],
            agent_query_timeout_ms=300, retry_count=0)
        from manticoresearch_tpu.exec.searcher import SearchQuery
        r = catalog.tables["d2"].search(SearchQuery(match="quick"))
        assert r.error is None
        assert r.warning            # agent failure surfaced in meta
        assert r.matches            # local part still answered

    def test_distributed_table_all_parts_dead_is_error(self):
        """No part succeeded -> the query errors (searchd.cpp:5298)."""
        catalog = _make_catalog(DOCS_A)
        import socket as pysock
        sock = pysock.socket()
        sock.bind(("127.0.0.1", 0))
        dead_port = sock.getsockname()[1]
        sock.close()
        catalog.tables["d3"] = DistributedTable(
            "d3", catalog, [], [f"127.0.0.1:{dead_port}:t"],
            agent_query_timeout_ms=300, retry_count=0)
        from manticoresearch_tpu.exec.searcher import SearchQuery
        r = catalog.tables["d3"].search(SearchQuery(match="quick"))
        assert r.error is not None


class TestAgentSpecParsing:
    def test_mirror_split(self):
        ms = parse_agent_spec("h1:1:t|h2:2:u")
        assert [(m.host, m.port, m.table) for m in ms] == \
            [("h1", 1, "t"), ("h2", 2, "u")]

    def test_bad_spec(self):
        with pytest.raises(ValueError):
            parse_agent_spec("justhost")


class TestPersistentConnections:
    def test_pool_reuse_and_keywords(self, remote):
        from manticoresearch_tpu.exec.searcher import SearchQuery
        from manticoresearch_tpu.server.agent import (
            CMD_KEYWORDS, MultiAgent, _request, agent_search,
            parse_agent_spec, query_to_payload)
        agent = MultiAgent(parse_agent_spec(f"127.0.0.1:{remote.port}:t"))
        m = agent.mirrors[0]
        for _ in range(3):
            r = agent_search(agent, query_to_payload(
                SearchQuery(match="fox")), timeout=2.0)
            assert "matches" in r
        # after the first request the connection is pooled and reused
        assert getattr(m, "_pool_hits", 0) >= 2
        assert len(m._pool()) >= 1
        # agent-side CALL KEYWORDS (CMD_KEYWORDS, remote df for
        # SetupLocalDF)
        r = _request(m, CMD_KEYWORDS, {"table": "t", "text": "fox zzz"},
                     timeout=2.0)
        kws = {k["normalized"]: k for k in r["keywords"]}
        assert kws["fox"]["docs"] == 2
        assert kws["zzz"]["docs"] == 0

    def test_stale_pooled_socket_retries_fresh(self, remote):
        """A dead pooled socket must not fail the request: one fresh
        reconnect retry."""
        from manticoresearch_tpu.exec.searcher import SearchQuery
        from manticoresearch_tpu.server.agent import (
            MultiAgent, agent_search, parse_agent_spec, query_to_payload)
        agent = MultiAgent(parse_agent_spec(f"127.0.0.1:{remote.port}:t"))
        m = agent.mirrors[0]
        r = agent_search(agent, query_to_payload(SearchQuery(match="fox")),
                         timeout=2.0)
        assert "matches" in r
        # poison the pooled socket
        for s in m._pool():
            s.close()
        r = agent_search(agent, query_to_payload(SearchQuery(match="fox")),
                         timeout=2.0)
        assert "matches" in r
        assert m.errors == 0
