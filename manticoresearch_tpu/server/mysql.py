"""MySQL 4.1 wire-protocol frontend speaking SphinxQL.

Behavioral model: the reference's MySQL-wire loop (netreceive_ql.cpp:585-881
LoopClientMySQL: handshake, packet framing, OK/ERR/result-set encoding).
Implements protocol v10 handshake, COM_QUERY/COM_PING/COM_INIT_DB/COM_QUIT;
auth accepts any credentials (like the reference's default). No SSL or
compression yet (compressed_mysql.cpp / searchdssl.cpp analogs TODO).

Any MySQL client (mysql CLI, PyMySQL, connectors) can talk to this port.
"""
from __future__ import annotations

import asyncio
import struct

from ..exec.session import Catalog, QLResult, Session

CLIENT_PROTOCOL_41 = 0x0200
CLIENT_CONNECT_WITH_DB = 0x0008
CLIENT_MULTI_RESULTS = 0x20000
CLIENT_PLUGIN_AUTH = 0x80000
SERVER_MORE_RESULTS_EXISTS = 0x0008

COM_QUIT = 0x01
COM_INIT_DB = 0x02
COM_QUERY = 0x03
COM_FIELD_LIST = 0x04
COM_PING = 0x0E

SERVER_VERSION = b"5.5.21-manticoresearch-tpu"


def _lenenc_int(n: int) -> bytes:
    if n < 251:
        return bytes([n])
    if n < 2**16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 2**24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _lenenc_str(s: bytes) -> bytes:
    return _lenenc_int(len(s)) + s


class _Conn:
    def __init__(self, reader, writer, session: Session):
        self.reader = reader
        self.writer = writer
        self.session = session
        self.seq = 0

    async def read_packet(self) -> bytes | None:
        try:
            head = await self.reader.readexactly(4)
        except (asyncio.IncompleteReadError, ConnectionError):
            return None
        length = head[0] | (head[1] << 8) | (head[2] << 16)
        self.seq = head[3]
        try:
            return await self.reader.readexactly(length)
        except (asyncio.IncompleteReadError, ConnectionError):
            return None

    def send_packet(self, payload: bytes) -> None:
        self.seq = (self.seq + 1) % 256
        head = struct.pack("<I", len(payload))[:3] + bytes([self.seq])
        self.writer.write(head + payload)

    # ---- packet builders ----
    def send_handshake(self) -> None:
        salt = b"12345678" + b"123456789012"
        payload = (
            b"\x0a" + SERVER_VERSION + b"\x00"
            + struct.pack("<I", 1)                      # thread id
            + salt[:8] + b"\x00"
            + struct.pack("<H", CLIENT_PROTOCOL_41 | CLIENT_CONNECT_WITH_DB)
            + b"\x21"                                    # charset utf8
            + struct.pack("<H", 2)                       # status
            + struct.pack("<H", 0)                       # caps hi
            + bytes([len(salt) + 1])
            + b"\x00" * 10
            + salt[8:] + b"\x00"
        )
        self.seq = 255  # handshake is seq 0
        self.send_packet(payload)

    def send_ok(self, affected: int = 0, warning: str | None = None,
                more: bool = False) -> None:
        warnings = 1 if warning else 0
        status = 2 | (SERVER_MORE_RESULTS_EXISTS if more else 0)
        payload = (b"\x00" + _lenenc_int(affected) + _lenenc_int(0)
                   + struct.pack("<H", status) + struct.pack("<H", warnings))
        self.send_packet(payload)

    def send_err(self, msg: str, code: int = 1064) -> None:
        payload = (b"\xff" + struct.pack("<H", code) + b"#" + b"42000"
                   + msg.encode("utf-8"))
        self.send_packet(payload)

    def send_eof(self, more: bool = False) -> None:
        status = 2 | (SERVER_MORE_RESULTS_EXISTS if more else 0)
        self.send_packet(b"\xfe" + struct.pack("<H", 0)
                         + struct.pack("<H", status))

    def send_resultset(self, r: QLResult, more: bool = False) -> None:
        self.send_packet(_lenenc_int(len(r.columns)))
        for col in r.columns:
            name = col.encode("utf-8")
            payload = (
                _lenenc_str(b"def") + _lenenc_str(b"") + _lenenc_str(b"")
                + _lenenc_str(b"") + _lenenc_str(name) + _lenenc_str(name)
                + b"\x0c" + struct.pack("<H", 0x21)
                + struct.pack("<I", 255) + bytes([0xFD])
                + struct.pack("<H", 0) + b"\x00" + b"\x00\x00"
            )
            self.send_packet(payload)
        self.send_eof()
        for row in r.rows:
            out = b""
            for v in row:
                if v is None:
                    out += b"\xfb"
                else:
                    if isinstance(v, float) and v.is_integer():
                        s = repr(v)
                    elif isinstance(v, list):
                        # MVA column: bare comma-joined values
                        # (SendMysqlRow MVA render, searchd.cpp)
                        s = ",".join(str(x) for x in v)
                    else:
                        s = str(v)
                    out += _lenenc_str(s.encode("utf-8"))
            self.send_packet(out)
        self.send_eof(more)

    # ---- main loop ----
    async def run(self) -> None:
        self.send_handshake()
        await self.writer.drain()
        auth = await self.read_packet()
        if auth is None:
            return
        self.send_ok()
        await self.writer.drain()
        while True:
            pkt = await self.read_packet()
            if pkt is None or not pkt:
                break
            cmd = pkt[0]
            if cmd == COM_QUIT:
                break
            if cmd in (COM_PING, COM_INIT_DB):
                self.send_ok()
            elif cmd == COM_FIELD_LIST:
                self.send_eof()
            elif cmd == COM_QUERY:
                sql = pkt[1:].decode("utf-8", "replace")
                results = self.session.execute(sql)
                for i, r in enumerate(results):
                    more = i + 1 < len(results)
                    if r.error:
                        self.send_err(r.error)
                        break  # error terminates a multi-result sequence
                    elif r.columns:
                        self.send_resultset(r, more=more)
                    else:
                        self.send_ok(r.affected, r.warning, more=more)
            else:
                self.send_err(f"unsupported command {cmd:#x}", 1047)
            await self.writer.drain()


class MysqlServer:
    def __init__(self, catalog: Catalog, host: str = "127.0.0.1",
                 port: int = 9306):
        self.catalog = catalog
        self.host = host
        self.port = port
        self._server: asyncio.AbstractServer | None = None

    async def start(self) -> None:
        self._server = await asyncio.start_server(
            self._handle, self.host, self.port)

    async def stop(self) -> None:
        if self._server:
            self._server.close()
            await self._server.wait_closed()

    async def serve_forever(self) -> None:
        await self.start()
        async with self._server:
            await self._server.serve_forever()

    async def _handle(self, reader, writer) -> None:
        peer = writer.get_extra_info("peername")
        host = f"{peer[0]}:{peer[1]}" if peer else "local"
        conn = _Conn(reader, writer, Session(self.catalog, proto="mysql",
                                             host=host))
        try:
            await conn.run()
        except (ConnectionError, asyncio.IncompleteReadError):
            pass
        finally:
            conn.session.close()
            writer.close()


def run_mysql_server(catalog: Catalog, host="127.0.0.1", port=9306):
    asyncio.run(MysqlServer(catalog, host, port).serve_forever())
