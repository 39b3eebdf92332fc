"""Replication: WAL (binlog) shipping between nodes.

Behavioral model: the reference replicates RT/PQ write sets between
cluster nodes (searchdreplication.cpp: Galera total-order certification of
ReplicationCommand_e records; new nodes catch up via SST/IST). TPU
redesign is a simpler primary->replica log stream, Raft-style: the
primary serves each table's binlog over TCP from a requested offset and
then tails it; the replica applies records through the same code path as
startup WAL replay (RtIndex.apply_binlog_record) and persists them in its
own binlog, so a replica restart resumes from its local offset.

Protocol (JSON lines over TCP):
  client -> {"table": "t1", "offset": N}\n
  server -> {"seq": N, "rec": {...}}\n            (one per WAL record)
            {"error": "..."}\n                     (then closes)
The stream stays open; new records are shipped as they are written
(file-tail polling — no daemon hooks needed).
"""
from __future__ import annotations

import asyncio
import json
import os
import threading


class ReplicationServer:
    """Primary side: serves table binlogs (runs next to the daemon)."""

    def __init__(self, catalog, host: str = "127.0.0.1", port: int = 9312,
                 poll_interval: float = 0.1):
        self.catalog = catalog
        self.host = host
        self.port = port
        self.poll = poll_interval
        self._server: asyncio.AbstractServer | None = None

    async def start(self) -> None:
        self._server = await asyncio.start_server(
            self._handle, self.host, self.port)

    async def stop(self) -> None:
        if self._server:
            self._server.close()
            await self._server.wait_closed()

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter) -> None:
        try:
            line = await reader.readline()
            req = json.loads(line)
            table = self.catalog.get(str(req["table"]))
            path = table._binlog_path
            if not path:
                writer.write(json.dumps(
                    {"error": "table has no binlog (no data_dir)"}
                ).encode() + b"\n")
                await writer.drain()
                return
            seq = int(req.get("offset", 0))
            pos = 0
            skipped = 0
            while True:
                # tail the binlog file from the last byte position
                if os.path.exists(path):
                    with open(path, "r", encoding="utf-8") as f:
                        f.seek(pos)
                        for line in f:
                            if not line.endswith("\n"):
                                break  # torn tail; re-read next poll
                            pos += len(line.encode("utf-8"))
                            if not line.strip():
                                continue
                            if skipped < seq:
                                skipped += 1
                                continue
                            writer.write(json.dumps(
                                {"seq": skipped, "rec": json.loads(line)}
                            ).encode() + b"\n")
                            skipped += 1
                    await writer.drain()
                await asyncio.sleep(self.poll)
        except (ConnectionError, asyncio.IncompleteReadError,
                json.JSONDecodeError, ValueError, KeyError) as e:
            try:
                writer.write(json.dumps({"error": str(e)}).encode() + b"\n")
                await writer.drain()
            except ConnectionError:
                pass
        finally:
            writer.close()


class Replica:
    """Follower side: subscribes one table to a primary and applies the
    stream. Runs on a background thread with its own event loop."""

    def __init__(self, table, host: str, port: int):
        self.table = table
        self.host = host
        self.port = port
        self.applied = 0           # records applied (== next offset)
        self.error: str | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- lifecycle -------------------------------------------------------
    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def _run(self) -> None:
        asyncio.run(self._pull())

    def _apply(self, rec: dict) -> None:
        t = self.table
        t._binlog_write(rec)               # persist locally first
        saved = t._binlog
        t._binlog = None                   # apply without double-logging
        try:
            t.apply_binlog_record(rec)
        finally:
            t._binlog = saved
        self.applied += 1

    async def _pull(self) -> None:
        try:
            reader, writer = await asyncio.open_connection(
                self.host, self.port)
            writer.write(json.dumps(
                {"table": self.table.name, "offset": self.applied}
            ).encode() + b"\n")
            await writer.drain()
            while not self._stop.is_set():
                try:
                    line = await asyncio.wait_for(reader.readline(),
                                                  timeout=0.25)
                except asyncio.TimeoutError:
                    continue
                if not line:
                    break
                msg = json.loads(line)
                if "error" in msg:
                    self.error = msg["error"]
                    break
                self._apply(msg["rec"])
            writer.close()
        except (ConnectionError, OSError, json.JSONDecodeError) as e:
            self.error = str(e)

    def wait_for(self, n_records: int, timeout: float = 10.0) -> bool:
        """Block until n_records have been applied (test/ops helper)."""
        import time
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            if self.error:
                return False
            if self.applied >= n_records:
                return True
            time.sleep(0.02)
        return False
