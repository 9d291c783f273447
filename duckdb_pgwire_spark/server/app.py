"""asyncio PostgreSQL wire-protocol server over a shared SparkSession.

Architecture = the reference's, re-expressed for Spark (SURVEY.md §3.1):

reference (src/duckdb_pgwire_extension.cpp)      this server
---------------------------------------------    ----------------------------
detached server thread on port 15432 (:180,214)  asyncio event loop, same port
handler factory per session (:184-186)           _handle() task per connection
fresh Connection per query, shared DB (:42)      shared SparkSession per query
conn.Prepare(q) → names/types (:52,62-64)        df = spark.sql(q); df.schema
   → RowDescription (:75-88)                        → RowDescription
p->Execute(); chunk iteration (:97,119)          df.toLocalIterator() batches
per-value text encode / NULL (:120-165)          typemap.encode_cell
errors → SqlException(DataException) (:65-73)    ErrorResponse, SQLSTATE kept
pg_is_in_recovery / duckdb_pgwire UDFs (:206-12) registered in Spark catalog

Simple-query protocol only (text format), matching the reference's
"Extended Query" unchecked milestone (README.md:23-29). Spark calls are
blocking → they run on a thread-pool executor; result rows stream to the
socket in bounded batches (the analogue of DataChunk-at-a-time, never a
full collect).
"""

from __future__ import annotations

import asyncio
import concurrent.futures
import logging
import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from . import protocol as P
from .compat import parse_copy, rewrite, split_statements
from .typemap import encode_cell, pg_oid, reference_visible

log = logging.getLogger("duckdb_pgwire_spark.server")

_BATCH_ROWS = 1024  # rows per write burst (the reference's chunks are ~2048)


def _command_tag(sql: str, nrows: int) -> str:
    head = sql.lstrip().split(None, 1)
    word = head[0].upper() if head else "SELECT"
    if word == "SELECT" or word == "WITH" or word == "VALUES" or word == "TABLE":
        return f"SELECT {nrows}"
    if word == "INSERT":
        return f"INSERT 0 {nrows}"
    if word in ("UPDATE", "DELETE"):
        return f"{word} {nrows}"
    return word if len(head) == 1 else f"{word} {head[1].split(None, 1)[0].upper()}"


class PgWireServer:
    """One shared SparkSession serving any number of PG clients."""

    def __init__(
        self,
        spark: SparkSession,
        host: str = "0.0.0.0",
        port: int = 15432,
        reference_compat: bool = False,
        max_workers: int = 8,
        isolate_sessions: bool = False,
        session_setup=None,
    ) -> None:
        self.spark = spark
        self.host = host
        self.port = port
        # reference_compat=True reproduces the reference's drop-unmapped-
        # columns quirk (SURVEY.md §1.2) for bug-for-bug testing.
        self.reference_compat = reference_compat
        # isolate_sessions=True gives each client its own
        # spark.newSession(): shared catalog/executors, isolated temp
        # views + confs — the Spark analogue of the reference's
        # fresh-Connection-per-query on a shared DatabaseInstance
        # (cpp:42,184-186). session_setup(session) re-registers
        # per-session state (fixture views, UDFs) for each client.
        self.isolate_sessions = isolate_sessions
        self.session_setup = session_setup
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=max_workers)
        self._server: asyncio.AbstractServer | None = None
        self._writers: set[asyncio.StreamWriter] = set()

    # ------------------------------------------------------------ lifecycle

    async def start(self) -> None:
        self._server = await asyncio.start_server(self._handle, self.host, self.port)
        log.info("pgwire listening on %s:%d", self.host, self.port)

    async def serve_forever(self) -> None:
        if self._server is None:
            await self.start()
        assert self._server is not None
        async with self._server:
            await self._server.serve_forever()

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
        # Close lingering client transports while the loop is still
        # alive — otherwise their GC after loop shutdown raises
        # "Event loop is closed" unraisables.
        for w in list(self._writers):
            w.close()
            try:
                await w.wait_closed()
            except Exception:  # noqa: BLE001
                pass
        self._pool.shutdown(wait=False, cancel_futures=True)

    # ------------------------------------------------------------ handshake

    async def _handle(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        self._writers.add(writer)
        try:
            if not await self._startup(reader, writer):
                return
            if self.isolate_sessions:
                loop = asyncio.get_running_loop()

                def make_session():
                    sess = self.spark.newSession()
                    if self.session_setup is not None:
                        self.session_setup(sess)
                    return sess

                session = await loop.run_in_executor(self._pool, make_session)
            else:
                session = self.spark
            await self._query_loop(reader, writer, session)
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        except Exception:  # noqa: BLE001
            log.exception("session crashed")
        finally:
            self._writers.discard(writer)
            writer.close()
            try:
                await writer.wait_closed()
            except Exception:  # noqa: BLE001
                pass

    async def _startup(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> bool:
        while True:
            raw = await reader.readexactly(4)
            (length,) = struct.unpack("!I", raw)
            payload = await reader.readexactly(length - 4)
            (code,) = struct.unpack("!I", payload[:4])
            if code == P.SSL_REQUEST or code == P.GSSENC_REQUEST:
                writer.write(b"N")  # no TLS — reference runs ssl-disabled too
                await writer.drain()
                continue
            if code == P.CANCEL_REQUEST:
                return False
            if code != P.PROTOCOL_V3:
                writer.write(P.error_response(f"unsupported protocol {code}", "08P01"))
                await writer.drain()
                return False
            params = P.parse_startup_payload(payload[4:])
            log.info("startup: %s", params)
            break
        # trust auth (the reference does no auth at all)
        writer.write(P.auth_ok())
        for k, v in (
            ("server_version", "15.0 (duckdb_pgwire_spark)"),
            ("server_encoding", "UTF8"),
            ("client_encoding", "UTF8"),
            ("DateStyle", "ISO, MDY"),
            ("integer_datetimes", "on"),
            ("standard_conforming_strings", "on"),
        ):
            writer.write(P.parameter_status(k, v))
        writer.write(P.backend_key_data(os.getpid() & 0x7FFFFFFF, 0))
        writer.write(P.ready_for_query())
        await writer.drain()
        return True

    # ------------------------------------------------------------ queries

    async def _query_loop(
        self,
        reader: asyncio.StreamReader,
        writer: asyncio.StreamWriter,
        session: SparkSession,
    ) -> None:
        while True:
            tag = await reader.readexactly(1)
            (length,) = struct.unpack("!I", await reader.readexactly(4))
            payload = await reader.readexactly(length - 4)
            if tag == b"X":  # Terminate
                return
            if tag != b"Q":
                writer.write(
                    P.error_response(
                        f"unsupported message {tag!r} (simple query protocol only)",
                        "0A000",
                    )
                )
                writer.write(P.ready_for_query())
                await writer.drain()
                continue
            sql_text = payload.rstrip(b"\x00").decode()
            stmts = split_statements(sql_text)
            if not stmts:
                writer.write(P.empty_query_response())
            for stmt in stmts:
                try:
                    await self._run_statement(stmt, writer, session)
                except Exception as exc:  # noqa: BLE001 — any engine error → wire error
                    writer.write(P.error_response(_exc_message(exc), _sqlstate(exc)))
                    await writer.drain()
                    break  # PG aborts the rest of the message on error
            writer.write(P.ready_for_query())
            await writer.drain()

    _TXN_TAGS = {
        "BEGIN": "BEGIN",
        "START": "BEGIN",
        "COMMIT": "COMMIT",
        "END": "COMMIT",
        "ROLLBACK": "ROLLBACK",
        "ABORT": "ROLLBACK",
    }

    async def _run_statement(
        self, stmt: str, writer: asyncio.StreamWriter, session: SparkSession
    ) -> None:
        loop = asyncio.get_running_loop()
        first = stmt.lstrip().split(None, 1)[0].upper() if stmt.strip() else ""
        if first in self._TXN_TAGS:
            # PG clients autosend BEGIN/COMMIT (implicit transactions).
            # Spark has no transactions — every statement is autocommit —
            # so acknowledge as a no-op rather than erroring, like any
            # autocommit-only PG-compatible store. DuckDB behind the
            # reference DOES have transactions; documented delta.
            writer.write(P.command_complete(self._TXN_TAGS[first]))
            await writer.drain()
            return
        copy = parse_copy(stmt)
        if copy is not None:
            inner, path, fmt = copy
            nrows = await loop.run_in_executor(
                self._pool, self._run_copy, rewrite(inner), path, fmt, session
            )
            writer.write(P.command_complete(f"COPY {nrows}"))
            await writer.drain()
            return
        sql = rewrite(stmt)
        if first == "SET":
            # tolerate PG-style `SET k TO v` (session GUCs) that Spark's
            # SET parser rejects: ack as a no-op instead of erroring —
            # clients send these on connect. Spark-style SET k=v still
            # executes for real below.
            try:
                await loop.run_in_executor(self._pool, session.sql, sql)
            except Exception:  # noqa: BLE001
                pass
            writer.write(P.command_complete("SET"))
            await writer.drain()
            return
        # "prepare": analysis only — schema is known before execution,
        # exactly like conn.Prepare → GetNames/GetTypes (cpp:52,62-64).
        df: DataFrame = await loop.run_in_executor(self._pool, session.sql, sql)
        # Cells are addressed by POSITION throughout: PySpark Row name
        # lookup returns the first matching field, so duplicate output
        # names (SELECT 1 AS a, 2 AS a) would silently repeat the first
        # column's value — and a by-name select is ambiguous the same way.
        fields = [
            (i, f.name, f.dataType)
            for i, f in enumerate(df.schema.fields)
            if not self.reference_compat or reference_visible(f.dataType)
        ]
        keep_idx = [i for i, _, _ in fields]
        writer.write(
            P.row_description(
                [P.FieldDesc(name, pg_oid(dt)) for _, name, dt in fields]
            )
        )
        # "execute": stream partitions driver-side, write DataRows in
        # bounded batches — chunk-at-a-time like cpp:119-165, no collect.
        nrows = 0
        if fields:
            it: Iterator = await loop.run_in_executor(
                self._pool, lambda: iter(df.toLocalIterator())
            )
            while True:
                batch = await loop.run_in_executor(
                    self._pool, _next_batch, it, _BATCH_ROWS, keep_idx
                )
                if not batch:
                    break
                for encoded in batch:
                    writer.write(P.data_row(encoded))
                nrows += len(batch)
                await writer.drain()
        else:
            # DDL/DML or a fully-dropped schema: run for effect, count rows
            nrows = await loop.run_in_executor(self._pool, lambda: df.count())
            if self.reference_compat and df.schema.fields:
                nrows = 0
        writer.write(P.command_complete(_command_tag(stmt, nrows)))
        await writer.drain()


    def _run_copy(
        self, inner_sql: str, path: str, fmt: str, session: SparkSession | None = None
    ) -> int:
        """COPY ... TO: DataFrameWriter is the Spark-native file sink
        (distributed write — the path gets a directory of part files,
        which is the scale-correct shape; single-file output would force
        all data through one task)."""
        df = (session or self.spark).sql(inner_sql)
        n = df.count()
        writer = df.write.mode("overwrite")
        if fmt == "csv":
            writer.option("header", "true").csv(path)
        elif fmt == "json":
            writer.json(path)
        else:
            writer.parquet(path)
        return n


def _sqlstate(exc: Exception) -> str:
    """Real SQLSTATEs where Spark provides them (error-class framework);
    the reference collapses everything to one DataException class
    (cpp:68-73) — we keep the more useful codes."""
    get = getattr(exc, "getSqlState", None)
    if get is not None:
        state = get()
        if state:
            return state
    name = type(exc).__name__
    if "Parse" in name:
        return "42601"
    if "Analysis" in name:
        return "42000"
    return "22000"


def _next_batch(it: Iterator, n: int, keep_idx: list[int]) -> list[list[bytes | None]]:
    out = []
    for _ in range(n):
        try:
            row = next(it)
        except StopIteration:
            break
        out.append([encode_cell(row[i]) for i in keep_idx])
    return out


def _exc_message(exc: Exception) -> str:
    msg = str(exc)
    return msg.split("\n\nJVM stacktrace:")[0][:2000]
