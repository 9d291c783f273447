"""PostgreSQL wire-protocol (v3) message encoding/decoding.

Covers the simple query protocol (the reference's scope — its vendored
pgwire library serves startup/auth/Query/RowDescription/DataRow/
CommandComplete/ErrorResponse) AND the extended query protocol
(Parse/Bind/Describe/Execute/Close/Flush/Sync with text-format
parameters), which the reference leaves as an unchecked milestone
("Extended Query", /root/reference/README.md:23-29) — psycopg and JDBC
default modes need it.

Everything here is from the public PostgreSQL protocol documentation
(protocol version 3.0). Text result format only — the reference
serializes every value as text too (src/duckdb_pgwire_extension.cpp:
136-164).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

PROTOCOL_V3 = 196608  # 3 << 16
SSL_REQUEST = 80877103
CANCEL_REQUEST = 80877102
GSSENC_REQUEST = 80877104


# ---------------------------------------------------------------- encode

def _msg(tag: bytes, payload: bytes) -> bytes:
    """Tagged message: tag byte + int32 length (self-inclusive) + payload."""
    return tag + struct.pack("!I", len(payload) + 4) + payload


def auth_ok() -> bytes:
    return _msg(b"R", struct.pack("!I", 0))


def parameter_status(name: str, value: str) -> bytes:
    return _msg(b"S", name.encode() + b"\x00" + value.encode() + b"\x00")


def backend_key_data(pid: int, secret: int) -> bytes:
    return _msg(b"K", struct.pack("!II", pid, secret))


def ready_for_query(status: bytes = b"I") -> bytes:
    return _msg(b"Z", status)


@dataclass(frozen=True)
class FieldDesc:
    name: str
    type_oid: int
    type_len: int = -1  # -1: variable length
    type_mod: int = -1
    fmt: int = 0  # 0 text, 1 binary (portal describes echo Bind's choice)


def row_description(fields: list[FieldDesc]) -> bytes:
    body = struct.pack("!H", len(fields))
    for f in fields:
        body += (
            f.name.encode()
            + b"\x00"
            + struct.pack("!IhIhih", 0, 0, f.type_oid, f.type_len, f.type_mod, f.fmt)
        )
    return _msg(b"T", body)


def data_row(values: list[bytes | None]) -> bytes:
    body = struct.pack("!H", len(values))
    for v in values:
        if v is None:
            body += struct.pack("!i", -1)
        else:
            body += struct.pack("!i", len(v)) + v
    return _msg(b"D", body)


def command_complete(tag: str) -> bytes:
    return _msg(b"C", tag.encode() + b"\x00")


def empty_query_response() -> bytes:
    return _msg(b"I", b"")


def error_response(message: str, sqlstate: str = "22000") -> bytes:
    """The reference maps every engine error to one generic class
    (SqlState::DataException, src/duckdb_pgwire_extension.cpp:68-73);
    we default to the same 22000 but allow real SQLSTATEs."""
    body = (
        b"S" + b"ERROR\x00"
        + b"V" + b"ERROR\x00"
        + b"C" + sqlstate.encode() + b"\x00"
        + b"M" + message.encode() + b"\x00"
        + b"\x00"
    )
    return _msg(b"E", body)


def notice_response(message: str) -> bytes:
    body = b"S" + b"NOTICE\x00" + b"M" + message.encode() + b"\x00" + b"\x00"
    return _msg(b"N", body)


# ------------------------------------------------------- COPY sub-protocol


def copy_in_response(ncols: int) -> bytes:
    """CopyInResponse ('G'): text overall format, per-column text."""
    return _msg(b"G", struct.pack("!bH", 0, ncols) + b"\x00\x00" * ncols)


def copy_out_response(ncols: int) -> bytes:
    """CopyOutResponse ('H'): text overall format, per-column text."""
    return _msg(b"H", struct.pack("!bH", 0, ncols) + b"\x00\x00" * ncols)


def copy_data(chunk: bytes) -> bytes:
    return _msg(b"d", chunk)


def copy_done() -> bytes:
    return _msg(b"c", b"")


# ------------------------------------------------- extended-protocol encode


def parse_complete() -> bytes:
    return _msg(b"1", b"")


def bind_complete() -> bytes:
    return _msg(b"2", b"")


def close_complete() -> bytes:
    return _msg(b"3", b"")


def portal_suspended() -> bytes:
    """Execute hit its row limit with (possibly) more rows pending."""
    return _msg(b"s", b"")


def no_data() -> bytes:
    return _msg(b"n", b"")


def parameter_description(oids: list[int]) -> bytes:
    return _msg(b"t", struct.pack("!H", len(oids)) + b"".join(
        struct.pack("!I", o) for o in oids
    ))


# ---------------------------------------------------------------- decode

def parse_startup_payload(payload: bytes) -> dict[str, str]:
    """key\\0value\\0...\\0 pairs after the protocol int32."""
    params: dict[str, str] = {}
    parts = payload.split(b"\x00")
    for k, v in zip(parts[::2], parts[1::2]):
        if k:
            params[k.decode()] = v.decode()
    return params


def read_cstr(buf: bytes, off: int) -> tuple[str, int]:
    end = buf.index(b"\x00", off)
    return buf[off:end].decode(), end + 1


def parse_parse(payload: bytes) -> tuple[str, str, list[int]]:
    """Parse ('P'): statement name, query text, declared param OIDs."""
    name, off = read_cstr(payload, 0)
    query, off = read_cstr(payload, off)
    (n,) = struct.unpack_from("!H", payload, off)
    off += 2
    oids = [struct.unpack_from("!I", payload, off + 4 * i)[0] for i in range(n)]
    return name, query, oids


def expand_formats(fmts: list[int], n: int) -> list[int]:
    """PG format-code broadcast rules: [] → all text, [f] → f for all,
    else one per item."""
    if not fmts:
        return [0] * n
    if len(fmts) == 1:
        return fmts * n
    return fmts


def parse_bind(
    payload: bytes,
) -> tuple[str, str, list[bytes | None], list[int], list[int]]:
    """Bind ('B'): portal name, statement name, parameter values,
    parameter format codes, result format codes (0 text / 1 binary —
    the caller decodes binary params and encodes binary results; the
    reference is text-only, cpp:136-164, so binary support here is an
    over-reference improvement for JDBC binaryTransfer)."""
    portal, off = read_cstr(payload, 0)
    stmt, off = read_cstr(payload, off)
    (nfmt,) = struct.unpack_from("!H", payload, off)
    off += 2
    fmts = [struct.unpack_from("!H", payload, off + 2 * i)[0] for i in range(nfmt)]
    off += 2 * nfmt
    (nparams,) = struct.unpack_from("!H", payload, off)
    off += 2
    params: list[bytes | None] = []
    for _ in range(nparams):
        (ln,) = struct.unpack_from("!i", payload, off)
        off += 4
        if ln == -1:
            params.append(None)
        else:
            params.append(payload[off : off + ln])
            off += ln
    (nres,) = struct.unpack_from("!H", payload, off)
    off += 2
    res = [struct.unpack_from("!H", payload, off + 2 * i)[0] for i in range(nres)]
    return portal, stmt, params, expand_formats(fmts, nparams), res


def parse_describe(payload: bytes) -> tuple[str, str]:
    """Describe ('D'): kind ('S' statement | 'P' portal), name."""
    kind = payload[0:1].decode()
    name, _ = read_cstr(payload, 1)
    return kind, name


def parse_execute(payload: bytes) -> tuple[str, int]:
    """Execute ('E'): portal name, max rows (0 = all)."""
    name, off = read_cstr(payload, 0)
    (maxrows,) = struct.unpack_from("!i", payload, off)
    return name, maxrows


def parse_close(payload: bytes) -> tuple[str, str]:
    """Close ('C'): kind ('S' | 'P'), name."""
    kind = payload[0:1].decode()
    name, _ = read_cstr(payload, 1)
    return kind, name
