"""Spark DataType → PostgreSQL OID map + text-format value encoders.

The reference's map covers 9 types and SILENTLY DROPS columns of any
other type from both RowDescription and every DataRow
(src/duckdb_pgwire_extension.cpp:25-38 g_typemap; the `continue` at
cpp:80-83 and cpp:125-128) — so `SELECT true, 1` returns one column.
Per SURVEY.md §1.2 we implement the FULL map instead (bool, all ints,
decimal→numeric, binary→bytea, arrays/structs/maps→text) and keep
``reference_compat=True`` to reproduce the drop-column behavior, with a
test documenting the divergence.

All values are rendered in PG *text* format, like the reference
(cpp:136-164: everything funnels through write_string/write_intN
helpers in text protocol).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import json
import math
from collections.abc import Callable
from typing import Any

from pyspark.sql import types as T

# PostgreSQL built-in type OIDs (public catalog constants).
OID_BOOL = 16
OID_BYTEA = 17
OID_INT8 = 20
OID_INT2 = 21
OID_INT4 = 23
OID_TEXT = 25
OID_JSON = 114
OID_FLOAT4 = 700
OID_FLOAT8 = 701
OID_VARCHAR = 1043
OID_DATE = 1082
OID_TIME = 1083
OID_TIMESTAMP = 1114
OID_TIMESTAMPTZ = 1184
OID_NUMERIC = 1700

# The 9 wire-visible types of the reference's g_typemap (cpp:25-38):
# FLOAT, DOUBLE, SMALLINT, INTEGER, BIGINT, VARCHAR, DATE, TIME,
# TIMESTAMP. (BOOLEAN has dead serialization code but is NOT mapped.)
_REFERENCE_VISIBLE = (
    T.FloatType,
    T.DoubleType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


def pg_oid(dt: T.DataType) -> int:
    if isinstance(dt, T.BooleanType):
        return OID_BOOL
    if isinstance(dt, T.ByteType | T.ShortType):
        return OID_INT2
    if isinstance(dt, T.IntegerType):
        return OID_INT4
    if isinstance(dt, T.LongType):
        return OID_INT8
    if isinstance(dt, T.FloatType):
        return OID_FLOAT4
    if isinstance(dt, T.DoubleType):
        return OID_FLOAT8
    if isinstance(dt, T.DecimalType):
        return OID_NUMERIC
    if isinstance(dt, T.StringType | T.VarcharType | T.CharType):
        return OID_TEXT
    if isinstance(dt, T.BinaryType):
        return OID_BYTEA
    if isinstance(dt, T.DateType):
        return OID_DATE
    # Both timestamp flavors map to plain `timestamp` (1114), like the
    # reference (cpp:36 maps TIMESTAMP → Timestamp; TIMESTAMPTZ columns
    # are dropped there). Advertising TimestampType as timestamptz would
    # require offset-qualified rendering; the server pins the session TZ
    # to UTC and renders naive UTC wall-clock, which is exactly what a
    # `timestamp` column means.
    if isinstance(dt, T.TimestampType | T.TimestampNTZType):
        return OID_TIMESTAMP
    # ANSI TIME (Spark 4.1 TimeType, r10): the real PG time OID — the
    # reference's g_typemap has no Time entry (cpp:36), so this is an
    # over-reference closure of the documented csv_sniff OID gap
    if isinstance(dt, T.TimeType):
        return OID_TIME
    if isinstance(dt, T.ArrayType):
        # arrays of base types advertise the real PG array OID. PG has
        # ONE array type per element type regardless of dimensionality
        # (int4[][] is still oid 1007), so nested arrays of base
        # scalars share it — text renders {{1,2},{3,4}} and the binary
        # codec writes the ndim>1 header (r7 verdict item 5). PG's
        # MAXDIM is 6; deeper nesting (and struct/map elements) stays
        # text.
        inner, depth = dt.elementType, 1
        while isinstance(inner, T.ArrayType) and depth <= 6:
            inner, depth = inner.elementType, depth + 1
        if depth <= 6 and not isinstance(
            inner, T.ArrayType | T.StructType | T.MapType
        ):
            arr = _ARRAY_OIDS.get(pg_oid(inner))
            if arr is not None:
                return arr
    # structs/maps/intervals/over-deep arrays: rendered as text
    return OID_TEXT


# element OID → array OID (public pg_type catalog values)
_ARRAY_OIDS = {
    16: 1000,   # bool
    17: 1001,   # bytea
    21: 1005,   # int2
    23: 1007,   # int4
    20: 1016,   # int8
    25: 1009,   # text
    1043: 1015,  # varchar
    700: 1021,  # float4
    701: 1022,  # float8
    1700: 1231,  # numeric
    1082: 1182,  # date
    1083: 1183,  # time
    1114: 1115,  # timestamp
}
_ELEM_OIDS = {v: k for k, v in _ARRAY_OIDS.items()}


def reference_visible(dt: T.DataType) -> bool:
    """Would the reference's g_typemap keep this column?"""
    return isinstance(dt, _REFERENCE_VISIBLE)


class _F32(float):
    """Marker: this float came from a FLOAT32 (REAL) column leaf, so
    its text form is DuckDB's single-precision Grisu3 rendering, not
    the widened double's repr (functions/floattext.py, r14)."""

    __slots__ = ()


def _enc_float(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if isinstance(v, _F32):
        from ..functions.floattext import duck_float_text_finite

        return duck_float_text_finite(v)
    return repr(v)


def _wrap_f32(v: Any, dt: T.DataType) -> Any:
    """Recursively wrap FLOAT32 leaves of a result value in _F32 so the
    value-driven text encoders render them single-precision. Called
    only for columns whose type contains a FloatType leaf (see
    text_cell_encoder); maps keep their JSON convention unchanged."""
    if v is None:
        return None
    if isinstance(dt, T.FloatType):
        return _F32(v)
    if isinstance(dt, T.ArrayType):
        return [_wrap_f32(e, dt.elementType) for e in v]
    if isinstance(dt, T.StructType) and hasattr(v, "asDict"):
        from pyspark.sql import Row

        d = {f.name: _wrap_f32(v[f.name], f.dataType) for f in dt.fields}
        return Row(**d)
    return v


def _has_f32_leaf(dt: T.DataType) -> bool:
    if isinstance(dt, T.FloatType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_f32_leaf(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_has_f32_leaf(f.dataType) for f in dt.fields)
    return False


def _enc_timestamp(v: _dt.datetime) -> str:
    if v.tzinfo is not None:  # render aware values as UTC wall-clock
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    s = v.strftime("%Y-%m-%d %H:%M:%S")
    if v.microsecond:
        s += f".{v.microsecond:06d}".rstrip("0")
    return s


def _enc_interval(td: _dt.timedelta) -> str:
    """Day-time interval → DuckDB's interval text (probed via
    ``interval::VARCHAR``: '00:01:30', '3 days', '3 days 00:00:05',
    '-3 days -00:00:02', fractional seconds trimmed '00:00:01.5').
    Spark's DayTimeIntervalType is one normalized micros quantity, so
    hour counts ≥ 24 render with the days split out ('1 day 02:00:00'
    where DuckDB's un-normalized 26-hour component shows '26:00:00') —
    equal values, canonical componentization."""
    total = td // _dt.timedelta(microseconds=1)
    sgn = "-" if total < 0 else ""
    a = abs(total)
    days, rem = divmod(a, 86_400_000_000)
    h, rem = divmod(rem, 3_600_000_000)
    m, rem = divmod(rem, 60_000_000)
    s, us = divmod(rem, 1_000_000)
    parts: list[str] = []
    if days:
        parts.append(f"{sgn}{days} day" + ("s" if days != 1 else ""))
    if h or m or s or us or not days:
        t = f"{sgn}{h:02d}:{m:02d}:{s:02d}"
        if us:
            t += f".{us:06d}".rstrip("0")
        parts.append(t)
    return " ".join(parts)


def _enc_array(v: Any) -> str:
    parts = []
    for item in v:
        if item is None:
            parts.append("NULL")
        elif isinstance(item, list):
            # sub-array of a multidimensional array: rendered inline,
            # NOT quoted — PG's int[][] text form is {{1,2},{3,4}}
            parts.append(_enc_array(item))
        else:
            s = encode_text(item)
            if any(c in s for c in ' ,{}"\\') or s == "":
                s = '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
            parts.append(s)
    if parts and all(
        isinstance(i, list) for i in v
    ) and all(p == "{}" for p in parts):
        # PG cannot represent [[],[]] — any zero-size dimension
        # normalizes to '{}' (matches the binary encoder's ndim=0)
        return "{}"
    return "{" + ",".join(parts) + "}"


def encode_text(v: Any) -> str:
    """Python value (from Row) → PG text-format string."""
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        return _enc_float(v)
    if isinstance(v, int | decimal.Decimal):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, bytes | bytearray):
        return "\\x" + bytes(v).hex()
    if isinstance(v, _dt.datetime):
        return _enc_timestamp(v)
    if isinstance(v, _dt.timedelta):
        return _enc_interval(v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.time):
        # DuckDB trims trailing fractional zeros ('01:02:03.4', probed)
        s = v.strftime("%H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip("0")
        return s
    if isinstance(v, list):
        return _enc_array(v)
    if isinstance(v, dict):
        return json.dumps(v, default=str, separators=(",", ":"))
    if hasattr(v, "asDict"):  # Row (struct)
        d = v.asDict(recursive=True)
        keys = list(d)
        if (
            len(keys) == 2
            and keys[0] == "__ecode"
            and keys[1].startswith("__elabel_")
        ):
            # ENUM emulation (compat.ENUM_TYPES): the ordered struct
            # renders as its label, exactly like DuckDB renders an
            # enum value as the member string
            lbl = d[keys[1]]
            if lbl is None:
                # a NULL enum cell is a NULL struct (handled upstream);
                # a non-null struct with a null label is user-built
                # named_struct data in an impossible enum state — refuse
                # rather than emit the string 'NULL', which would be
                # indistinguishable from a member named NULL (advice r9)
                raise ValueError(
                    "enum struct with non-null code but NULL label"
                )
            return str(lbl)
        tag = d.get("__utag")
        if (
            isinstance(tag, str)
            and len(d) == 2
            and tag in d
            and tag != "__utag"
        ):
            # UNION-type emulation (compat._rewrite_union_fns): render
            # the active member's text, like DuckDB renders a union as
            # the value itself ('NULL' for a null member, DuckDB-probed).
            # The sentinel check requires the EXACT two-field
            # {__utag, <tag>} shape that rewrite emits — a user struct
            # that merely contains a __utag field renders as JSON like
            # any other struct (ADVICE r7 item 5).
            val = d[tag]
            return encode_text(val) if val is not None else "NULL"
        return json.dumps(d, default=str, separators=(",", ":"))
    return str(v)


def encode_cell(v: Any) -> bytes | None:
    return None if v is None else encode_text(v).encode()


def _check_rectangular(v: list, dt: "T.ArrayType") -> None:
    """PG multidimensional arrays are RECTANGULAR; a ragged or
    NULL-sub-array Spark nested list has no valid literal under the
    advertised array OID. The binary codec already refuses loudly
    (see encode_binary below); this mirrors that check for the text
    path so OID-aware clients (psycopg, JDBC) never receive a
    malformed literal like {{1},{2,3}} (ADVICE r8 item 1)."""
    elem_dt = dt.elementType
    probe = v
    while isinstance(elem_dt, T.ArrayType):
        if any(e is None for e in probe):
            raise ValueError(
                "text array format: NULL sub-array is not representable "
                "in a PG multidimensional array — cast to VARCHAR for a "
                "text rendering"
            )
        sizes = {len(e) for e in probe}
        if len(sizes) > 1:
            raise ValueError(
                "text array format: ragged nested array is not "
                "representable (PG arrays are rectangular) — cast to "
                "VARCHAR for a text rendering"
            )
        probe = [x for e in probe for x in e]
        elem_dt = elem_dt.elementType


def text_cell_encoder(dt: T.DataType) -> Callable[[Any], bytes | None]:
    """Per-column text encoder. Nested arrays advertised under a real
    PG array OID validate rectangularity before rendering; everything
    else is the plain ``encode_cell``."""
    if (
        isinstance(dt, T.ArrayType)
        and isinstance(dt.elementType, T.ArrayType)
        and pg_oid(dt) in _ELEM_OIDS
    ):

        f32 = _has_f32_leaf(dt)

        def enc(v: Any) -> bytes | None:
            if v is None:
                return None
            _check_rectangular(v, dt)
            if f32:
                v = _wrap_f32(v, dt)
            return encode_text(v).encode()

        return enc
    if _has_f32_leaf(dt):

        def enc_f32(v: Any) -> bytes | None:
            if v is None:
                return None
            return encode_text(_wrap_f32(v, dt)).encode()

        return enc_f32
    return encode_cell


# ------------------------------------------------------ binary format
# PG binary wire encodings for the fixed-layout types JDBC/psycopg
# request with binaryTransfer. The reference is text-only (cpp:136-164);
# this is an over-reference improvement. Text-advertised types emit
# their utf-8 text bytes (PG's binary send for the text OID); only a
# genuinely unservable shape refuses loudly → clients fall back
# or error per their own policy.

import struct as _struct  # noqa: E402

_PG_EPOCH_DATE = _dt.date(2000, 1, 1)
_PG_EPOCH_TS = _dt.datetime(2000, 1, 1)


# Every servable type now has a binary result encoding: fixed public
# layouts for the scalar/array families below, and — for everything
# the server ADVERTISES as text (structs, maps, intervals, composite-
# element or over-deep arrays; pg_oid falls back to 25) — the utf-8
# text bytes, which IS PG's binary send format for the text type
# (r8 verdict item 7: JDBC binaryTransfer no longer errors on a
# struct[] column; it receives the text rendering under the
# advertised text OID).


def _encode_pg_numeric(d) -> bytes:
    """PG binary NUMERIC: int16 ndigits/weight/sign/dscale + int16
    base-10000 digits, most significant first (public layout from the
    PG protocol docs; closes the last loud refusal for JDBC
    binaryTransfer users — the reference itself is text-only,
    cpp:136-164)."""
    import decimal

    d = decimal.Decimal(d)
    if d.is_nan():
        return _struct.pack("!hhhh", 0, 0, 0xC000, 0)
    # as_tuple is context-free; abs()/arithmetic would round values
    # wider than the ambient 28-digit context (code-review r6)
    t = d.as_tuple()
    sign = 0x4000 if t.sign else 0x0000
    dscale = max(0, -t.exponent)
    # full decimal-digit string split at the point, each side padded to
    # whole base-10000 groups
    digits = "".join(map(str, t.digits))
    if t.exponent >= 0:
        int_part, frac_part = digits + "0" * t.exponent, ""
    else:
        cut = len(digits) + t.exponent
        int_part, frac_part = digits[:cut] if cut > 0 else "", digits[max(cut, 0):]
        frac_part = "0" * max(0, -cut) + frac_part
    int_part = int_part.lstrip("0")
    int_part = "0" * (-len(int_part) % 4) + int_part
    frac_part = frac_part + "0" * (-len(frac_part) % 4)
    groups = [
        int(int_part[i : i + 4]) for i in range(0, len(int_part), 4)
    ] + [int(frac_part[i : i + 4]) for i in range(0, len(frac_part), 4)]
    weight = len(int_part) // 4 - 1
    # strip leading zero groups (weight counts from the FIRST kept one)
    while groups and groups[0] == 0:
        groups.pop(0)
        weight -= 1
    while groups and groups[-1] == 0:
        groups.pop()
    if not groups:
        return _struct.pack("!hhhh", 0, 0, 0, dscale)
    return _struct.pack(
        f"!hhhh{len(groups)}h", len(groups), weight, sign, dscale, *groups
    )


def _decode_pg_numeric(raw: bytes) -> str:
    """PG binary NUMERIC → decimal text (Bind parameter path).
    Reconstructed from the digit STRING (exact at any width — decimal
    arithmetic under the default 28-digit context would silently round
    parameters wider than 28 significant digits; code-review r6)."""
    ndigits, weight, sign, dscale = _struct.unpack_from("!hhhh", raw)
    if sign == 0xC000:
        return "NaN"
    groups = _struct.unpack_from(f"!{ndigits}h", raw, 8)
    import decimal

    with decimal.localcontext() as ctx:
        # scaleb/quantize are CONTEXT operations — everything must run
        # under the widened precision or the default 28 digits round
        ctx.prec = max(60, len(groups) * 4 + dscale + 8)
        if groups:
            digs = "".join(f"{g:04d}" for g in groups)
            # value = int(digs) * 10^(4 * (weight + 1 - len(groups)))
            total = decimal.Decimal(int(digs)).scaleb(
                4 * (weight + 1 - len(groups))
            )
        else:
            total = decimal.Decimal(0)
        if sign == 0x4000:
            total = -total
        q = total.quantize(decimal.Decimal(1).scaleb(-dscale))
    # fixed-point text: scientific notation would type the substituted
    # literal as DOUBLE in Spark's ANSI rules (lossy for wide numerics)
    return format(q, "f")


def encode_binary(v: Any, dt: T.DataType) -> bytes | None:
    """Python value → PG binary-format cell for the supported types."""
    if v is None:
        return None
    if isinstance(dt, T.BooleanType):
        return b"\x01" if v else b"\x00"
    if isinstance(dt, T.ByteType | T.ShortType):
        return _struct.pack("!h", int(v))
    if isinstance(dt, T.IntegerType):
        return _struct.pack("!i", int(v))
    if isinstance(dt, T.LongType):
        return _struct.pack("!q", int(v))
    if isinstance(dt, T.FloatType):
        return _struct.pack("!f", float(v))
    if isinstance(dt, T.DoubleType):
        return _struct.pack("!d", float(v))
    if isinstance(dt, T.StringType | T.VarcharType | T.CharType):
        return str(v).encode()
    if isinstance(dt, T.BinaryType):
        return bytes(v)
    if isinstance(dt, T.DateType):
        return _struct.pack("!i", (v - _PG_EPOCH_DATE).days)
    if isinstance(dt, T.TimestampType | T.TimestampNTZType):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        micros = (v - _PG_EPOCH_TS) // _dt.timedelta(microseconds=1)
        return _struct.pack("!q", micros)
    if isinstance(dt, T.DecimalType):
        return _encode_pg_numeric(v)
    if isinstance(dt, T.TimeType):
        # PG binary time: int64 microseconds since midnight
        micros = (
            ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000
            + v.microsecond
        )
        return _struct.pack("!q", micros)
    if isinstance(dt, T.ArrayType) and pg_oid(dt) in _ELEM_OIDS:
        # public PG array layout: int32 ndim, int32 hasnull flag,
        # uint32 element oid, then per dim (int32 size, int32 lower
        # bound = 1), then length-prefixed element cells (-1 = NULL) in
        # row-major order. ndim>1 for nested arrays (r7 verdict item
        # 5); PG sends ndim=0 for an empty array. PG arrays are
        # RECTANGULAR — a ragged Spark nested array cannot be expressed
        # in this layout and refuses loudly rather than mis-shaping.
        elem_oid = _ELEM_OIDS[pg_oid(dt)]
        elem_dt = dt.elementType
        dims = [len(v)]
        probe = v
        while isinstance(elem_dt, T.ArrayType):
            rows = [e for e in probe if e is not None]
            if any(e is None for e in probe):
                raise ValueError(
                    "binary array format: NULL sub-array is not "
                    "representable in a PG multidimensional array"
                )
            sizes = {len(e) for e in rows}
            if len(sizes) > 1:
                raise ValueError(
                    "binary array format: ragged nested array is not "
                    "representable (PG arrays are rectangular) — use "
                    "text result format"
                )
            dims.append(sizes.pop() if sizes else 0)
            probe = [x for e in rows for x in e]
            elem_dt = elem_dt.elementType
        if not v or 0 in dims:
            return _struct.pack("!iiI", 0, 0, elem_oid)
        hasnull = 1 if any(e is None for e in probe) else 0
        out = [_struct.pack("!iiI", len(dims), hasnull, elem_oid)]
        for d in dims:
            out.append(_struct.pack("!ii", d, 1))
        for e in probe:
            if e is None:
                out.append(_struct.pack("!i", -1))
            else:
                cell = encode_binary(e, elem_dt)
                out.append(_struct.pack("!i", len(cell)) + cell)
        return b"".join(out)
    if pg_oid(dt) == OID_TEXT:
        # advertised as text → binary format IS the utf-8 text bytes
        return encode_text(v).encode()
    raise ValueError(f"binary result format not supported for {dt.simpleString()}")


def decode_binary_param(raw: bytes, oid: int) -> bytes:
    """Binary-format Bind parameter → text-format bytes (the param
    substitution pipeline is text-based). Unknown OIDs refuse loudly."""
    if oid == OID_BOOL:
        return b"true" if raw != b"\x00" else b"false"
    if oid == OID_INT2:
        return str(_struct.unpack("!h", raw)[0]).encode()
    if oid == OID_INT4:
        return str(_struct.unpack("!i", raw)[0]).encode()
    if oid == OID_INT8:
        return str(_struct.unpack("!q", raw)[0]).encode()
    if oid in (OID_FLOAT4, OID_FLOAT8):
        fmt = "!f" if oid == OID_FLOAT4 else "!d"
        v = _struct.unpack(fmt, raw)[0]
        s = repr(v)
        # exponent notation types the literal as DOUBLE in Spark (a bare
        # decimal literal would be typed DECIMAL under ANSI rules)
        return (s if "e" in s or "E" in s else s + "e0").encode()
    if oid in (OID_TEXT, OID_VARCHAR):
        return raw
    if oid == OID_DATE:
        days = _struct.unpack("!i", raw)[0]
        return (_PG_EPOCH_DATE + _dt.timedelta(days=days)).isoformat().encode()
    if oid == OID_TIME:
        micros = _struct.unpack("!q", raw)[0]
        # range-check instead of day-wrapping: 24:00:00 is PG-legal and
        # must not silently become midnight (code review r10); Spark
        # has no 24:00:00 value, so it renders as its text and the
        # downstream cast refuses loudly
        if not 0 <= micros <= 86_400_000_000:
            raise ValueError(
                f"binary time parameter out of range: {micros} µs"
            )
        if micros == 86_400_000_000:
            return b"24:00:00"
        t = (_dt.datetime.min + _dt.timedelta(microseconds=micros)).time()
        return encode_text(t).encode()
    if oid == OID_TIMESTAMP:
        micros = _struct.unpack("!q", raw)[0]
        return _enc_timestamp(
            _PG_EPOCH_TS + _dt.timedelta(microseconds=micros)
        ).encode()
    if oid == OID_NUMERIC:
        return _decode_pg_numeric(raw).encode()
    if oid == OID_BYTEA:
        # binary bytea payload IS the raw bytes; text form is the hex
        # escape (without this branch a bytea[] param passed the array
        # gate then failed per cell, code review r7)
        return b"\\x" + raw.hex().encode()
    if oid in _ELEM_OIDS:
        return _decode_binary_array(raw, _ELEM_OIDS[oid])
    raise ValueError(f"binary parameter format not supported for oid {oid}")


def _decode_binary_array(raw: bytes, elem_oid: int) -> bytes:
    """PG binary array → PG array-literal text bytes (the param
    substitution pipeline is text-based; the text form round-trips
    through the same quoting rules as result rendering)."""
    ndim, _flags, _eoid = _struct.unpack_from("!iiI", raw)
    if ndim == 0:
        return b"{}"
    if not 1 <= ndim <= 6:  # PG MAXDIM is 6
        raise ValueError(
            f"binary array parameter: ndim={ndim} outside PG's 1..6"
        )
    dims: list[int] = []
    pos = 12
    for _ in range(ndim):
        size, _lb = _struct.unpack_from("!ii", raw, pos)
        dims.append(size)
        pos += 8
    total = 1
    for d in dims:
        total *= d
    cells: list[str] = []
    for _ in range(total):
        (ln,) = _struct.unpack_from("!i", raw, pos)
        pos += 4
        if ln == -1:
            cells.append("NULL")
            continue
        cell = raw[pos : pos + ln]
        pos += ln
        s = decode_binary_param(cell, elem_oid).decode()
        if any(c in s for c in ' ,{}"\\') or s == "":
            s = '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
        cells.append(s)

    def nest(vals: list[str], ds: list[int]) -> str:
        if len(ds) == 1:
            return "{" + ",".join(vals) + "}"
        step = len(vals) // ds[0] if ds[0] else 0
        return (
            "{"
            + ",".join(
                nest(vals[i * step : (i + 1) * step], ds[1:])
                for i in range(ds[0])
            )
            + "}"
        )

    return nest(cells, dims).encode()
