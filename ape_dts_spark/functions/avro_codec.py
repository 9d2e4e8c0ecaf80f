"""Avro binary codec for the reference's change-feed envelope.

The reference Avro-encodes every Kafka record against a FIXED schema
(reference dt-common/src/meta/avro/avro_converter_schema.rs:5-121 —
record ``AvroData`` with fields ``schema``/``tb``/``operation``/
``fields``/``before``/``after``/``extra``; before/after/extra are
``union(null, map<union(null,string,long,double,bytes,boolean)>)`` and
``fields`` is an optional array of ``AvroFieldDef{name, column_type,
avro_type}``).  A consumer written against that wire contract cannot read
a JSON feed, so this module implements the Avro *binary encoding* (the
public Apache Avro 1.x specification: zig-zag varints, length-prefixed
strings/bytes, block-framed maps/arrays, branch-indexed unions) for that
one fixed schema — no codec library is needed because the schema never
varies, which is exactly why the reference pins it as a const.

Engine extension (documented, schema-compatible): row events carry
``position`` (the LSN, as a long) and ``origin`` (loop-prevention node id)
inside the ``extra`` map — the same extensibility point the reference uses
for DDL metadata (avro_converter.rs:179 stores db_type/ddl_type/query in
``extra``).  A reference consumer that ignores unknown ``extra`` keys
decodes these records as plain AvroData.

Pure functions over bytes/dicts: the Spark integration (Arrow-batched
pandas UDFs in ``operators.change_feed``) stays in that module; this one
is dependency-free and unit-testable without a SparkSession.
"""

from __future__ import annotations

import struct
from typing import Any

# union branch order is fixed by the schema:
#   map values: [null, string, long, double, bytes, boolean]
_BR_NULL, _BR_STR, _BR_LONG, _BR_DOUBLE, _BR_BYTES, _BR_BOOL = range(6)


# ---------------------------------------------------------------- primitives
def encode_long(n: int, out: bytearray) -> None:
    """Avro long: zig-zag then base-128 varint, little-endian groups.

    Python ints are unbounded; a value outside int64 would otherwise be
    silently masked into a DIFFERENT number on the wire — raise at the
    producer instead."""
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError(f"avro long out of int64 range: {n}")
    u = (n << 1) ^ (n >> 63)
    u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        if pos >= len(buf):
            raise ValueError(f"truncated varint at {pos}")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            # an int64 zig-zag varint is at most 10 bytes; a longer run of
            # continuation bits is a corrupt frame, not a bigger number
            raise ValueError(f"varint longer than int64 at {pos}")
    n = (u >> 1) ^ -(u & 1)
    return n, pos


def _checked_len(n: int, buf: bytes, pos: int, what: str) -> None:
    """Corrupt-frame guards for length-prefixed slices: a NEGATIVE length
    would move the parse position BACKWARD (buf[pos:pos+n] silently returns
    '' and pos+n regresses — a crafted frame can loop the block parsers on
    that), and an oversized one would silently truncate into a plausible-
    looking garbage value.  Fail loudly instead (found by the hypothesis
    corrupt-frame fuzz property)."""
    if n < 0:
        raise ValueError(f"negative {what} length {n} at {pos}")
    if pos + n > len(buf):
        raise ValueError(f"{what} length {n} overruns buffer at {pos}")


def encode_string(s: str, out: bytearray) -> None:
    raw = s.encode("utf-8")
    encode_long(len(raw), out)
    out.extend(raw)


def decode_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = decode_long(buf, pos)
    _checked_len(n, buf, pos, "string")
    return buf[pos : pos + n].decode("utf-8"), pos + n


def encode_bytes(b: bytes, out: bytearray) -> None:
    encode_long(len(b), out)
    out.extend(b)


def decode_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = decode_long(buf, pos)
    _checked_len(n, buf, pos, "bytes")
    return bytes(buf[pos : pos + n]), pos + n


# -------------------------------------------------- the typed-value union
def _encode_union_value(v: Any, out: bytearray) -> None:
    """Map-value union [null,string,long,double,bytes,boolean]; branch
    chosen by python type (bool BEFORE int — bool is an int subclass)."""
    if v is None:
        encode_long(_BR_NULL, out)
    elif isinstance(v, bool):
        encode_long(_BR_BOOL, out)
        out.append(1 if v else 0)
    elif isinstance(v, str):
        encode_long(_BR_STR, out)
        encode_string(v, out)
    elif isinstance(v, int):
        encode_long(_BR_LONG, out)
        encode_long(v, out)
    elif isinstance(v, float):
        encode_long(_BR_DOUBLE, out)
        out.extend(struct.pack("<d", v))
    elif isinstance(v, (bytes, bytearray)):
        encode_long(_BR_BYTES, out)
        encode_bytes(bytes(v), out)
    elif isinstance(v, (list, dict)):
        # nested array/struct payload values (e.g. a transform-added tags
        # column) are NOT expressible in the reference's pinned scalar map
        # union (avro_converter_schema.rs:5-121).  str() would emit Python
        # repr that silently nulls on re-parse, and JSON-text smuggling
        # changes the column's type on round-trip — fail loudly at the
        # producer instead; nested columns need feed_format=json.
        raise ValueError(
            "feed_format=avro cannot carry nested (array/struct) payload "
            f"values — got {type(v).__name__}; use feed_format=json for "
            "tables with nested columns"
        )
    else:  # datetime/decimal/...: string is the reference's own fallback
        encode_long(_BR_STR, out)
        encode_string(str(v), out)


def _decode_union_value(buf: bytes, pos: int) -> tuple[Any, int]:
    br, pos = decode_long(buf, pos)
    if br == _BR_NULL:
        return None, pos
    if br == _BR_STR:
        return decode_string(buf, pos)
    if br == _BR_LONG:
        return decode_long(buf, pos)
    if br == _BR_DOUBLE:
        _checked_len(8, buf, pos, "double")
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if br == _BR_BYTES:
        return decode_bytes(buf, pos)
    if br == _BR_BOOL:
        _checked_len(1, buf, pos, "boolean")
        return buf[pos] != 0, pos + 1
    raise ValueError(f"bad union branch {br} at {pos}")


def _encode_optional_map(m: dict[str, Any] | None, out: bytearray) -> None:
    """union(null, map<value-union>): branch index then block-framed map
    (one block of len(m) entries, 0-terminator — the canonical writer
    framing every Avro reader accepts)."""
    if m is None:
        encode_long(0, out)
        return
    encode_long(1, out)
    if m:
        encode_long(len(m), out)
        for k in m:  # caller controls order; sorted at the call site
            encode_string(k, out)
            _encode_union_value(m[k], out)
    encode_long(0, out)


def _decode_optional_map(buf: bytes, pos: int) -> tuple[dict[str, Any] | None, int]:
    br, pos = decode_long(buf, pos)
    if br == 0:
        return None, pos
    if br != 1:
        # corrupt/misaligned frame: parsing it as a map would consume
        # arbitrary bytes and yield a plausible-looking garbage record —
        # fail loudly like _decode_union_value does
        raise ValueError(f"bad optional-map union branch {br} at {pos}")
    m: dict[str, Any] = {}
    while True:
        count, pos = decode_long(buf, pos)
        if count == 0:
            return m, pos
        if count < 0:  # spec: negative count is followed by a byte size
            count = -count
            _, pos = decode_long(buf, pos)
        for _ in range(count):
            k, pos = decode_string(buf, pos)
            m[k], pos = _decode_union_value(buf, pos)


# ------------------------------------------------------------- the record
def encode_record(
    schema: str,
    tb: str,
    operation: str,
    before: dict[str, Any] | None = None,
    after: dict[str, Any] | None = None,
    extra: dict[str, Any] | None = None,
    fields: list[tuple[str, str, str]] | None = None,
) -> bytes:
    """One AvroData record -> its Avro binary bytes (no container header —
    the reference ships bare datums per Kafka message, to_avro_datum in
    avro_converter.rs:182)."""
    out = bytearray()
    encode_string(schema, out)
    encode_string(tb, out)
    encode_string(operation, out)
    # fields: union(null, array<AvroFieldDef>)
    if not fields:
        encode_long(0, out)
    else:
        encode_long(1, out)
        encode_long(len(fields), out)
        for name, column_type, avro_type in fields:
            encode_string(name, out)
            encode_string(column_type, out)
            encode_string(avro_type, out)
        encode_long(0, out)
    _encode_optional_map(before, out)
    _encode_optional_map(after, out)
    _encode_optional_map(extra, out)
    return bytes(out)


def decode_record(buf: bytes) -> dict[str, Any]:
    """Avro binary bytes -> {schema, tb, operation, fields, before, after,
    extra} (fields as a list of (name, column_type, avro_type))."""
    pos = 0
    schema, pos = decode_string(buf, pos)
    tb, pos = decode_string(buf, pos)
    operation, pos = decode_string(buf, pos)
    br, pos = decode_long(buf, pos)
    if br not in (0, 1):
        raise ValueError(f"bad fields union branch {br} at {pos}")
    fields: list[tuple[str, str, str]] | None = None
    if br == 1:
        fields = []
        while True:
            count, pos = decode_long(buf, pos)
            if count == 0:
                break
            if count < 0:
                count = -count
                _, pos = decode_long(buf, pos)
            for _ in range(count):
                name, pos = decode_string(buf, pos)
                ctype, pos = decode_string(buf, pos)
                atype, pos = decode_string(buf, pos)
                fields.append((name, ctype, atype))
    before, pos = _decode_optional_map(buf, pos)
    after, pos = _decode_optional_map(buf, pos)
    extra, pos = _decode_optional_map(buf, pos)
    if pos != len(buf):
        raise ValueError(f"trailing bytes after record: {len(buf) - pos}")
    return {
        "schema": schema,
        "tb": tb,
        "operation": operation,
        "fields": fields,
        "before": before,
        "after": after,
        "extra": extra,
    }
