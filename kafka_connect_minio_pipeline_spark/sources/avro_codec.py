"""Minimal Avro binary codec (Apache Avro 1.x spec subset).

Implements exactly the encoding the reference pipeline's records use
(SURVEY.md §1.2 / FIXTURES.md §1): record schemas over
- primitives: string, int, long, boolean, null
- nullable unions ["null", T]
- nested records

Written against the public Avro specification (binary encoding chapter):
longs/ints are zigzag varints, strings/bytes are length-prefixed UTF-8,
unions write the zigzag branch index then the value, records concatenate
field encodings in schema order. No external Avro library exists in this
environment; this codec backs the Arrow-batched decode UDF in
registry_avro.py and the test fixtures that exercise it.
"""

from __future__ import annotations

from typing import Any


# --- varint / zigzag -------------------------------------------------------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    n = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc), pos
        shift += 7


# --- schema-driven encode/decode ------------------------------------------

def _is_nullable_union(schema: Any) -> bool:
    return isinstance(schema, list)


def encode(schema: Any, value: Any, out: bytearray | None = None) -> bytes:
    """Encode ``value`` per ``schema`` (parsed Avro JSON: dict/list/str)."""
    if out is None:
        out = bytearray()
    if _is_nullable_union(schema):
        # branch index, then branch payload
        if value is None:
            idx = schema.index("null")
            _write_varint(out, idx)
        else:
            idx = next(i for i, s in enumerate(schema) if s != "null")
            _write_varint(out, idx)
            encode(schema[idx], value, out)
        return bytes(out)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for field in schema["fields"]:
                encode(field["type"], value[field["name"]], out)
            return bytes(out)
        schema = t  # {"type": "string"} style
    if schema == "null":
        return bytes(out)
    if schema == "boolean":
        out.append(1 if value else 0)
    elif schema in ("int", "long"):
        _write_varint(out, int(value))
    elif schema == "string":
        raw = value.encode("utf-8")
        _write_varint(out, len(raw))
        out.extend(raw)
    elif schema == "bytes":
        _write_varint(out, len(value))
        out.extend(value)
    else:
        raise NotImplementedError(f"avro type {schema!r}")
    return bytes(out)


def decode(schema: Any, buf: bytes, pos: int = 0) -> tuple[Any, int]:
    """Decode one value; returns (value, next_pos)."""
    if _is_nullable_union(schema):
        idx, pos = _read_varint(buf, pos)
        branch = schema[idx]
        if branch == "null":
            return None, pos
        return decode(branch, buf, pos)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            rec = {}
            for field in schema["fields"]:
                rec[field["name"]], pos = decode(field["type"], buf, pos)
            return rec, pos
        schema = t
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return buf[pos] == 1, pos + 1
    if schema in ("int", "long"):
        return _read_varint(buf, pos)
    if schema == "string":
        n, pos = _read_varint(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if schema == "bytes":
        n, pos = _read_varint(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise NotImplementedError(f"avro type {schema!r}")
