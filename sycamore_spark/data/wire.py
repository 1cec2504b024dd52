"""Document wire format: msgpack-framed interchange for external consumers.

Reference parity: ``Document.web_serialize`` / ``web_deserialize``
(reference: lib/sycamore/sycamore/data/document.py:214-278 and
element.py:131-140) — a stream framed as

    header  struct("!8s2H4x"): magic b"ArynSDoc", version major/minor
    body    msgpack(doc map without "elements")
            msgpack(element map) per element
            msgpack("_TERMINATOR")

This engine is DataFrame-native (documents are rows), so the same framing
serializes row-dicts. The msgpack layer prefers the C library when
installed; otherwise a self-contained pure-Python codec of the public
msgpack spec (github.com/msgpack/msgpack spec.md) covering the types a
document row can hold: nil/bool/int/float64/str/bin/array/map. Both
produce canonical msgpack, so streams interoperate with any msgpack
implementation.

Spark bridge: ``docs_to_wire`` / ``wire_to_docs`` move whole partitions
through Arrow batches (mapInPandas) — serialization is embarrassingly
parallel and never funnels through the driver.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO, Iterator

MAGIC = b"ArynSDoc"
VERSION_MAJOR = 0
VERSION_MINOR = 1
HEADER_FORMAT = "!8s2H4x"
_TERMINATOR = "_TERMINATOR"

try:  # the C implementation wins when present
    import msgpack as _msgpack  # type: ignore
except ImportError:
    _msgpack = None


# ---------------------------------------------------------------------------
# Pure-Python msgpack (public spec subset)
# ---------------------------------------------------------------------------


def _pack_into(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(0x100 + obj)
        elif obj > 0:
            if obj <= 0xFF:
                out += struct.pack(">BB", 0xCC, obj)
            elif obj <= 0xFFFF:
                out += struct.pack(">BH", 0xCD, obj)
            elif obj <= 0xFFFFFFFF:
                out += struct.pack(">BI", 0xCE, obj)
            elif obj <= 0xFFFFFFFFFFFFFFFF:
                out += struct.pack(">BQ", 0xCF, obj)
            else:
                raise OverflowError(f"int too large for msgpack: {obj}")
        else:
            if obj >= -0x80:
                out += struct.pack(">Bb", 0xD0, obj)
            elif obj >= -0x8000:
                out += struct.pack(">Bh", 0xD1, obj)
            elif obj >= -0x80000000:
                out += struct.pack(">Bi", 0xD2, obj)
            elif obj >= -0x8000000000000000:
                out += struct.pack(">Bq", 0xD3, obj)
            else:
                raise OverflowError(f"int too small for msgpack: {obj}")
    elif isinstance(obj, float):
        out += struct.pack(">Bd", 0xCB, obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xD9, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += struct.pack(">BB", 0xC4, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for item in obj:
            _pack_into(item, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack_into(k, out)
            _pack_into(v, out)
    else:
        raise TypeError(f"cannot msgpack type {type(obj).__name__}")


def packb(obj: Any) -> bytes:
    """Serialize one object to msgpack bytes."""
    if _msgpack is not None:
        return _msgpack.packb(obj)
    out = bytearray()
    _pack_into(obj, out)
    return bytes(out)


class Unpacker:
    """Streaming unpacker over a bytes buffer (or everything read from a
    binary stream): iterate to get consecutive top-level objects."""

    def __init__(self, buf: bytes | BinaryIO):
        self._buf = buf if isinstance(buf, (bytes, bytearray)) else buf.read()
        self._pos = 0

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self) -> Any:
        if self._pos >= len(self._buf):
            raise StopIteration
        return self._unpack_one()

    # -- decoding ------------------------------------------------------------

    def _take(self, n: int) -> bytes:
        if self._pos + n > len(self._buf):
            raise ValueError("msgpack: truncated input")
        b = self._buf[self._pos : self._pos + n]
        self._pos += n
        return b

    def _unpack_one(self) -> Any:
        t = self._take(1)[0]
        if t <= 0x7F:  # positive fixint
            return t
        if t >= 0xE0:  # negative fixint
            return t - 0x100
        if 0x80 <= t <= 0x8F:  # fixmap
            return self._map(t & 0x0F)
        if 0x90 <= t <= 0x9F:  # fixarray
            return self._array(t & 0x0F)
        if 0xA0 <= t <= 0xBF:  # fixstr
            return self._take(t & 0x1F).decode("utf-8")
        if t == 0xC0:
            return None
        if t == 0xC2:
            return False
        if t == 0xC3:
            return True
        if t == 0xC4:
            return bytes(self._take(self._u(1)))
        if t == 0xC5:
            return bytes(self._take(self._u(2)))
        if t == 0xC6:
            return bytes(self._take(self._u(4)))
        if t == 0xCA:
            return struct.unpack(">f", self._take(4))[0]
        if t == 0xCB:
            return struct.unpack(">d", self._take(8))[0]
        if t == 0xCC:
            return self._u(1)
        if t == 0xCD:
            return self._u(2)
        if t == 0xCE:
            return self._u(4)
        if t == 0xCF:
            return self._u(8)
        if t == 0xD0:
            return struct.unpack(">b", self._take(1))[0]
        if t == 0xD1:
            return struct.unpack(">h", self._take(2))[0]
        if t == 0xD2:
            return struct.unpack(">i", self._take(4))[0]
        if t == 0xD3:
            return struct.unpack(">q", self._take(8))[0]
        if t == 0xD9:
            return self._take(self._u(1)).decode("utf-8")
        if t == 0xDA:
            return self._take(self._u(2)).decode("utf-8")
        if t == 0xDB:
            return self._take(self._u(4)).decode("utf-8")
        if t == 0xDC:
            return self._array(self._u(2))
        if t == 0xDD:
            return self._array(self._u(4))
        if t == 0xDE:
            return self._map(self._u(2))
        if t == 0xDF:
            return self._map(self._u(4))
        raise ValueError(f"msgpack: unsupported type byte 0x{t:02x}")

    def _u(self, n: int) -> int:
        return int.from_bytes(self._take(n), "big")

    def _array(self, n: int) -> list:
        return [self._unpack_one() for _ in range(n)]

    def _map(self, n: int) -> dict:
        return {self._unpack_one(): self._unpack_one() for _ in range(n)}


def unpackb(b: bytes) -> Any:
    """Deserialize one msgpack object (errors on trailing bytes)."""
    u = Unpacker(b)
    obj = next(u)
    if u._pos != len(u._buf):
        raise ValueError("msgpack: trailing bytes after object")
    return obj


# ---------------------------------------------------------------------------
# ArynSDoc framing (reference document.py:214-278)
# ---------------------------------------------------------------------------


def serialize_document(doc: dict[str, Any]) -> bytes:
    """Frame one document row-dict: header + elementless map + one msgpack
    object per element + terminator. Byte-compatible with the reference's
    ``Document.web_serialize`` for the shared type subset."""
    out = bytearray()
    out += struct.pack(HEADER_FORMAT, MAGIC, VERSION_MAJOR, VERSION_MINOR)
    elementless = {k: v for k, v in doc.items() if k != "elements"}
    out += packb(elementless)
    for el in doc.get("elements") or []:
        out += packb(el)
    out += packb(_TERMINATOR)
    return bytes(out)


def deserialize_document(raw: bytes) -> dict[str, Any]:
    """Inverse of ``serialize_document`` (reference web_deserialize
    semantics: magic/version validated, premature end is an error)."""
    hdr_size = struct.calcsize(HEADER_FORMAT)
    if len(raw) < hdr_size:
        raise RuntimeError("Failed to read document header")
    magic, major, minor = struct.unpack(HEADER_FORMAT, raw[:hdr_size])
    if magic != MAGIC:
        raise RuntimeError("Input does not appear to be a serialized document (Bad magic number).")
    if major != VERSION_MAJOR or minor != VERSION_MINOR:
        raise RuntimeError(f"Unsupported serialization version: {major}.{minor}")
    unpacker = Unpacker(raw[hdr_size:])
    doc = next(unpacker)
    elements: list = []
    saw_terminator = False
    for obj in unpacker:
        if obj == _TERMINATOR:
            saw_terminator = True
            break
        elements.append(obj)
    if not saw_terminator:
        raise RuntimeError("Premature end of serialized document stream.")
    doc["elements"] = elements
    return doc


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------


def docs_to_wire(df, id_col: str = "doc_id"):
    """DataFrame -> (doc_id, wire binary): per-partition Arrow-batched
    serialization; ``elements`` (an array of structs, if present) nests into
    the frame as element maps."""
    import pandas as pd  # noqa: PLC0415

    cols = df.columns

    def ser(batches):
        for pdf in batches:
            ids, blobs = [], []
            for row in pdf.to_dict("records"):
                doc = {k: _plainify(row[k]) for k in cols}
                ids.append(row[id_col])
                blobs.append(serialize_document(doc))
            yield pd.DataFrame({id_col: ids, "wire": blobs})

    id_type = dict(df.dtypes)[id_col]
    return df.mapInPandas(ser, f"{id_col} {id_type}, wire binary")


def wire_to_docs(df, wire_col: str = "wire"):
    """(.., wire binary) -> (doc_json string): each blob deframed and
    re-emitted as one canonical JSON document string (callers parse with
    ``from_json`` + their schema — explicit, no driver inference)."""
    import json

    import pandas as pd  # noqa: PLC0415

    def deser(batches):
        for pdf in batches:
            docs = [
                json.dumps(deserialize_document(bytes(b)), sort_keys=True, default=str)
                for b in pdf[wire_col]
            ]
            yield pd.DataFrame({"doc_json": docs})

    return df.mapInPandas(deser, "doc_json string")


def _plainify(v: Any) -> Any:
    """numpy/pandas scalars and arrays -> plain Python for the codec.

    Temporal and Decimal values are normalized rather than rejected —
    msgpack has no native type for them, so the convention is: datetime /
    pd.Timestamp / date -> ISO-8601 string (UTC offset preserved if aware),
    Decimal -> string (lossless; a float cast would corrupt money columns).
    Without this, docs_to_wire raised TypeError from packb deep inside an
    executor for any DataFrame with a timestamp column."""
    import datetime as _dt
    import decimal as _decimal

    import numpy as np  # noqa: PLC0415

    if isinstance(v, np.generic):
        v = v.item()  # np.datetime64 .item() yields datetime — fall through
    if isinstance(v, np.ndarray):
        return [_plainify(x) for x in v.tolist()]
    if isinstance(v, list):
        return [_plainify(x) for x in v]
    if isinstance(v, dict):
        return {k: _plainify(x) for k, x in v.items()}
    try:
        import pandas as pd  # noqa: PLC0415

        if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
    except Exception:
        pass
    if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
        return v.isoformat()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    if isinstance(v, _decimal.Decimal):
        return str(v)
    return v
