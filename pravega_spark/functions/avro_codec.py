"""Pure-Python Avro *binary* codec for event payloads.

The reference types events through ``Serializer<T>`` implementations
(client/.../stream/Serializer.java; impls in client/.../stream/impl/),
and real deployments overwhelmingly use Avro wire format. Spark's
native ``from_avro``/``to_avro`` live in the spark-avro CONNECTOR,
which is an external jar this environment does not ship — so this
module implements the Avro 1.x binary encoding (the public spec,
https://avro.apache.org/docs/current/specification/) directly, and
``serializers.typed_serializer`` exposes it through Arrow-batched
pandas UDFs when the connector is absent. Payload bytes produced here
are spec-compliant: a JVM consumer with the real connector decodes
them, and vice versa.

Supported schema subset (typical event payloads): records of
``null,boolean,int,long,float,double,bytes,string``, arrays, maps,
nested records, 2-branch unions with ``null`` (nullable fields),
``enum``, ``fixed``, and the logical types real event schemas carry:
``timestamp-millis`` / ``timestamp-micros`` (long ↔ naive-UTC
datetime), ``date`` (int ↔ datetime.date), and ``decimal`` on bytes or
fixed (↔ decimal.Decimal, two's-complement big-endian unscaled value
per the spec). Unknown logical types fall back to their underlying
Avro type, as the specification instructs. Anything else — multi-branch
unions, recursive types — still raises at schema-compile time, not at
encode time.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import struct
from io import BytesIO

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

_EPOCH_DATE = _dt.date(1970, 1, 1)

# logical types with typed Python mappings; (logicalType, underlying)
_LOGICAL = {
    ("timestamp-millis", "long"),
    ("timestamp-micros", "long"),
    ("date", "int"),
    ("decimal", "bytes"),
    ("decimal", "fixed"),
}


_EPOCH_AWARE = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_EPOCH_NAIVE = _dt.datetime(1970, 1, 1)


def _to_epoch(v, unit: int) -> int:
    """datetime (naive = UTC) or raw int → epoch count at ``unit`` per
    second. Exact integer math — no float epoch round trip."""
    if isinstance(v, int):
        return v
    if isinstance(v, _dt.datetime):
        delta = (v - _EPOCH_AWARE) if v.tzinfo is not None else (v - _EPOCH_NAIVE)
        total_us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        return total_us * unit // 1_000_000
    raise TypeError(f"timestamp value must be datetime or int, got {type(v).__name__}")


def _from_epoch(n: int, unit: int) -> _dt.datetime:
    """Epoch count → NAIVE UTC datetime (matches Spark's session-UTC
    TIMESTAMP and pandas' tz-less default)."""
    return _EPOCH_NAIVE + _dt.timedelta(microseconds=n * (1_000_000 // unit))


def _unscaled_bytes(v, scale: int, size: int | None = None) -> bytes:
    """Decimal → two's-complement big-endian unscaled int (spec: decimal)."""
    if not isinstance(v, _decimal.Decimal):
        v = _decimal.Decimal(str(v))
    unscaled = int(v.scaleb(scale).to_integral_value(rounding=_decimal.ROUND_HALF_UP))
    length = size if size is not None else max(1, (unscaled.bit_length() + 8) // 8)
    return unscaled.to_bytes(length, "big", signed=True)


# ---------------- varint / zigzag (spec: binary encoding, long)
def _write_long(buf: BytesIO, n: int) -> None:
    # zigzag then base-128 varint, little-endian groups, high bit = more
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _checked_len(buf: BytesIO) -> int:
    """Length prefix for bytes/string: a corrupt negative varint would
    make buf.read(-n) swallow the whole remaining buffer as a value."""
    n = _read_long(buf)
    if n < 0:
        raise ValueError(f"corrupt negative length {n}")
    return n


def _read_long(buf: BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


class AvroSchema:
    """Compiled schema: encode/decode Python values ↔ Avro binary."""

    def __init__(self, schema: str | dict):
        self.schema = json.loads(schema) if isinstance(schema, str) else schema
        self._check(self.schema)

    def _check(self, s) -> None:
        if isinstance(s, str):
            if s not in _PRIMITIVES:
                raise ValueError(f"unsupported Avro type: {s!r}")
            return
        if isinstance(s, list):  # union
            if len(s) != 2 or "null" not in s:
                raise ValueError("only 2-branch unions with null are supported")
            self._check(next(b for b in s if b != "null"))
            return
        t = s.get("type")
        lt = s.get("logicalType")
        if lt is not None and (lt, t) in _LOGICAL:
            if lt == "decimal":
                scale = s.get("scale", 0)
                prec = s.get("precision")
                if not isinstance(prec, int) or prec <= 0 or not isinstance(scale, int) or scale < 0:
                    raise ValueError(f"decimal needs int precision>0/scale>=0, got {s!r}")
            if t == "fixed" and not isinstance(s.get("size"), int):
                raise ValueError(f"fixed needs an int size: {s!r}")
            return
        # unknown logical types fall through: the spec says ignore them
        # and use the underlying type
        if t == "record":
            for f in s["fields"]:
                self._check(f["type"])
        elif t == "array":
            self._check(s["items"])
        elif t == "map":
            self._check(s["values"])
        elif t == "enum":
            syms = s.get("symbols")
            if not isinstance(syms, list) or not all(isinstance(x, str) for x in syms):
                raise ValueError(f"enum needs a string symbols list: {s!r}")
        elif t == "fixed":
            if not isinstance(s.get("size"), int) or s["size"] < 0:
                raise ValueError(f"fixed needs an int size: {s!r}")
        elif t in _PRIMITIVES:
            pass
        else:
            raise ValueError(f"unsupported Avro type: {t!r}")

    # ---------------- encode
    def encode(self, value) -> bytes:
        buf = BytesIO()
        self._enc(buf, self.schema, value)
        return buf.getvalue()

    def _enc(self, buf: BytesIO, s, v) -> None:
        if isinstance(s, list):  # nullable union; branch index then value
            nn = next(b for b in s if b != "null")
            if v is None:
                _write_long(buf, s.index("null"))
            else:
                _write_long(buf, s.index(nn))
                self._enc(buf, nn, v)
            return
        t = s if isinstance(s, str) else s["type"]
        lt = s.get("logicalType") if isinstance(s, dict) else None
        if lt is not None and (lt, t) in _LOGICAL:
            if lt == "timestamp-millis":
                _write_long(buf, _to_epoch(v, 1000))
            elif lt == "timestamp-micros":
                _write_long(buf, _to_epoch(v, 1_000_000))
            elif lt == "date":
                if isinstance(v, _dt.datetime):
                    v = v.date()
                days = v if isinstance(v, int) else (v - _EPOCH_DATE).days
                _write_long(buf, days)
            else:  # decimal on bytes or fixed
                b = _unscaled_bytes(v, s.get("scale", 0),
                                    s["size"] if t == "fixed" else None)
                if t == "bytes":
                    _write_long(buf, len(b))
                buf.write(b)
            return
        if t == "null":
            return
        if t == "boolean":
            buf.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            _write_long(buf, int(v))
        elif t == "float":
            buf.write(struct.pack("<f", float(v)))
        elif t == "double":
            buf.write(struct.pack("<d", float(v)))
        elif t == "bytes":
            b = bytes(v)
            _write_long(buf, len(b))
            buf.write(b)
        elif t == "string":
            b = str(v).encode("utf-8")
            _write_long(buf, len(b))
            buf.write(b)
        elif t == "record":
            for f in s["fields"]:
                self._enc(buf, f["type"], v.get(f["name"]) if isinstance(v, dict) else getattr(v, f["name"]))
        elif t == "array":
            items = list(v)
            if items:
                _write_long(buf, len(items))
                for it in items:
                    self._enc(buf, s["items"], it)
            _write_long(buf, 0)
        elif t == "map":
            entries = dict(v)
            if entries:
                _write_long(buf, len(entries))
                for k, mv in entries.items():
                    self._enc(buf, "string", k)
                    self._enc(buf, s["values"], mv)
            _write_long(buf, 0)
        elif t == "enum":
            # symbol string or pre-resolved index; spec: int = symbol pos
            idx = v if isinstance(v, int) else s["symbols"].index(v)
            if not 0 <= idx < len(s["symbols"]):
                raise ValueError(f"enum index {idx} out of range for {s['symbols']}")
            _write_long(buf, idx)
        elif t == "fixed":
            b = bytes(v)
            if len(b) != s["size"]:
                raise ValueError(f"fixed size mismatch: got {len(b)}, want {s['size']}")
            buf.write(b)
        else:  # pragma: no cover — _check rejects these
            raise ValueError(f"unsupported Avro type: {t!r}")

    # ---------------- decode
    def decode(self, payload: bytes):
        return self._dec(BytesIO(bytes(payload)), self.schema)

    def _dec(self, buf: BytesIO, s):
        if isinstance(s, list):
            idx = _read_long(buf)
            if not 0 <= idx < len(s):
                # Python's negative indexing would silently decode a
                # corrupt varint as the LAST branch; corruption must be
                # a loud decode error, never plausible garbage
                raise ValueError(f"corrupt union branch index {idx}")
            branch = s[idx]
            return None if branch == "null" else self._dec(buf, branch)
        t = s if isinstance(s, str) else s["type"]
        lt = s.get("logicalType") if isinstance(s, dict) else None
        if lt is not None and (lt, t) in _LOGICAL:
            if lt == "timestamp-millis":
                return _from_epoch(_read_long(buf), 1000)
            if lt == "timestamp-micros":
                return _from_epoch(_read_long(buf), 1_000_000)
            if lt == "date":
                return _EPOCH_DATE + _dt.timedelta(days=_read_long(buf))
            # decimal on bytes or fixed
            raw = buf.read(s["size"]) if t == "fixed" else buf.read(_read_long(buf))
            unscaled = int.from_bytes(raw, "big", signed=True)
            return _decimal.Decimal(unscaled).scaleb(-s.get("scale", 0))
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return buf.read(_checked_len(buf))
        if t == "string":
            return buf.read(_checked_len(buf)).decode("utf-8")
        if t == "record":
            return {f["name"]: self._dec(buf, f["type"]) for f in s["fields"]}
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec-legal writers)
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    out.append(self._dec(buf, s["items"]))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = self._dec(buf, "string")
                    out[k] = self._dec(buf, s["values"])
        if t == "enum":
            return s["symbols"][_read_long(buf)]
        if t == "fixed":
            return buf.read(s["size"])
        raise ValueError(f"unsupported Avro type: {t!r}")  # pragma: no cover
