"""Avro Object Container File I/O — W7 audit-format parity.

The reference's audit tee writes Snappy parquet OR Avro per the
``avro_type`` config (transforms/GcsLogTransform.java:38-67, flag
model/job/Config.java:15). This runtime ships no spark-avro jar and no
fastavro, so the Avro path is implemented directly against the PUBLIC
Avro 1.x specification (file container format + binary encoding):

  container = magic 'Obj\\x01'
            + metadata map {avro.schema, avro.codec=null}
            + 16-byte sync marker
            + blocks [record-count, byte-size, records..., sync]
  binary    = zigzag-varint ints/longs, little-endian IEEE
              float/double, length-prefixed utf8/bytes, union index
              prefix, record = fields in declared order

Supported Spark types: string, long, int, double, float, boolean,
binary, timestamp (as logicalType timestamp-micros) — the flat audit
row shape. Every field is written as the nullable union
["null", T], matching how Avro converters treat nullable columns.

The distributed write is one ``mapInPandas`` pass (one .avro file per
partition, same layout as a parquet directory write); the read side is
a driver-side decode used by tests/lineage audits.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid

import pandas as pd

MAGIC = b"Obj\x01"

_AVRO_FOR_SPARK = {
    "string": "string",
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}


def avro_schema_for(spark_schema, name: str = "audit") -> dict:
    """Spark StructType → Avro record schema (nullable unions)."""
    fields = []
    for f in spark_schema.fields:
        tn = f.dataType.typeName()
        if tn not in _AVRO_FOR_SPARK:
            raise ValueError(
                f"avro audit sink: unsupported column type {tn!r} "
                f"for field {f.name!r} (flat audit rows only)")
        fields.append({"name": f.name,
                       "type": ["null", _AVRO_FOR_SPARK[tn]]})
    return {"type": "record", "name": name, "fields": fields}


# ----------------------------------------------------------- binary enc

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(int(n)) & ((1 << 64) - 1)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


def _encode_value(buf: io.BytesIO, v, avro_type) -> None:
    """One ["null", T] union value."""
    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        _write_long(buf, 0)
        return
    _write_long(buf, 1)
    t = avro_type if isinstance(avro_type, str) else avro_type["type"]
    logical = (avro_type.get("logicalType")
               if isinstance(avro_type, dict) else None)
    if logical == "timestamp-micros":
        ts = pd.Timestamp(v)
        _write_long(buf, int(ts.value // 1000))
    elif t in ("long", "int"):
        _write_long(buf, int(v))
    elif t == "double":
        buf.write(struct.pack("<d", float(v)))
    elif t == "float":
        buf.write(struct.pack("<f", float(v)))
    elif t == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif t == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    elif t == "bytes":
        _write_bytes(buf, bytes(v))
    else:
        raise ValueError(f"unsupported avro type: {avro_type!r}")


def _decode_value(buf: io.BytesIO, avro_type):
    if _read_long(buf) == 0:
        return None
    t = avro_type if isinstance(avro_type, str) else avro_type["type"]
    logical = (avro_type.get("logicalType")
               if isinstance(avro_type, dict) else None)
    if logical == "timestamp-micros":
        return pd.Timestamp(_read_long(buf), unit="us")
    if t in ("long", "int"):
        return _read_long(buf)
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return _read_bytes(buf)
    raise ValueError(f"unsupported avro type: {avro_type!r}")


# ------------------------------------------------------------ container

def write_avro_file(path: str, pdf: pd.DataFrame, schema: dict) -> int:
    """Write one container file; returns the row count."""
    sync = uuid.uuid4().bytes
    types = {f["name"]: f["type"][1] for f in schema["fields"]}
    body = io.BytesIO()
    for row in pdf.itertuples(index=False):
        for name, v in zip(pdf.columns, row):
            _encode_value(body, v, types[name])
    with open(path, "wb") as f:
        f.write(MAGIC)
        head = io.BytesIO()
        _write_long(head, 2)
        _write_bytes(head, b"avro.schema")
        _write_bytes(head, json.dumps(schema).encode())
        _write_bytes(head, b"avro.codec")
        _write_bytes(head, b"null")
        _write_long(head, 0)
        f.write(head.getvalue())
        f.write(sync)
        if len(pdf):
            block = io.BytesIO()
            _write_long(block, len(pdf))
            _write_long(block, len(body.getvalue()))
            f.write(block.getvalue())
            f.write(body.getvalue())
            f.write(sync)
    return len(pdf)


def read_avro_file(path: str) -> pd.DataFrame:
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    assert buf.read(4) == MAGIC, f"not an avro container: {path}"
    meta = {}
    n = _read_long(buf)
    while n != 0:
        if n < 0:
            # Avro spec: a negative block count is followed by the
            # block's byte size (fast-skip aid) before the entries.
            _read_long(buf)
        for _ in range(abs(n)):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
        n = _read_long(buf)
    schema = json.loads(meta["avro.schema"])
    assert meta.get("avro.codec", b"null") == b"null"
    sync = buf.read(16)
    cols = [f["name"] for f in schema["fields"]]
    types = [f["type"][1] for f in schema["fields"]]
    rows = []
    while buf.tell() < len(raw):
        count = _read_long(buf)
        _read_long(buf)  # byte size
        for _ in range(count):
            rows.append([_decode_value(buf, t) for t in types])
        assert buf.read(16) == sync, f"sync marker mismatch in {path}"
    # object dtype: a long column containing nulls must NOT collapse to
    # float64 (2^53+ values would silently lose precision)
    return pd.DataFrame(rows, columns=cols, dtype=object)


# ---------------------------------------------------------- spark-level

def write_avro_dir(df, path: str) -> int:
    """Distributed write: one .avro file per partition under ``path``
    (the avro twin of ``df.write.parquet(path)``) via a single
    mapInPandas pass. Returns total rows written."""
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    schema = avro_schema_for(df.schema)
    os.makedirs(path, exist_ok=True)

    def writer(batches):
        parts = []
        for pdf in batches:
            parts.append(pdf)
        pid = TaskContext.get().partitionId()
        pdf = (pd.concat(parts, ignore_index=True) if parts
               else pd.DataFrame())
        n = 0
        if len(pdf):
            # Deterministic final name + atomic rename: a Spark task
            # retry (or speculative duplicate) replaces the partition's
            # file instead of appending a second uuid-named copy.
            fn = os.path.join(path, f"part-{pid:05d}.avro")
            tmp = fn + f".tmp-{uuid.uuid4().hex[:8]}"
            n = write_avro_file(tmp, pdf, schema)
            os.replace(tmp, fn)
        yield pd.DataFrame({"n": [n]})

    counts = df.mapInPandas(writer, "n long")
    total = counts.agg(F.sum("n")).collect()[0][0]
    return int(total or 0)


def read_avro_dir(spark, path: str):
    """Driver-side read of a write_avro_dir directory → DataFrame."""
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".avro"))
    pdfs = [read_avro_file(f) for f in files]
    pdf = pd.concat(pdfs, ignore_index=True)
    return spark.createDataFrame(pdf)
