"""Pure-Python Avro binary serde for the email record (D3/D4 fallback).

The reference Avro-encodes `record {seqno:int, subject:string, body:string}`
with the avsc library (`Producer/kafkaProducer.js:69`,
`Consumer/kafkaConsumer.js:61`). Spark's `from_avro`/`to_avro` need the
spark-avro jar, which pip-installed pyspark does not bundle — so this
module implements the Avro BINARY WIRE FORMAT for this one record shape
directly (Avro spec: int/long = zigzag varint; string = varint length +
utf-8 bytes; record = fields in declared order, no framing). Bytes are
interoperable with any Avro implementation given EMAIL_AVRO_JSON.

Used through serde="avro-py" in the producer/consumer pipelines; the
jar-backed path (serde="avro") remains first choice where spark-avro is on
the classpath (functions/serde.py:avro_available probes).

Arrow-batched pandas UDFs — per-row work is a few appends; the Python tax
is bounded and this sits on the serde boundary, not in the relational hot
path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _write_long(n: int, out: bytearray) -> None:
    """Zigzag + LEB128 varint (Avro int/long)."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def encode_email(seqno: int, subject: str, body: str) -> bytes:
    out = bytearray()
    _write_long(int(seqno), out)
    for s in (subject, body):
        raw = (s or "").encode("utf-8")
        _write_long(len(raw), out)
        out += raw
    return bytes(out)


def decode_email(data: bytes) -> tuple[int, str, str]:
    seqno, pos = _read_long(data, 0)
    vals = []
    for _ in range(2):
        ln, pos = _read_long(data, pos)
        vals.append(data[pos : pos + ln].decode("utf-8"))
        pos += ln
    return seqno, vals[0], vals[1]


_UDFS: dict = {}


def email_to_avro_py(record: Column) -> Column:
    """struct<seqno,subject,body> → Avro binary (pure-Python D3)."""
    if "enc" not in _UDFS:

        @F.pandas_udf("binary")
        def _enc(pdf: pd.DataFrame) -> pd.Series:
            return pd.Series(
                [
                    encode_email(r["seqno"], r["subject"], r["body"])
                    for _, r in pdf.iterrows()
                ],
                dtype=object,
            )

        _UDFS["enc"] = _enc
    return _UDFS["enc"](record)


def email_from_avro_py(value: Column) -> Column:
    """Avro binary → struct<seqno,subject,body> (pure-Python D4)."""
    if "dec" not in _UDFS:

        @F.pandas_udf("seqno int, subject string, body string")
        def _dec(values: pd.Series) -> pd.DataFrame:
            rows = [decode_email(bytes(v)) for v in values]
            return pd.DataFrame(rows, columns=["seqno", "subject", "body"])

        # The decode IS deterministic; the flag only blocks Catalyst's
        # CollapseProject from inlining the UDF call into downstream
        # higher-order-function lambdas (E1/W3 folds), where Python UDFs
        # are unsupported (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF).
        # With the projection boundary preserved, the lambdas reference a
        # plain attribute.
        _UDFS["dec"] = _dec.asNondeterministic()
    return _UDFS["dec"](value)
