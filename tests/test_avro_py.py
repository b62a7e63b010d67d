"""Pure-Python Avro wire-format serde (D3/D4 without the spark-avro jar)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.functions.avro_py import (
    decode_email,
    email_from_avro_py,
    email_to_avro_py,
    encode_email,
)


def test_golden_bytes_match_avro_spec():
    # zigzag(1)=2; strings are varint-length-prefixed utf8
    assert encode_email(1, "a", "b") == b"\x02\x02a\x02b"
    # negative int: zigzag(-1)=1
    assert encode_email(-1, "", "") == b"\x01\x00\x00"
    # multi-byte varint: length 200 → zigzag 400 → LEB128 0x90 0x03
    body = "x" * 200
    enc = encode_email(0, "", body)
    assert enc[:2] == b"\x00\x00" and enc[2:4] == b"\x90\x03"


def test_py_roundtrip_unicode():
    for rec in [(0, "", ""), (123456, "héllo ✓", "body\nwith\nlines"),
                (-7, "*No Subject*", "x" * 5000)]:
        assert decode_email(encode_email(*rec)) == rec


def test_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "*S1*", "body one"), (2, "*S2*", "çedilla ✓")],
        "seqno int, subject string, body string",
    )
    rec = F.struct("seqno", "subject", "body")
    out = (
        df.select(email_to_avro_py(rec).alias("value"))
        .select(email_from_avro_py(F.col("value")).alias("r"))
        .select("r.*")
        .orderBy("seqno")
        .collect()
    )
    assert [tuple(r) for r in out] == [(1, "*S1*", "body one"),
                                       (2, "*S2*", "çedilla ✓")]


def test_pipeline_roundtrip_avro_py(spark):
    """producer_transform(avro-py) bytes decode via consumer_transform."""
    from kafka_flink_slack_pipeline_spark.streaming.consumer_pipeline import (
        consumer_transform,
    )
    from kafka_flink_slack_pipeline_spark.streaming.producer_pipeline import (
        producer_transform,
    )

    raw = spark.createDataFrame(
        [(1, 101, "Subject A", "TLDR body text here")],
        "email_id bigint, seqno int, subject_raw string, body_raw string",
    )
    staged = producer_transform(raw, serde="avro-py")
    envelope = staged.select(
        "value",
        F.lit("technews").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("email_id").alias("offset"),
    )
    out = consumer_transform(envelope, serde="avro-py").collect()
    assert len(out) == 1
    assert out[0].subject == "*Subject A*"
    assert "TLDR body text here" in out[0].payload
