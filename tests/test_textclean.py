"""JS-dialect golden tests for the email clean chain (P0-P17).

Expected outputs are hand-derived from the reference semantics
(Producer/kafkaProducer.js:118-201), including its quirks: the P13
leading-[ OR trailing-] alternation, P12's `**` on all-space caps lines,
conditional trims in P3-P5, and the /i flag on P15's letter classes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.functions import textclean as TC


def _clean(spark, body: str) -> str:
    df = spark.createDataFrame([(body,)], "body string")
    return df.select(TC.clean_body(F.col("body")).alias("out")).collect()[0].out


def _one(spark, col, value: str) -> str:
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col(F.col("v")).alias("out")).collect()[0].out


def test_full_chain_newsletter(spark):
    body = (
        "Newsletter Xyz\n"
        "Together With Sponsor\n"
        "TLDR AI 2025-09-01\n\n"
        "BIG NEWS TODAY\n"
        "Some story text\n"
        "by John Smith\n"
        "https://example.com/a.png\n"
        "Love TLDR? Tell your friends and get rewards!\n"
        "Footer junk"
    )
    assert _clean(spark, body) == (
        "TLDR AI 2025-09-01\n*BIG NEWS TODAY*\nSome story text"
    )


def test_subject_formatting(spark):
    assert _one(spark, TC.format_subject, "Hello") == "*Hello*"
    df = spark.createDataFrame([(None,), ("",)], "v string")
    out = [r.out for r in df.select(TC.format_subject(F.col("v")).alias("out")).collect()]
    assert out == ["*No Subject*", "*No Subject*"]


def test_p2_together_with_first_match_only(spark):
    body = "a\nTogether With X\nkeep\nTogether With Y\nalso keep"
    assert _one(spark, TC.strip_together_with, body) == "keep\nTogether With Y\nalso keep"


def test_p3_trim_only_on_match(spark):
    assert _one(spark, TC.trim_to_tldr_start, "  no marker  ") == "  no marker  "
    assert _one(spark, TC.trim_to_tldr_start, "junk\nTLDR x  ") == "TLDR x"
    # ^TLDR must be at line start; indented TLDR does not match
    assert _one(spark, TC.trim_to_tldr_start, "junk\n  TLDR x") == "junk\n  TLDR x"
    # case-insensitive
    assert _one(spark, TC.trim_to_tldr_start, "junk\ntldr y") == "tldr y"


def test_p4_p5_truncations(spark):
    assert (
        _one(spark, TC.truncate_at_tldr_end,
             "keep \nLove TLDR? Tell your friends and get rewards!\ndrop")
        == "keep"
    )
    assert _one(spark, TC.truncate_at_feedback, "keep \nHow Did We Do Today?\nx") == "keep"


def test_p6_p8_mime_noise(spark):
    body = (
        "Content-Type: text/plain; charset=utf-8\n"
        "Content-Transfer-Encoding: quoted-printable\n"
        "--boundary123\n"
        "real content"
    )
    assert _one(spark, TC.strip_mime_noise, body) == "real content"


def test_p12_caps_heading_quirks(spark):
    assert _one(spark, TC.bold_caps_headings, "AI & ML 2025\ntext") == "*AI & ML 2025*\ntext"
    # all-space line matches [A-Z0-9 &]+ and trims to '' → '**' (JS quirk)
    assert _one(spark, TC.bold_caps_headings, "   \nx") == "**\nx"
    # hyphen is not in the class → no bolding
    assert _one(spark, TC.bold_caps_headings, "TLDR-AI\nx") == "TLDR-AI\nx"
    # trailing spaces are trimmed inside the stars
    assert _one(spark, TC.bold_caps_headings, "NEWS  ") == "*NEWS*"


def test_p13_bracket_alternation(spark):
    assert _one(spark, TC.strip_stray_brackets, "[hello]") == "hello"
    assert _one(spark, TC.strip_stray_brackets, "[only") == "only"
    assert _one(spark, TC.strip_stray_brackets, "only]") == "only"
    assert _one(spark, TC.strip_stray_brackets, "a]b\n[c") == "a]b\nc"


def test_p14_image_urls(spark):
    assert _one(spark, TC.strip_image_urls, "see https://x.co/img.PNG here") == "see  here"
    assert _one(spark, TC.strip_image_urls, "https://x.co/page.html") == "https://x.co/page.html"


def test_p15_bylines_case_insensitive_classes(spark):
    # /i makes [A-Z][a-z]+ match any-cased words (JS flag semantics)
    assert _one(spark, TC.strip_bylines, "by john smith\nkeep") == "keep"
    assert _one(spark, TC.strip_bylines, "  by Jane Doe (Reporter)\nkeep") == "keep"
    assert _one(spark, TC.strip_bylines, "standby crew\nkeep") == "standby crew\nkeep"


def test_p18_mention_strip(spark):
    assert _one(spark, TC.strip_mentions, "<@U02ABC9Z> what is AQE? ") == "what is AQE?"
    assert _one(spark, TC.strip_mentions, "<@U1> hi <@U2> there") == "hi  there"


def test_html_gate(spark):
    df = spark.createDataFrame(
        [("<html><p>x</p></html>",), ("plain",), ("has <body> tag",)], "v string"
    )
    out = [r.g for r in df.select(TC.is_html(F.col("v")).alias("g")).collect()]
    assert out == [True, False, True]


def test_decode_error_sentinel(spark):
    from kafka_flink_slack_pipeline_spark.functions.serde import (
        DECODE_ERROR_SENTINEL,
        quoted_printable_decode,
    )

    df = spark.createDataFrame([("Caf=C3=A9 r=0Aok",), (None,)], "v string")
    out = [r.out for r in df.select(quoted_printable_decode(F.col("v")).alias("out")).collect()]
    assert out[0] == "Café r\nok"
    assert out[1] is None
    assert DECODE_ERROR_SENTINEL == "(Unable to decode email body)"


def test_subject_header_parse(spark):
    from kafka_flink_slack_pipeline_spark.functions.serde import parse_subject_header

    raw = "Subject: Hello\n world\n"
    assert _one(spark, parse_subject_header, raw) == "Hello world"
    assert _one(spark, parse_subject_header, "X-Other: nope\n") == ""


@pytest.mark.parametrize(
    ("html", "expected_contains"),
    [
        # normal link → Slack format with bold text ("Read more here" has a
        # lowercase word so it does NOT match the reference's author regex;
        # note "Read More" WOULD match /^[A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,3}$/
        # and come out bare — faithful to kafkaProducer.js:150)
        ('<html><p><a href="https://x.co">Read more here</a></p></html>', "<https://x.co|*Read more here*>"),
        ('<html><p><a href="https://x.co">Read More</a></p></html>', "Read More"),
        # author-name-looking text → bare text
        ('<html><p><a href="https://x.co">John Smith</a></p></html>', "John Smith"),
        # empty anchor text → 'Link'
        ('<html><p><a href="https://x.co"></a></p></html>', "<https://x.co|*Link*>"),
    ],
)
def test_p1_anchor_rules(spark, html, expected_contains):
    from kafka_flink_slack_pipeline_spark.functions.html_text import html_to_text_py

    out = html_to_text_py(html)
    assert expected_contains in out
    if "John Smith" in out:
        assert "<https" not in out


def test_parse_headers_udtf(spark):
    """Python UDTF: header block → rows, with folded-header unfolding."""
    from pyspark.sql.functions import lit

    from kafka_flink_slack_pipeline_spark.functions.udtf_headers import (
        ParseHeaders,
    )

    raw = (
        "Subject: Hello\r\n world again\r\n"
        "From: news@example.com\r\n"
        "X-List: a\n\tb\n"
    )
    rows = [tuple(r) for r in ParseHeaders(lit(raw)).collect()]
    assert rows == [
        ("Subject", "Hello world again"),
        ("From", "news@example.com"),
        ("X-List", "a b"),
    ]

    # lateral-join usage over a frame
    spark.udtf.register("parse_headers", ParseHeaders)
    df = spark.createDataFrame([(1, raw), (2, "A: 1\n")], "id int, raw string")
    df.createOrReplaceTempView("raw_emails")
    out = spark.sql(
        "SELECT id, h.name, h.value FROM raw_emails, "
        "LATERAL parse_headers(raw) h ORDER BY id, h.name"
    ).collect()
    assert ("A", "1") in {(r.name, r.value) for r in out if r.id == 2}
    assert len([r for r in out if r.id == 1]) == 3
