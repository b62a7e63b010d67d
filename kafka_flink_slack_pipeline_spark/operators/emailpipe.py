"""The reference's email/Slack dataflows as driver-verified queries.

These queries run the ACTUAL production operators (functions/textclean.py,
functions/chunking.py) over deterministic "emails" constructed in-query
from the `documents` table, so the driver's DuckDB oracle exercises the
full P0-P16 clean chain, the E1 greedy chunker, the W3 heading
hyperlinker, and the D5/E3 Block Kit assembly — not just unit goldens.

The synthetic-email construction is defined ONCE as a segment spec and
compiled to both a Spark Column and a DuckDB SQL expression, so the two
sides cannot drift.

Oracle dialect notes (Java regex vs DuckDB RE2):
  - P3's Java lookahead `(?=^TLDR)` has no RE2 equivalent; the oracle uses
    `regexp_extract('(?ims)(^TLDR.*)')` — same leftmost-line-start
    semantics, verified equal by the driver.
  - JS no-/g single-replace == DuckDB default regexp_replace; Spark's
    replace-all is tamed with \\A anchors where the reference omits /g.
  - E1's greedy line-packing is sequential per document; the oracle
    replicates it with a RECURSIVE CTE over (doc, line_idx).
  - W3's sequential URL-consumption is exactly expressible with lead/lag
    ONLY when no two URL lines are adjacent — the constructed body
    guarantees that, so the window oracle is exact (the Spark side still
    runs the faithful fold that handles the general case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.chunking import (
    hyperlink_headings,
    slack_blocks_payload,
    split_into_blocks,
)
from ..functions.textclean import (
    PROMPT_PREFIX,
    PROMPT_TAIL,
    assemble_prompt,
    clean_body,
    format_subject,
    history_line,
    strip_mentions,
    wrap_context_info,
)
from ..plans.registry import QuerySpec
from ..tables import table

CRLF = "\r\n"
JS_TRIM_SQL = r"regexp_replace({x}, '\A\s+|\s+\z', '', 'g')"

# ---------------------------------------------------------------------------
# Shared synthetic-email construction: ('lit', s) | ('substr', start, len) |
# ('docid',). Compiled to a Spark Column and to DuckDB SQL.
EMAIL_SEGMENTS: list[tuple] = [
    ("lit", "From: news@example.com" + CRLF),
    ("lit", "Content-Type: multipart/mixed; boundary=b42" + CRLF),
    ("lit", "Intro Together With SponsorCo" + CRLF),
    ("lit", "TLDR AI 2025-08-29" + CRLF + CRLF),
    ("lit", "BIG TECH & STARTUPS" + CRLF),
    ("lit", "Content-Type: text/plain; charset=utf-8" + CRLF),
    ("lit", "["), ("substr", 1, 60), ("lit", "]" + CRLF),
    ("lit", "Read <b>"), ("substr", 61, 40), ("lit", "</b> online" + CRLF),
    ("lit", "Image: https://cdn.example.com/pic_"), ("docid",),
    ("lit", ".png inline" + CRLF),
    ("lit", "--b42" + CRLF),
    ("lit", "Content-Transfer-Encoding: quoted-printable" + CRLF),
    ("lit", "Café corner: "), ("substr", 101, 80), ("lit", CRLF),
    ("lit", "by John Smith reporting" + CRLF),
    ("substr", 181, 100), ("lit", CRLF),
    ("lit", "how did we do today? vote below" + CRLF),
    ("lit", "Love TLDR? Tell your friends and get rewards!" + CRLF),
    ("lit", "unsubscribe footer junk"),
]


def _email_body_col() -> Column:
    parts = []
    for seg in EMAIL_SEGMENTS:
        if seg[0] == "lit":
            parts.append(F.lit(seg[1]))
        elif seg[0] == "substr":
            parts.append(F.substring(F.col("text"), seg[1], seg[2]))
        else:
            parts.append(F.col("doc_id").cast("string"))
    return F.concat(*parts)


def _sql_str(s: str) -> str:
    """SQL string literal with control chars via chr() (DuckDB does not
    interpret backslash escapes in plain literals)."""
    out, buf = [], []

    def flush():
        if buf:
            out.append("'" + "".join(buf).replace("'", "''") + "'")
            buf.clear()

    for ch in s:
        if ord(ch) < 32:
            flush()
            out.append(f"chr({ord(ch)})")
        else:
            buf.append(ch)
    flush()
    return " || ".join(out) if out else "''"


def _email_body_sql() -> str:
    parts = []
    for seg in EMAIL_SEGMENTS:
        if seg[0] == "lit":
            parts.append(_sql_str(seg[1]))
        elif seg[0] == "substr":
            parts.append(f"substr(text, {seg[1]}, {seg[2]})")
        else:
            parts.append("doc_id::VARCHAR")
    return " || ".join(parts)


def _subject_col() -> Column:
    return F.when(
        F.col("doc_id") % 7 == 0, F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("Tech Brief #"), F.col("doc_id").cast("string")))


SUBJECT_SQL = (
    "CASE WHEN doc_id % 7 = 0 THEN NULL"
    " ELSE 'Tech Brief #' || doc_id::VARCHAR END"
)


# ---------------------------------------------------------------------------
def email_clean_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P0 + P2-P16 over constructed noisy emails (every stage exercised on
    every row: MIME headers, Together-With preamble, TLDR trim, caps
    heading, brackets, HTML tags, image URL, byline, non-ASCII, feedback
    and Love-TLDR truncation markers)."""
    d = table(spark, sf_dir, "documents")
    mail = d.select(
        "doc_id", _subject_col().alias("subject"), _email_body_col().alias("body")
    )
    return mail.select(
        "doc_id",
        format_subject(F.col("subject")).alias("subject_out"),
        clean_body(F.col("body")).alias("body_out"),
    ).orderBy("doc_id")


def _clean_chain_oracle() -> str:
    j = JS_TRIM_SQL
    # pre-render the backslash-heavy pieces (f-string expressions cannot
    # contain backslashes on Python 3.11)
    trimmed_tldr = j.format(x="regexp_extract(body, '(?ims)(^TLDR.*)', 1)")
    trimmed_love = j.format(
        x="regexp_replace(body, 'Love TLDR\\? Tell your friends"
        " and get rewards![\\s\\S]*', '')"
    )
    trimmed_feedback = j.format(
        x="regexp_replace(body, '(?i)how did we do today[\\s\\S]*', '')"
    )
    trimmed_line = j.format(x="ln")
    trimmed_body = j.format(x="body")
    # one CTE per pipeline stage, mirroring clean_body() order
    return f"""
WITH b0 AS (
  SELECT doc_id, {SUBJECT_SQL} AS subject, {_email_body_sql()} AS body
  FROM documents
),
b1 AS (SELECT doc_id, subject, regexp_replace(body,
        '(?i)\\A[\\s\\S]*?Together With[^\\n]*\\n?', '') AS body FROM b0),
b2 AS (SELECT doc_id, subject, CASE WHEN regexp_matches(body, '(?im)^TLDR')
        THEN {trimmed_tldr}
        ELSE body END AS body FROM b1),
b3 AS (SELECT doc_id, subject, CASE
        WHEN regexp_matches(body, 'Love TLDR\\? Tell your friends and get rewards!')
        THEN {trimmed_love}
        ELSE body END AS body FROM b2),
b4 AS (SELECT doc_id, subject, CASE
        WHEN regexp_matches(body, '(?i)how did we do today')
        THEN {trimmed_feedback}
        ELSE body END AS body FROM b3),
b5 AS (SELECT doc_id, subject,
        regexp_replace(regexp_replace(regexp_replace(body,
          'Content-Type:.*?(\\r\\n|\\n|\\r)+', '', 'g'),
          'Content-Transfer-Encoding:.*?(\\r\\n|\\n|\\r)+', '', 'g'),
          '--.*?(\\r\\n|\\n|\\r)+', '', 'g') AS body FROM b4),
b6 AS (SELECT doc_id, subject, regexp_replace(body,
        '(\\r\\n|\\n|\\r)+', chr(10), 'g') AS body FROM b5),
b7 AS (SELECT doc_id, subject, regexp_replace(body, '<[^>]+>', '', 'g')
        AS body FROM b6),
b8 AS (SELECT doc_id, subject, regexp_replace(body, '[^\\x20-\\x7E\\n]', '', 'g')
        AS body FROM b7),
b9 AS (SELECT doc_id, subject,
        array_to_string(list_transform(str_split(body, chr(10)),
          ln -> CASE WHEN regexp_full_match(ln, '[A-Z0-9 &]+')
                THEN '*' || {trimmed_line} || '*' ELSE ln END),
          chr(10)) AS body FROM b8),
b10 AS (SELECT doc_id, subject, regexp_replace(body, '(?m)^\\[|\\]$', '', 'g')
        AS body FROM b9),
b11 AS (SELECT doc_id, subject, regexp_replace(body,
        '(?i)https?://\\S+\\.(png|jpg|jpeg|gif|svg)', '', 'g') AS body FROM b10),
b12 AS (SELECT doc_id, subject, regexp_replace(body,
        '(?im)^\\s*by [A-Z][a-z]+(?: [A-Z][a-z]+)*.*(\\n|$)', '', 'g')
        AS body FROM b11)
SELECT doc_id,
       CASE WHEN subject IS NOT NULL AND subject <> ''
            THEN '*' || subject || '*' ELSE '*No Subject*' END AS subject_out,
       {trimmed_body} AS body_out
FROM b12
ORDER BY doc_id
"""


EMAIL_CLEAN_CHAIN_ORACLE = _clean_chain_oracle()


# ---------------------------------------------------------------------------
# E1 chunker: documents re-wrapped to one line per 5 words, packed into
# <=120-char blocks. Lines are way under both 120 and the oversized-line
# quirk threshold, so the recursive-CTE oracle models the exact fold.

CHUNK_MAX = 120
_WRAP5 = r"(\S+ \S+ \S+ \S+ \S+) "


def _multiline_col() -> Column:
    one_line = F.regexp_replace(F.col("text"), "\n", " ")
    return F.regexp_replace(one_line, _WRAP5, "$1\n")


_MULTILINE_SQL = (
    "regexp_replace(regexp_replace(text, chr(10), ' ', 'g'), "
    r"'(\S+ \S+ \S+ \S+ \S+) ', '\1' || chr(10), 'g')"
)


def email_chunk_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 greedy chunker over multi-line bodies; posexplode keeps order."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.posexplode(
                split_into_blocks(_multiline_col(), CHUNK_MAX)
            ).alias("block_idx", "block_text"),
        )
        .select("doc_id", F.col("block_idx").cast("bigint").alias("block_idx"),
                "block_text")
        .orderBy("doc_id", "block_idx")
    )


EMAIL_CHUNK_BLOCKS_ORACLE = f"""
WITH RECURSIVE src AS (
  SELECT doc_id, {_MULTILINE_SQL} AS body FROM documents
),
lines AS (
  SELECT doc_id, i - 1 AS i, ln
  FROM (SELECT doc_id, unnest(str_split(body, chr(10))) AS ln,
               generate_subscripts(str_split(body, chr(10)), 1) AS i
        FROM src)
),
packed AS (
  SELECT doc_id, i, ln, length(ln)::BIGINT AS cur_len, 0::BIGINT AS blk
  FROM lines WHERE i = 0
  UNION ALL
  SELECT l.doc_id, l.i, l.ln,
         CASE WHEN p.cur_len + 1 + length(l.ln) > {CHUNK_MAX}
              THEN length(l.ln)::BIGINT
              ELSE p.cur_len + 1 + length(l.ln) END,
         CASE WHEN p.cur_len + 1 + length(l.ln) > {CHUNK_MAX}
              THEN p.blk + 1 ELSE p.blk END
  FROM packed p JOIN lines l ON l.doc_id = p.doc_id AND l.i = p.i + 1
)
SELECT doc_id, blk AS block_idx,
       string_agg(ln, chr(10) ORDER BY i) AS block_text
FROM packed
GROUP BY doc_id, blk
ORDER BY doc_id, block_idx
"""


# ---------------------------------------------------------------------------
# W3 hyperlinker: constructed body = heading/URL pairs, a plain line whose
# next line is a URL, an empty line followed by a URL (NOT consumed), and a
# tail line. No URL-URL adjacency → lead/lag oracle is exact.


def _w3_body_col() -> Column:
    one_line = F.regexp_replace(F.col("text"), "\n", " ")
    did = F.col("doc_id").cast("string")
    return F.concat_ws(
        "\n",
        F.concat(F.lit("Story: "), F.substring(one_line, 1, 40)),
        F.concat(F.lit("https://news.example.com/a/"), did),
        F.concat(F.lit("Commentary "), F.substring(one_line, 41, 30)),
        F.concat(F.lit("https://news.example.com/b/"), did),
        F.lit(""),
        F.concat(F.lit("https://news.example.com/c/"), did),
        F.lit("End."),
    )


_W3_BODY_SQL = (
    "'Story: ' || substr(one_line, 1, 40) || chr(10) || "
    "'https://news.example.com/a/' || doc_id::VARCHAR || chr(10) || "
    "'Commentary ' || substr(one_line, 41, 30) || chr(10) || "
    "'https://news.example.com/b/' || doc_id::VARCHAR || chr(10) || "
    "chr(10) || "
    "'https://news.example.com/c/' || doc_id::VARCHAR || chr(10) || "
    "'End.'"
)


def email_hyperlink_headings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", hyperlink_headings(_w3_body_col()).alias("hyperlinked")
    ).orderBy("doc_id")


EMAIL_HYPERLINK_ORACLE = f"""
WITH src AS (
  SELECT doc_id, {_W3_BODY_SQL} AS body
  FROM (SELECT doc_id, regexp_replace(text, chr(10), ' ', 'g') AS one_line
        FROM documents)
),
lines AS (
  SELECT doc_id, i, ln,
         lead(ln) OVER (PARTITION BY doc_id ORDER BY i) AS nxt,
         lag(ln)  OVER (PARTITION BY doc_id ORDER BY i) AS prv
  FROM (SELECT doc_id, unnest(str_split(body, chr(10))) AS ln,
               generate_subscripts(str_split(body, chr(10)), 1) AS i
        FROM src)
),
kept AS (
  SELECT doc_id, i,
         CASE WHEN ln <> '' AND nxt IS NOT NULL AND nxt <> ''
                   AND regexp_full_match(nxt, 'https?://\\S+')
                   AND length(ln) < 300
              THEN '<' || nxt || '|' || ln || '>'
              ELSE ln END AS out_ln
  FROM lines
  WHERE NOT (regexp_full_match(ln, 'https?://\\S+')
             AND prv IS NOT NULL AND prv <> '' AND length(prv) < 300
             AND NOT regexp_full_match(prv, 'https?://\\S+'))
)
SELECT doc_id, string_agg(out_ln, chr(10) ORDER BY i) AS hyperlinked
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def email_blockkit_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5/E3 — full consumer-path payload: chunk → Block Kit JSON string."""
    d = table(spark, sf_dir, "documents")
    subject = F.coalesce(
        F.when(F.col("doc_id") % 7 != 0,
               F.concat(F.lit("Tech Brief #"), F.col("doc_id").cast("string"))),
        F.lit("No Subject"),
    )
    return d.select(
        "doc_id",
        slack_blocks_payload(
            subject, split_into_blocks(_multiline_col(), CHUNK_MAX)
        ).alias("payload"),
    ).orderBy("doc_id")


EMAIL_BLOCKKIT_ORACLE = f"""
WITH RECURSIVE src AS (
  SELECT doc_id, {_MULTILINE_SQL} AS body FROM documents
),
lines AS (
  SELECT doc_id, i - 1 AS i, ln
  FROM (SELECT doc_id, unnest(str_split(body, chr(10))) AS ln,
               generate_subscripts(str_split(body, chr(10)), 1) AS i
        FROM src)
),
packed AS (
  SELECT doc_id, i, ln, length(ln)::BIGINT AS cur_len, 0::BIGINT AS blk
  FROM lines WHERE i = 0
  UNION ALL
  SELECT l.doc_id, l.i, l.ln,
         CASE WHEN p.cur_len + 1 + length(l.ln) > {CHUNK_MAX}
              THEN length(l.ln)::BIGINT
              ELSE p.cur_len + 1 + length(l.ln) END,
         CASE WHEN p.cur_len + 1 + length(l.ln) > {CHUNK_MAX}
              THEN p.blk + 1 ELSE p.blk END
  FROM packed p JOIN lines l ON l.doc_id = p.doc_id AND l.i = p.i + 1
),
chunks AS (
  SELECT doc_id, blk, string_agg(ln, chr(10) ORDER BY i) AS block
  FROM packed GROUP BY doc_id, blk
),
chunk_lists AS (
  SELECT doc_id, list(block ORDER BY blk) AS blocks FROM chunks GROUP BY doc_id
)
SELECT doc_id,
       to_json(struct_pack(blocks := list_prepend(
         struct_pack("type" := 'section',
                     "text" := struct_pack("type" := 'mrkdwn',
                       "text" := '*Subject:* ' ||
                         (CASE WHEN doc_id % 7 <> 0
                               THEN 'Tech Brief #' || doc_id::VARCHAR
                               ELSE 'No Subject' END) ||
                         chr(10) || '*Body:*')),
         list_transform(blocks, c -> struct_pack("type" := 'section',
           "text" := struct_pack("type" := 'mrkdwn', "text" := c)))
       ))) AS payload
FROM chunk_lists
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def slack_mention_prompt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18-P20 — mention strip, history-line format, prompt assembly, over
    the events stream (each event becomes a synthetic @mention)."""
    e = table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    raw = F.concat(
        F.lit("<@U"), uid, F.lit("> what happened with "),
        F.col("event_type"), F.lit("?"),
    )
    question = strip_mentions(raw)
    context = history_line(
        F.concat(F.lit("user_"), uid),
        F.concat(F.lit("last "), F.col("event_type"), F.lit(" event")),
    )
    return (
        e.filter(F.col("event_id") < 500)
        .select(
            "event_id",
            question.alias("question"),
            assemble_prompt(wrap_context_info(context), question)
            .alias("prompt"),
        )
        .orderBy("event_id")
    )


def _sql_str(s: str) -> str:
    """Byte-exact DuckDB string literal for a Python string (newlines as
    chr(10) so the oracle can't drift from the shared prompt constants)."""
    return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"


_QUESTION_SQL = r"""regexp_replace('<@U' || user_id::VARCHAR || '> what happened with ' ||
                      event_type || '?', '<@[A-Z0-9]+>', '', 'g')
         .regexp_replace('\A\s+|\s+\z', '', 'g')"""

# contextInfo wrapper (slackEventServer.js:226-230) — history is always
# non-empty in this constructed query, so the wrapper always applies.
_CONTEXT_SQL = (
    "chr(10) || chr(10) || 'Recent channel context:' || chr(10) || "
    "'user_' || user_id::VARCHAR || ': last ' || event_type || ' event'"
    " || chr(10) || chr(10)"
)

SLACK_MENTION_PROMPT_ORACLE = f"""
SELECT event_id,
       {_QUESTION_SQL} AS question,
       {_sql_str(PROMPT_PREFIX)} ||
       {_CONTEXT_SQL} ||
       '. A user asked: "' ||
       {_QUESTION_SQL} ||
       {_sql_str(PROMPT_TAIL)} AS prompt
FROM events
WHERE event_id < 500
ORDER BY event_id
"""


def slack_llm_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — the LLM enrichment stage over the assembled mention prompts,
    THROUGH the Arrow pandas UDF (`streaming/llm.py` make_llm_udf) with
    the DeterministicStubModel, whose reply is a pure string function of
    the prompt: `[<model>:<md5(prompt)[:8]>] ack: <last 120 chars>`
    truncated to max_tokens*4 chars. That purity is the point — the
    oracle reproduces the stub in SQL, so the WHOLE enrichment path
    (prompt assembly -> Arrow batch -> model callable -> reply column)
    is hash-checked by the driver, not just unit-tested. Production
    swaps the callable for the API client; the plan is identical
    (reference: slackEventServer.js:224-276)."""
    from ..streaming.llm import llm_enrich_col

    prompts = slack_mention_prompt(spark, sf_dir)
    return prompts.select(
        "event_id",
        "question",
        llm_enrich_col(F.col("prompt")).alias("reply"),
    ).orderBy("event_id")


def _llm_enrichment_oracle() -> str:
    from ..streaming.llm import _CHARS_PER_TOKEN, MAX_TOKENS, MODEL_NAME

    cap = MAX_TOKENS * _CHARS_PER_TOKEN
    return f"""
WITH p AS ({SLACK_MENTION_PROMPT_ORACLE})
SELECT event_id, question,
       substr('[{MODEL_NAME}:' || substr(md5(prompt), 1, 8) || '] ack: '
              || CASE WHEN len(prompt) > 120
                      THEN substr(prompt, len(prompt) - 119)
                      ELSE prompt END,
              1, {cap}) AS reply
FROM p
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Composed end-to-end pipelines as rows-only queries (no SQL oracle: they
# route through the P1 html-to-text pandas UDF and the D1 quoted-printable
# UDF — the driver records the weaker rows-only check, and the per-stage
# oracles above plus unit goldens carry the exact-correctness burden).


def email_producer_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full producer path (§3.1) as a batch frame: raw emails (half HTML,
    half quoted-printable text) → D1 → P1 gate → P0/P2-P16 → JSON serde."""
    from ..streaming.producer_pipeline import producer_transform

    d = table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    html_body = F.concat(
        F.lit("<html><body><p>Intro Together With X</p>"),
        F.lit("<p>TLDR daily brief</p><p><a href=\"https://x.co/"), did,
        F.lit("\">Read this now</a></p><p>"),
        F.substring(F.col("text"), 1, 120),
        F.lit("</p></body></html>"),
    )
    text_body = F.concat(
        F.lit("TLDR plain\nCaf=C3=A9 corner\n"), F.substring(F.col("text"), 1, 120)
    )
    raw = d.select(
        F.col("doc_id").alias("email_id"),
        (F.col("doc_id") % 100000).cast("int").alias("seqno"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Brief #"), did))
        .alias("subject_raw"),
        F.when(F.col("doc_id") % 2 == 0, html_body)
        .otherwise(text_body)
        .alias("body_raw"),
    )
    out = producer_transform(raw, serde="json")
    return out.select(
        "email_id", "seqno", "subject", "body",
        F.col("value").cast("string").alias("value_json"),
    ).orderBy("email_id")


def email_consumer_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full consumer path (§3.2) as a batch frame: Kafka-envelope rows →
    D4 decode → W3 → E1 → E3/D5 payload + idempotency key."""
    from ..streaming.consumer_pipeline import consumer_transform

    d = table(spark, sf_dir, "documents")
    record = F.struct(
        (F.col("doc_id") % 100000).cast("int").alias("seqno"),
        F.concat(F.lit("*Brief #"), F.col("doc_id").cast("string"), F.lit("*"))
        .alias("subject"),
        F.concat(
            F.lit("Heading for doc "), F.col("doc_id").cast("string"),
            F.lit("\nhttps://news.example.com/"), F.col("doc_id").cast("string"),
            F.lit("\n"), _multiline_col(),
        ).alias("body"),
    )
    envelope = d.select(
        F.to_json(record).cast("binary").alias("value"),
        F.lit("technews").alias("topic"),
        (F.col("doc_id") % 8).cast("int").alias("partition"),
        F.col("doc_id").alias("offset"),
    )
    return consumer_transform(envelope, serde="json").orderBy("idempotency_key")


QUERIES = [
    QuerySpec("email_clean_chain", email_clean_chain, EMAIL_CLEAN_CHAIN_ORACLE,
              "P0+P2-P16 clean chain over constructed noisy emails"),
    QuerySpec("email_chunk_blocks", email_chunk_blocks,
              EMAIL_CHUNK_BLOCKS_ORACLE,
              "E1 greedy line-packing chunker (recursive-CTE oracle)"),
    QuerySpec("email_hyperlink_headings", email_hyperlink_headings,
              EMAIL_HYPERLINK_ORACLE,
              "W3 heading/URL pairing with URL consumption"),
    QuerySpec("email_blockkit_payload", email_blockkit_payload,
              EMAIL_BLOCKKIT_ORACLE,
              "D5/E3 Slack Block Kit JSON assembly"),
    QuerySpec("slack_mention_prompt", slack_mention_prompt,
              SLACK_MENTION_PROMPT_ORACLE,
              "P18-P20 mention strip + prompt assembly"),
    QuerySpec("slack_llm_enrichment", slack_llm_enrichment,
              _llm_enrichment_oracle(),
              "U1 enrichment through the Arrow LLM UDF (stub replies "
              "reproduced in SQL — the full path hash-checked)"),
    QuerySpec("email_producer_pipeline", email_producer_pipeline, None,
              "composed §3.1 ingest path (rows-only: P1/D1 UDFs)"),
    QuerySpec("email_consumer_pipeline", email_consumer_pipeline, None,
              "composed §3.2 delivery path (rows-only: fold-heavy)"),
]
