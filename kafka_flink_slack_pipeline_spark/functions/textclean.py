"""Email body cleaning chain (reference parity: P0-P17).

Re-expresses the per-record string pipeline of
`/root/reference/Producer/kafkaProducer.js:118-201` as composable Spark
Column expressions — all JVM-side regexp_replace / transform, zero Python
UDFs — so at 100 TB the whole chain stays inside one WholeStageCodegen
span (narrow, embarrassingly parallel, fused with the scan).

Dialect notes (JS RegExp → Java regex):
  - JS `replace(re, ..)` without /g replaces the FIRST match; Spark's
    regexp_replace replaces ALL. Where the reference omits /g (P2) we
    anchor with \\A so only one match can exist.
  - JS `.trim()` trims all whitespace; Spark's F.trim only trims spaces —
    js_trim() below matches JS.
  - P3/P4/P5 trim ONLY when their marker matched (the trim sits inside the
    `if` in the reference) — reproduced with conditional `when`.
  - P12's callback replacement (`m => '*'+m.trim()+'*'`) can't be done by
    regexp_replace; we split lines and use transform() (still JVM-side).

Each stage cites its reference line.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def js_trim(c: Column) -> Column:
    """JS String.prototype.trim for ASCII content (post-P11 text is ASCII)."""
    return F.regexp_replace(c, r"\A\s+|\s+\z", "")


def format_subject(subject: Column) -> Column:
    """P0 — `*${subject}*` or `*No Subject*` (kafkaProducer.js:118-124)."""
    return F.when(
        subject.isNotNull() & (subject != ""), F.concat(F.lit("*"), subject, F.lit("*"))
    ).otherwise(F.lit("*No Subject*"))


def strip_together_with(body: Column) -> Column:
    """P2 — drop everything through the first 'Together With' line
    (kafkaProducer.js:162-163; JS has no /g → \\A-anchored single match)."""
    return F.regexp_replace(body, r"(?i)\A[\s\S]*?Together With[^\n]*\n?", "")


def trim_to_tldr_start(body: Column) -> Column:
    """P3 — keep from the first line starting with TLDR, then trim; no-op
    (and NO trim) when absent (kafkaProducer.js:166-170)."""
    has = body.rlike("(?im)^TLDR")
    return F.when(
        has, js_trim(F.regexp_replace(body, r"(?im)\A[\s\S]*?(?=^TLDR)", ""))
    ).otherwise(body)


def truncate_at_tldr_end(body: Column) -> Column:
    """P4 — cut at 'Love TLDR? Tell your friends...' (exclusive) + trim;
    trim only on match (kafkaProducer.js:173-176)."""
    pat = r"Love TLDR\? Tell your friends and get rewards!"
    return F.when(
        body.rlike(pat),
        js_trim(F.regexp_replace(body, pat + r"[\s\S]*", "")),
    ).otherwise(body)


def truncate_at_feedback(body: Column) -> Column:
    """P5 — cut at 'how did we do today' (case-insens., inclusive) + trim
    (kafkaProducer.js:179-181)."""
    return F.when(
        body.rlike("(?i)how did we do today"),
        js_trim(F.regexp_replace(body, r"(?i)how did we do today[\s\S]*", "")),
    ).otherwise(body)


def strip_mime_noise(body: Column) -> Column:
    """P6-P8 — Content-Type / Content-Transfer-Encoding / boundary lines
    (kafkaProducer.js:185-187)."""
    body = F.regexp_replace(body, r"Content-Type:.*?(\r\n|\n|\r)+", "")
    body = F.regexp_replace(body, r"Content-Transfer-Encoding:.*?(\r\n|\n|\r)+", "")
    return F.regexp_replace(body, r"--.*?(\r\n|\n|\r)+", "")


def normalize_linebreaks(body: Column) -> Column:
    """P9 (kafkaProducer.js:188)."""
    return F.regexp_replace(body, r"(\r\n|\n|\r)+", "\n")


def strip_html_tags(body: Column) -> Column:
    """P10 (kafkaProducer.js:189) — faithful: also eats Slack links."""
    return F.regexp_replace(body, r"<[^>]+>", "")


def strip_non_ascii(body: Column) -> Column:
    """P11 (kafkaProducer.js:190)."""
    return F.regexp_replace(body, r"[^\x20-\x7E\n]", "")


def bold_caps_headings(body: Column) -> Column:
    """P12 — `/^(?:[A-Z0-9 &]+)$/gm` → `*${match.trim()}*`
    (kafkaProducer.js:191). Callback-trim → per-line transform()."""
    lines = F.split(body, "\n", -1)
    bolded = F.transform(
        lines,
        lambda ln: F.when(
            ln.rlike(r"\A[A-Z0-9 &]+\z"),
            F.concat(F.lit("*"), js_trim(ln), F.lit("*")),
        ).otherwise(ln),
    )
    return F.array_join(bolded, "\n")


def strip_stray_brackets(body: Column) -> Column:
    """P13 — `/^\\[|\\]$/gm`: a LEADING '[' or a TRAILING ']' per line
    (alternation, not a both-ends pair) (kafkaProducer.js:192)."""
    return F.regexp_replace(body, r"(?m)^\[|\]$", "")


def strip_image_urls(body: Column) -> Column:
    """P14 (kafkaProducer.js:193)."""
    return F.regexp_replace(body, r"(?i)https?://\S+\.(png|jpg|jpeg|gif|svg)", "")


def strip_bylines(body: Column) -> Column:
    """P15 — `/^\\s*by [A-Z][a-z]+(?: [A-Z][a-z]+)*.*(\n|$)/gim`
    (kafkaProducer.js:194). The /i flag makes the letter classes
    case-insensitive — faithful."""
    return F.regexp_replace(
        body, r"(?im)^\s*by [A-Z][a-z]+(?: [A-Z][a-z]+)*.*(\n|$)", ""
    )


def clean_body(body: Column) -> Column:
    """Full P2→P16 chain in reference order (kafkaProducer.js:160-197).

    The HTML branch (P1, kafkaProducer.js:131-159) is separate — see
    html_to_text_udf in functions/html_text.py; compose as:
        clean_body(when(is_html, html_udf(body)).otherwise(body))
    """
    body = strip_together_with(body)
    body = trim_to_tldr_start(body)
    body = truncate_at_tldr_end(body)
    body = truncate_at_feedback(body)
    body = strip_mime_noise(body)
    body = normalize_linebreaks(body)
    body = strip_html_tags(body)
    body = strip_non_ascii(body)
    body = bold_caps_headings(body)
    body = strip_stray_brackets(body)
    body = strip_image_urls(body)
    body = strip_bylines(body)
    return js_trim(body)  # P16 (kafkaProducer.js:197)


def is_html(body: Column) -> Column:
    """F3 — HTML gate (kafkaProducer.js:131)."""
    return body.contains("<html") | body.contains("<body")


def strip_mentions(text: Column) -> Column:
    """P18 — remove `<@U...>` mentions then trim (slackEventServer.js:70-71)."""
    return js_trim(F.regexp_replace(text, "<@[A-Z0-9]+>", ""))


def history_line(user: Column, text: Column) -> Column:
    """P19 — `${msg.user}: ${msg.text}` (slackEventServer.js:196,215)."""
    return F.concat(user, F.lit(": "), text)


# P20 — the enrichment prompt template, byte-exact to the JS template
# literal (slackEventServer.js:233-240) including its trailing space after
# the question and the 6-space indentation the backtick literal preserves.
PROMPT_PREFIX = (
    "You are May's Slack Agent, an AI assistant helping users in a "
    "Slack workspace. Here's the context: "
)
PROMPT_TAIL = (
    '". \n'
    "      You should respond in a helpful, direct, and concise manner."
    " Search the web for the latest information if needed.\n"
    "      Also ensure you follow Slack's markup formatting shown here:"
    " 1. bold - Surround text with asterisks: \n"
    "      *your text* 2.Italicize - Surround text with underscores:"
    " _your text_ 3. Hyperlink - Use <URL|text> format for links."
    " 4. block quote - Add an angled bracket in front of text:\n"
    "      >your text"
)


def wrap_context_info(history: Column) -> Column:
    """The `contextInfo` wrapper (slackEventServer.js:226-230): empty when
    there is no history, else `\\n\\nRecent channel context:\\n{history}\\n\\n`."""
    return F.when(history.isNull() | (history == ""), F.lit("")).otherwise(
        F.concat(
            F.lit("\n\nRecent channel context:\n"), history, F.lit("\n\n")
        )
    )


def assemble_prompt(context_info: Column, user_message: Column) -> Column:
    """P20 — prompt assembly (slackEventServer.js:233-240). `context_info`
    is the already-wrapped contextInfo (see wrap_context_info)."""
    return F.concat(
        F.lit(PROMPT_PREFIX),
        context_info,
        F.lit('. A user asked: "'),
        user_message,
        F.lit(PROMPT_TAIL),
    )
