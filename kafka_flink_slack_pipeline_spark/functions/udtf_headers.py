"""Python UDTF: email header block → (name, value) rows.

Generalizes D7 (the reference parses only the Subject header via
`Imap.parseHeader`, kafkaProducer.js:119) into a table function over the
whole RFC-5322 header block, with folded-header unfolding — the row-set
shape (one input row → N header rows) is what UDTFs exist for, and it
completes the engine's UDF surface (scalar UDF, pandas UDF, grouped
map/state, and table functions).

Usage:
    from pyspark.sql.functions import lit
    ParseHeaders(lit("Subject: hi\\r\\nFrom: a@b\\r\\n"))  # as a relation
    spark.udtf.register("parse_headers", ParseHeaders)
    spark.sql("SELECT h.* FROM emails, LATERAL parse_headers(raw) h")
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_HEADER_RE = re.compile(r"^([!-9;-~]+):[ \t]*(.*)$")  # RFC 5322 field-name


@udtf(returnType="name string, value string")
class ParseHeaders:
    """Yield one (name, value) row per header; folded lines unfold into
    the preceding header's value, separated by a single space."""

    def eval(self, raw: str):  # noqa: D102 — UDTF contract
        if raw is None:
            return
        current: tuple[str, list[str]] | None = None
        for line in re.split(r"\r\n|\n|\r", raw):
            if not line.strip():
                continue
            if line[:1] in (" ", "\t") and current is not None:
                current[1].append(line.strip())
                continue
            m = _HEADER_RE.match(line)
            if m:
                if current is not None:
                    yield current[0], " ".join(current[1])
                current = (m.group(1), [m.group(2).strip()])
        if current is not None:
            yield current[0], " ".join(current[1])
