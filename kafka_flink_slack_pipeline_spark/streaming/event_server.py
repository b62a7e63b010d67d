"""Interactive path (SURVEY.md §3.3): Slack events → state → LLM → reply.

Mirrors `Slack Event Server/slackEventServer.js`:
  S5 events source → F4 bot filter / F5 DM filter → ST2 thread-root
  resolution → ST1 thread registry (keyed state) → P18 mention strip →
  F6 empty guard → S6/W1/W2 history context (stream-static join) →
  P20 prompt assembly → U1 LLM UDF → K3 reply frame (→ Slack sink).

State-model upgrade (ST1): the reference keeps an unbounded in-memory
`Set` of "channel-thread_ts" keys (`slackEventServer.js:48,63`) that dies
with the process. Here the registry is `dropDuplicatesWithinWatermark`
over keyed streaming state with a watermark TTL — bounded, checkpointed,
restart-safe.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textclean import (
    assemble_prompt,
    history_line,
    strip_mentions,
    wrap_context_info,
)
from .llm import llm_enrich_col

HISTORY_LIMIT = 100  # slackEventServer.js:187,205
EMPTY_QUESTION_REPLY = (  # F6 canned reply, verbatim (slackEventServer.js:78)
    "Hi! I was mentioned but didn't see a question. How can I help you?"
)
ERROR_REPLY = (  # K4 canned apology, verbatim (slackEventServer.js:108)
    "Sorry, I encountered an error. Please try again."
)


def event_ts(ts: Column) -> Column:
    """Slack string ts ("1712345678.000200") → timestamp."""
    return ts.cast("double").cast("timestamp")


def thread_root(df: DataFrame) -> Column:
    """ST2 — `thread_ts ?? ts` (slackEventServer.js:55-61,91)."""
    return F.coalesce(F.col("thread_ts"), F.col("ts"))


def drop_bot_messages(df: DataFrame) -> DataFrame:
    """F4 — `subtype === 'bot_message' || bot_id` (slackEventServer.js:116)."""
    return df.filter(
        (F.col("subtype").isNull() | (F.col("subtype") != "bot_message"))
        & F.col("bot_id").isNull()
    )


def dms_only(df: DataFrame) -> DataFrame:
    """F5 — `channel_type === 'im'` (slackEventServer.js:121)."""
    return df.filter(F.col("channel_type") == "im")


def thread_registry_stream(
    events: DataFrame, ttl: str = "7 days"
) -> DataFrame:
    """ST1 — participating-thread registry as watermarked streaming dedup.

    One output row per newly-seen (channel, thread_root); state for a key
    is dropped once the watermark passes its event time + ttl.

    dropDuplicatesWithinWatermark, NOT plain dropDuplicates: a streaming
    dropDuplicates whose key subset omits the event-time column keeps its
    state FOREVER (the watermark only bounds lateness, not state) — the
    WithinWatermark variant is the API that actually evicts keys at
    watermark + ttl, which is the bounded-state upgrade over the
    reference's unbounded Set this operator promises."""
    return (
        events.withColumn("event_time", event_ts(F.col("ts")))
        .withColumn("thread_root", thread_root(events))
        .withWatermark("event_time", ttl)
        .dropDuplicatesWithinWatermark(["channel", "thread_root"])
        .select("channel", "thread_root", "event_time")
    )


def history_context(history: DataFrame, by_thread: bool = False) -> DataFrame:
    """S6/W1/W2 — last-100 messages per channel (or per thread), oldest
    first, formatted `user: text` and joined into one context string.

    Batch/static formulation (stream-static join target). The orderBy
    inside the aggregation is explicit — sort_array over (ts, line)
    structs — never relying on accidental row order.

    by_thread groups by the thread ROOT ts (`thread_ts ?? ts`), matching
    `conversations.replies` (slackEventServer.js:205-211) which returns the
    root message together with its replies."""
    if by_thread:
        history = history.withColumn(
            "thread_ts", F.coalesce(F.col("thread_ts"), F.col("ts"))
        )
    keys = ["channel", "thread_ts"] if by_thread else ["channel"]
    w = Window.partitionBy(*keys).orderBy(F.col("ts").cast("double").desc())
    return (
        history.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HISTORY_LIMIT)
        .withColumn("line", history_line(F.col("user"), F.col("text")))
        .groupBy(*keys)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("ts").cast("double").alias("o"),
                                     F.col("line").alias("l"))
                        )
                    ),
                    lambda s: s["l"],
                ),
                "\n",
            ).alias("context_info")
        )
    )


def attach_image_contents(
    events: DataFrame,
    fetcher: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """E2/S7/D6 — the files[] fan-out of the interactive path: explode
    `files`, keep images (F7), fetch bytes (S7 — injectable fetcher;
    deterministic stub by default since this container has no network),
    base64-encode (D6), and re-aggregate to one `image_contents` array per
    event, order-preserved by file position.

    Reference: slackEventServer.js:157-184 (fetch), :243-259 (fan-out),
    :174 (base64), :245 (mimetype gate)."""
    import hashlib

    fetch = fetcher or (
        lambda url: b"IMGBYTES:" + hashlib.md5(url.encode()).digest()
    )

    @F.pandas_udf("binary")
    def fetch_udf(urls: pd.Series) -> pd.Series:
        # Arrow-batched: one Python call per batch of URLs, not per row.
        return urls.map(lambda u: fetch(u) if u else None)

    exploded = events.select(
        "event_id",
        F.posexplode_outer(F.coalesce(F.col("files"), F.array())).alias(
            "pos", "file"
        ),
    )
    images = exploded.filter(
        F.col("file").isNotNull()
        & F.col("file")["mimetype"].startswith("image/")  # F7
    ).select(
        "event_id",
        "pos",
        F.base64(fetch_udf(F.col("file")["url_private"])).alias("b64"),  # S7+D6
        F.col("file")["mimetype"].alias("mimetype"),
    )
    packed = images.groupBy("event_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("pos", "mimetype", "b64"))
            ),
            lambda s: F.struct(
                s["mimetype"].alias("mimetype"), s["b64"].alias("data_b64")
            ),
        ).alias("image_contents")
    )
    return events.join(packed, "event_id", "left").withColumn(
        "image_contents",
        F.coalesce(F.col("image_contents"), F.array().cast(
            "array<struct<mimetype:string,data_b64:string>>"
        )),
    )


def enrich_mentions(
    events: DataFrame,
    history: DataFrame,
    model: Callable[[str], str] | None = None,
) -> DataFrame:
    """app_mention path: filters → question → context join → LLM → reply.

    Returns a reply frame (channel, thread_ts, reply_text, idempotency_key)
    ready for the Slack chat sink (K3). Works on batch and streaming
    frames alike (history is the static side of the join).

    Faithful to slackEventServer.js:
      - history is THREAD history keyed by `thread_ts || ts` — the mention
        path always passes a truthy threadTs (:86-92, :224), so
        getRecentThreadHistory is always the branch taken;
      - the reply posts with the event's RAW thread_ts (:99-101, :80):
        unthreaded when the mention wasn't in a thread (NULL here);
      - contextInfo gets the "Recent channel context:" wrapper only when
        history is non-empty (:226-229)."""
    return _mention_reply_frame(events, history, model, lambda prompt: prompt)


def _mention_reply_frame(
    events: DataFrame,
    history: DataFrame,
    model: Callable[[str], str] | None,
    to_model_input: Callable[[Column], Column],
) -> DataFrame:
    """Shared mention-path skeleton; `to_model_input` maps the assembled
    prompt column to whatever the model callable consumes (bare prompt or
    JSON content array)."""
    mentions = drop_bot_messages(
        events.filter(F.col("type") == "app_mention")
    ).withColumn("thread_root", thread_root(events))
    question = strip_mentions(F.col("text"))  # P18
    has_files = F.size(F.coalesce(F.col("files"), F.array())) > 0
    # thread-keyed context; one bounded row per thread, but thread count is
    # unbounded at scale — shuffle equi-join (AQE may still broadcast).
    ctx = history_context(history, by_thread=True).withColumnRenamed(
        "thread_ts", "thread_root"
    )
    joined = (
        mentions.withColumn("question", question)
        .join(ctx, ["channel", "thread_root"], "left")
        .withColumn("context_info", F.coalesce(F.col("context_info"), F.lit("")))
    )
    prompt = assemble_prompt(  # P20 (:233-240)
        wrap_context_info(F.col("context_info")), F.col("question")
    )
    reply = F.when(
        (F.col("question") == "") & ~has_files,  # F6 empty guard (:75-82)
        F.lit(EMPTY_QUESTION_REPLY),
    ).otherwise(
        F.coalesce(  # U1/K4
            llm_enrich_col(to_model_input(prompt), model), F.lit(ERROR_REPLY)
        )
    )
    return joined.select(
        "channel",
        F.col("thread_ts"),  # RAW event thread_ts (K3 :99-101) — may be NULL
        reply.alias("reply_text"),
        F.md5(F.concat_ws("/", F.col("channel"), F.col("ts"))).alias(
            "idempotency_key"
        ),
    )


_SOURCE_SCHEMA = "struct<type:string,media_type:string,data:string>"


def content_blocks(prompt: Column, image_contents: Column) -> Column:
    """Anthropic-style content array as JSON: one text block followed by a
    base64 image block per attached image (slackEventServer.js:231-258).

    One struct schema covers both block kinds with NULL unused fields;
    to_json drops NULLs, so the wire shape is exactly
    `[{"type":"text","text":...},{"type":"image","source":{"type":
    "base64","media_type":...,"data":...}}]`."""
    text_block = F.struct(
        F.lit("text").alias("type"),
        prompt.alias("text"),
        F.lit(None).cast(_SOURCE_SCHEMA).alias("source"),
    )
    image_blocks = F.transform(
        F.coalesce(
            image_contents,
            F.array().cast("array<struct<mimetype:string,data_b64:string>>"),
        ),
        lambda ic: F.struct(
            F.lit("image").alias("type"),
            F.lit(None).cast("string").alias("text"),
            F.struct(
                F.lit("base64").alias("type"),
                ic["mimetype"].alias("media_type"),
                ic["data_b64"].alias("data"),
            ).alias("source"),
        ),
    )
    return F.to_json(F.concat(F.array(text_block), image_blocks))


def enrich_mentions_multimodal(
    events: DataFrame,
    history: DataFrame,
    model: Callable[[str], str] | None = None,
    fetcher: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """Mention path with full content-array parity: files[] fan-out →
    image fetch + base64 (E2/S7/D6) → text + image blocks into the model
    (slackEventServer.js:241-258). The model callable receives the
    JSON-encoded content array instead of the bare prompt string."""
    return _mention_reply_frame(
        attach_image_contents(events, fetcher),
        history,
        model,
        lambda prompt: content_blocks(prompt, F.col("image_contents")),
    )


def reply_payload(reply: DataFrame) -> DataFrame:
    """K3 — reply frame → chat.postMessage JSON body + idempotency key.

    `to_json` omits NULL fields, so an unthreaded reply's POST body has no
    `thread_ts` key at all — matching the JS client, where an undefined
    `thread_ts` is absent from the request (slackEventServer.js:97-101,
    :138-141)."""
    return reply.select(
        F.to_json(
            F.struct(
                F.col("channel"),
                F.col("reply_text").alias("text"),
                F.col("thread_ts"),
            )
        ).alias("payload"),
        "idempotency_key",
    )


def run_event_server_stream(
    events_stream: DataFrame,
    history: DataFrame,
    sink,
    checkpoint_dir: str,
    model: Callable[[str], str] | None = None,
    trigger: dict | None = None,
):
    """§3.3 end-to-end: streaming events → enrich_mentions (stream-static
    history join) → chat payload → foreachBatch Slack sink."""
    frame = reply_payload(enrich_mentions(events_stream, history, model))
    return sink.attach(
        frame, checkpoint_dir, trigger or {"availableNow": True}
    )


def run_dm_server_stream(
    events_stream: DataFrame,
    history: DataFrame,
    sink,
    checkpoint_dir: str,
    model: Callable[[str], str] | None = None,
    trigger: dict | None = None,
):
    """DM half of §3.3 as a stream (slackEventServer.js:114-149): message
    events → enrich_dms → unthreaded chat payload → foreachBatch sink."""
    frame = reply_payload(enrich_dms(events_stream, history, model))
    return sink.attach(
        frame, checkpoint_dir, trigger or {"availableNow": True}
    )


def enrich_dms(
    events: DataFrame,
    history: DataFrame,
    model: Callable[[str], str] | None = None,
) -> DataFrame:
    """DM path (slackEventServer.js:114-149): F4 bot filter → F5 `channel_type
    === 'im'` gate → CHANNEL history (no thread_ts is passed to
    generateClaudeResponse, so getRecentChannelHistory is the branch taken)
    → prompt → LLM → UNTHREADED reply (postMessage without thread_ts, :138-141).

    The DM path has no mention strip and no empty-question guard — event.text
    goes into the prompt as-is (:125)."""
    dms = dms_only(drop_bot_messages(events.filter(F.col("type") == "message")))
    ctx = history_context(history, by_thread=False)
    joined = dms.join(ctx, "channel", "left").withColumn(
        "context_info", F.coalesce(F.col("context_info"), F.lit(""))
    )
    prompt = assemble_prompt(
        wrap_context_info(F.col("context_info")), F.col("text")
    )
    reply = F.coalesce(llm_enrich_col(prompt, model), F.lit(ERROR_REPLY))
    return joined.select(
        "channel",
        F.lit(None).cast("string").alias("thread_ts"),  # unthreaded (:138-141)
        reply.alias("reply_text"),
        F.md5(F.concat_ws("/", F.col("channel"), F.col("ts"))).alias(
            "idempotency_key"
        ),
    )
