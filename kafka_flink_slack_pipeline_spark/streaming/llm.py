"""U1 — LLM enrichment as a batched UDF with a pluggable model.

Reference: `generateClaudeResponse` assembles a prompt from history +
question + base64 images and calls the Anthropic Messages API
(`Slack Event Server/slackEventServer.js:224-276`; model and max_tokens at
`:262-263`).

Engine realization: an Arrow-batched pandas UDF whose model is a plain
`Callable[[str], str]` injected at construction:
  - production: an API-client callable (concurrent calls + retry/backoff
    live inside it, outside the engine);
  - tests/offline: DeterministicStubModel — same interface, pure function
    of the prompt, so correctness checks are reproducible (SURVEY.md §5
    "LLM determinism").

The UDF is the sanctioned slow path: one Arrow batch in, one out, no
per-row Python overhead; at 100 TB the enrichment stage is bounded by the
model backend, not Spark.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

MODEL_NAME = "claude-sonnet-4-20250514"  # slackEventServer.js:262
MAX_TOKENS = 1000  # slackEventServer.js:263
_CHARS_PER_TOKEN = 4  # crude cap used by the stub to honor max_tokens


class DeterministicStubModel:
    """Offline stand-in for the Messages API: deterministic, prompt-pure."""

    def __init__(self, name: str = MODEL_NAME, max_tokens: int = MAX_TOKENS):
        self.name = name
        self.max_tokens = max_tokens

    def __call__(self, prompt: str) -> str:
        if prompt is None:
            return None
        digest = hashlib.md5(prompt.encode("utf-8")).hexdigest()[:8]
        reply = f"[{self.name}:{digest}] ack: {prompt[-120:]}"
        return reply[: self.max_tokens * _CHARS_PER_TOKEN]


def make_llm_udf(model: Callable[[str], str] | None = None):
    """Build the enrichment UDF around any prompt→text callable."""
    mdl = model or DeterministicStubModel()

    @F.pandas_udf("string")
    def llm_enrich(prompts: pd.Series) -> pd.Series:
        return prompts.map(mdl)

    return llm_enrich


def llm_enrich_col(prompt: Column, model: Callable[[str], str] | None = None) -> Column:
    return make_llm_udf(model)(prompt)
