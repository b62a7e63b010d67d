"""Property-based differential tests (hypothesis).

Each test compares a Spark operator against a transparent Python mirror
of the reference semantics on randomized inputs — the operators under
test are sequential folds / iterative algorithms whose edge cases
(oversized first lines, empty blocks, multi-component graphs) are easy
to miss with hand-picked fixtures. One Spark job per hypothesis example,
examples kept small and few to bound wall-clock.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# --- E1 chunker: JS splitIntoBlocks mirror (Consumer/kafkaConsumer.js:74-90)
def _js_split_into_blocks(text: str, max_len: int) -> list[str]:
    current, blocks = "", []
    for line in text.split("\n"):
        if len(current) + 1 + len(line) > max_len:
            blocks.append(current)  # quirk: may push an EMPTY first block
            current = line
        else:
            current = line if current == "" else current + "\n" + line
    if current:  # quirk: trailing empty current dropped
        blocks.append(current)
    return blocks


_line = st.one_of(
    st.text(alphabet="ab c", max_size=12),
    st.text(alphabet="xy", min_size=25, max_size=40),  # oversized vs cap 30
)
_doc = st.lists(_line, min_size=0, max_size=8)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_doc, min_size=1, max_size=24))
def test_chunker_matches_js_fold(spark, docs):
    """split_into_blocks == the JS fold for arbitrary line mixes, at a
    small cap (30) so overflow paths trigger constantly."""
    from kafka_flink_slack_pipeline_spark.functions.chunking import (
        split_into_blocks,
    )

    cap = 30
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, body string")
    got = {
        r.doc_id: r.blocks
        for r in df.select(
            "doc_id", split_into_blocks(F.col("body"), cap).alias("blocks")
        ).collect()
    }
    for i, (_, body) in enumerate(rows):
        assert got[i] == _js_split_into_blocks(body, cap), body


# --- connected components vs union-find ---------------------------------
def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


_edge = st.tuples(
    st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=20)
).filter(lambda e: e[0] != e[1])


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_edge, min_size=1, max_size=30))
def test_connected_components_matches_union_find(spark, edges):
    """Iterative min-label propagation reaches the same fixpoint as
    union-find on arbitrary graphs (chains, cliques, self-overlaps)."""
    from kafka_flink_slack_pipeline_spark.operators.dedup import (
        connected_components,
    )

    norm = [(min(a, b), max(a, b)) for a, b in edges]
    df = spark.createDataFrame(norm, "doc_a bigint, doc_b bigint")
    got = {r.doc_id: r.label for r in connected_components(df).collect()}
    assert got == _uf_components(norm)


# --- prefix-filter theorem: the PPJoin-style exact join must equal the
# naive inverted-index threshold join on ARBITRARY corpora, not just the
# fixtures — tiny 4-token vocab + short docs make near-threshold pairs,
# stop-shingles, empty-shingle docs, and exact duplicates all common.
_pj_tok = st.sampled_from(["a", "b", "c", "d"])
_pj_doc = st.lists(_pj_tok, min_size=0, max_size=8)
_pj_counter = [0]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        # tmp_path is shared across examples by design — each example
        # writes to its own counter-numbered subdirectory
        HealthCheck.function_scoped_fixture,
    ],
)
@given(st.lists(_pj_doc, min_size=2, max_size=10))
def test_prefix_join_equals_naive_on_random_corpora(spark, tmp_path, docs):
    from kafka_flink_slack_pipeline_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_ngram_prefix_join,
    )

    _pj_counter[0] += 1
    d = tmp_path / f"corpus{_pj_counter[0]}"
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(d / "documents.parquet")
    )
    naive = dedup_ngram_jaccard(spark, str(d)).collect()
    pruned = dedup_ngram_prefix_join(spark, str(d)).collect()
    assert naive == pruned
