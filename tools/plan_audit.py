"""Physical-plan audit: fail if a headline query plans a scale antipattern.

Run: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.1)

For every bench headline query this builds the DataFrame, grabs the
executed plan, and checks:

  1. No CartesianProduct / BroadcastNestedLoopJoin — a nested-loop join is
     O(n*m) row work at any cluster size (the antipattern the brief bans).
  2. No row-at-a-time Python (BatchEvalPython); Python must enter plans
     only through Arrow (ArrowEvalPython / FlatMapGroupsInPandas /
     MapInPandas).
  3. Exchange SinglePartition only above a bounded-cardinality frame —
     detected structurally: the exchange's subtree must contain a
     HashAggregate or Window over a key we whitelist as bounded (score
     buckets, hash-prefix buckets, lang/source domains) or sit above a
     global single-row aggregate. Anything else funnels the corpus
     through one task.

Exit code 1 on any violation, with the offending plan excerpt printed —
wired for CI alongside verify_local. Also prints a one-line per-query
summary (exchange count, python eval nodes) so plan drift is visible in
round-over-round diffs.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Bounded-key whitelist for SinglePartition exchanges: these windows run
# over post-aggregation frames whose cardinality is fixed by construction
# (score buckets <= 11, hash-prefix buckets <= 256, lang x source <= ~15,
# vocabulary totals = 1 row).
_BOUNDED_HINTS = (
    "quality_score",
    "bucket",
    "lang",
    "source",
    "total",
)

# Deliberate BroadcastNestedLoopJoin sites — each broadcasts a frame whose
# cardinality is bounded BY CONSTRUCTION, so the "nested loop" is really a
# map-side constant/codebook attach, not O(n*m) pair work. Verified by
# reading the executed plans (build side shown):
_ALLOWED_BNLJ = {
    # the labeled exact baseline: broadcast of the 10-row query side;
    # O(|Q|*|C|) is the definition of brute force — the LSH/IVF variants
    # are the scale path
    "cosine_topk_bruteforce": "10-row query side broadcast (exact baseline)",
    # broadcast of the fixed 10-cell centroid codebook onto the corpus
    "semantic_dedup": "bounded centroid codebook broadcast",
    # broadcast of the 1-row corpus-total aggregate (constant attach)
    "doc_unigram_surprisal": "1-row corpus total broadcast",
    # broadcast of the 1-row (n, avgdl) stats aggregate (constant attach)
    "bm25_keyword_search": "1-row corpus stats broadcast",
}


def _single_partition_ok(plan: str, idx: int) -> bool:
    """A SinglePartition exchange is fine if its input is a tiny agg.

    Heuristic on the plan text: look at the ~6 lines below the exchange —
    they must contain a HashAggregate/Window whose grouping references a
    whitelisted bounded key, or an empty grouping (global single-row agg).
    """
    tail = plan[idx:].splitlines()[1:8]
    blob = "\n".join(tail)
    if "HashAggregate(keys=[], " in blob:
        return True
    return any(h in blob for h in _BOUNDED_HINTS)


def audit(sf_dir: str) -> int:
    from bench import HEADLINE
    from kafka_flink_slack_pipeline_spark.plans.registry import all_queries
    from kafka_flink_slack_pipeline_spark.session import get_spark

    spark = get_spark("plan_audit")
    specs = all_queries()
    failures = 0
    for name in HEADLINE:
        df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        problems: list[str] = []
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if bad in plan and not (
                bad == "BroadcastNestedLoopJoin" and name in _ALLOWED_BNLJ
            ):
                problems.append(f"nested-loop join: {bad}")
        if "BatchEvalPython" in plan:
            problems.append("row-at-a-time Python (BatchEvalPython)")
        for m in re.finditer(r"Exchange SinglePartition", plan):
            if not _single_partition_ok(plan, m.start()):
                excerpt = plan[m.start():].splitlines()[:6]
                problems.append(
                    "unbounded SinglePartition exchange:\n      "
                    + "\n      ".join(excerpt)
                )
        n_exchanges = plan.count("Exchange ") - plan.count("BroadcastExchange")
        n_arrow = sum(
            plan.count(k)
            for k in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
        )
        status = "FAIL" if problems else "ok"
        print(
            f"{status:4} {name}: exchanges={n_exchanges} arrow_python={n_arrow}"
        )
        for p in problems:
            print(f"    - {p}")
        failures += bool(problems)
    print(f"{failures} queries with plan violations")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"))
