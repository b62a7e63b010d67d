"""CLI runner: execute, show, or explain any registered query.

    python -m kafka_flink_slack_pipeline_spark --list
    python -m kafka_flink_slack_pipeline_spark q1_pricing_summary
    python -m kafka_flink_slack_pipeline_spark dedup_minhash_lsh \
        --sf-dir /root/testdata/sf0.1 --limit 10 --explain

Runs on the same session factory as bench/tests (local[$SPARK_GRAFT_CPUS],
AQE on); `--explain` prints the formatted physical plan instead of rows —
the same surface tools/plan_audit.py checks mechanically.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m kafka_flink_slack_pipeline_spark",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument(
        "--sf-dir",
        default=None,
        help="testdata directory (default: $SPARK_GRAFT_SF_DIR or sf0.1)",
    )
    ap.add_argument("--limit", type=int, default=20,
                    help="rows to show (default 20)")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan, don't execute")
    ap.add_argument("--list", action="store_true",
                    help="list registered queries and exit")
    args = ap.parse_args(argv)

    from .plans.registry import all_queries

    specs = all_queries()
    if args.list or not args.query:
        width = max(len(n) for n in specs)
        for name, spec in specs.items():
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:{width}}  [{oracle}] {spec.doc}")
        return 0
    if args.query not in specs:
        import difflib

        close = difflib.get_close_matches(args.query, specs, n=3)
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        print(f"unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2

    from .session import get_spark
    from .tables import DEFAULT_SF_DIR

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark(f"run_{args.query}")
    df = specs[args.query].fn(spark, sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    t0 = time.time()
    df.show(args.limit, truncate=40)
    n = df.count()
    print(f"{n} rows total ({time.time() - t0:.2f}s) at {sf_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
