"""Driver-contract smoke tests: entry() runs, every queries() entry runs and
returns rows with a stable schema, and oracle keys are a subset of queries.
Full value-vs-oracle verification lives in tools/verify_local.py (run at
sf0.01); these tests keep the contract importable and runnable at sf0.001.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_queries_all_run(spark, sf_dir):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()  # must execute without error


def test_oracle_keys_subset():
    qs = set(entrymod.queries())
    oracle = set(entrymod.oracle_sql())
    assert oracle <= qs
    # every oracle is non-empty SQL
    for name, sql in entrymod.oracle_sql().items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_oracle_columns_match_spark_schema(spark, sf_dir):
    """Column-name parity, the contract invariant the driver's value-hash
    silently punishes: for every oracle-bearing query, DuckDB's DESCRIBE
    of the oracle SQL must name exactly the Spark result's columns.
    Analysis-only on both sides (no query execution)."""
    import duckdb

    from kafka_flink_slack_pipeline_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    mismatches = {}
    for name, sql in entrymod.oracle_sql().items():
        spark_cols = sorted(qs[name](spark, sf_dir).columns)
        oracle_cols = sorted(
            r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()
        )
        if spark_cols != oracle_cols:
            mismatches[name] = (spark_cols, oracle_cols)
    assert not mismatches, mismatches
