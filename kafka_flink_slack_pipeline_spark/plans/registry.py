"""Query registry — the single source of truth for the driver contract.

Every implemented operator (SURVEY.md §2 + north-star extensions) registers
a `QuerySpec`: a PySpark implementation `(spark, sf_dir) -> DataFrame` and,
when SQL-expressible, a DuckDB oracle SQL string computing the same result
on the same parquet tables. `__spark_entry__.py` flattens this registry
into `queries()` / `oracle_sql()`.

Contract invariants (enforced by tools/verify_local.py):
  - column names identical between Spark result and oracle (driver sorts
    columns by name before value-hashing);
  - float columns rounded IN-QUERY on both sides (engines disagree in the
    last ulps of big float aggregations; rounding makes hashes stable);
  - date/timestamp outputs formatted to strings in-query on both sides
    (repr differs between engines);
  - deterministic output: every LIMIT/top-k has a total tie-break order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None when not SQL-expressible
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    """Collect QuerySpecs from every operator module (import-light)."""
    from ..operators import (
        dedup,
        emailpipe,
        multimodal,
        relational,
        relational2,
        similarity,
        skew,
        temporal,
        textops,
        windows,
    )

    specs: dict[str, QuerySpec] = {}
    for mod in (relational, relational2, windows, temporal, textops, dedup,
                similarity, multimodal, emailpipe, skew):
        for spec in mod.QUERIES:
            if spec.name in specs:
                raise ValueError(f"duplicate query name {spec.name!r}")
            specs[spec.name] = spec
    return specs
