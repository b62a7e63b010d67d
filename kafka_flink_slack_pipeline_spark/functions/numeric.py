"""Cross-engine-deterministic numeric aggregation helpers.

Why this exists: double-precision SUM is order-dependent, and Spark's
partial aggregation order varies with partitioning while DuckDB's varies
with its own morsel scheduling — so `round(sum(double), 2)` can flip the
last ulp across engines (or across Spark configs!) whenever a group's sum
lands near a rounding boundary. The driver's oracle compare is exact, so
every money aggregate must be computed EXACTLY:

  money_sum  — cast the summand to an exact DECIMAL (2-decimal inputs are
               exact at scale 2; a product of two 2-dp values at scale 4;
               of three at scale 6 — the double approximation is within
               1e-10 of the true decimal grid point, so the cast recovers
               it exactly), sum (decimal addition is associative), round
               (ties are exact decimal .5s: HALF_UP in Spark == half-away
               in DuckDB for positive values), then cast to double for a
               stable output repr.

  exact_avg  — decimal sum cast to double, divided by the bigint count:
               both engines then perform the IDENTICAL IEEE-754 division,
               so the result is bit-identical and must be emitted
               UNROUNDED (rounding an arbitrary double reintroduces
               divergence: Spark rounds the shortest decimal repr HALF_UP,
               DuckDB rounds the binary value).

The matching DuckDB oracle spellings:
  money_sum:  round(sum((expr)::DECIMAL(18,s)), r)::DOUBLE
  exact_avg:  sum((expr)::DECIMAL(18,s))::DOUBLE / count(*)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(expr: Column, scale: int = 2, round_to: int = 2) -> Column:
    """Exact decimal sum of a fixed-point-valued expression → rounded double."""
    return F.round(F.sum(expr.cast(f"decimal(18,{scale})")), round_to).cast(
        "double"
    )


def exact_avg(expr: Column, scale: int = 2) -> Column:
    """Exact decimal sum / count as one IEEE division; emit UNROUNDED."""
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double") / F.count(
        F.lit(1)
    )
