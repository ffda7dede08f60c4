"""Money/ratio expression helpers (SURVEY.md §2.5 A12, §2.9 Q7)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(c: Column) -> Column:
    """Presentation rounding applied to every money aggregate in the
    reference (``Data Transformation.py:63-66,88,94,135,151``).

    Routed through DECIMAL(30,6): double -> decimal -> round(2) -> double.
    ``round(double, 2)`` directly is NOT cross-engine-stable — on exact
    .xx5 ties (common for ratios of exact measures, e.g. 0.25/50) Java's
    shortest-string HALF_UP rounding and DuckDB's multiply-rint rounding
    disagree by a full cent. The decimal hop makes the tie-break exact and
    identical in both engines (oracle SQL: :data:`MONEY_SQL`)."""
    return F.round(c.cast("decimal(30,6)"), 2).cast("double")


def safe_div(num: Column, denom: Column) -> Column:
    """NULL on zero denominator — Spark's non-ANSI divide semantics, made
    explicit so the DuckDB oracle (``x / NULLIF(y, 0)``) matches exactly
    (SURVEY.md §2.9 Q7)."""
    return num / F.nullif(denom, F.lit(0))


def decimal_sum(c: Column) -> Column:
    """Sum a money measure exactly: cast each addend to DECIMAL first.

    Double sums depend on accumulation order — Spark's partition order and
    DuckDB's scan order differ, so two correct engines disagree in the last
    bits and a subsequent round(x, 2) can flip a cent (observed at sf0.001).
    Decimal addition is exact and order-independent, so both engines produce
    the IDENTICAL sum; cast back to double for the output schema.

    Scale note: Spark sums decimals in unsafe long/int128 arithmetic —
    still whole-stage-codegen, no Python involved; the cost over a double
    sum is small and buys bit-stable results on any cluster size/ordering.
    """
    return F.sum(c.cast("decimal(30,6)")).cast("double")


def money_sum(c: Column) -> Column:
    """The standard money aggregate: exact decimal sum, rounded to cents
    IN DECIMAL (exact, engine-agnostic), then cast to double.

    Rounding the double instead is unsafe: exact sums frequently land
    precisely on a .xx5 tie, where Java's shortest-string rounding and
    DuckDB's scale-multiply rounding disagree by a full cent.
    """
    return F.round(F.sum(c.cast("decimal(30,6)")), 2).cast("double")


#: DuckDB fragments equivalent to the above — keep in sync.
MONEY_SQL = "CAST(round(CAST({x} AS DECIMAL(30,6)), 2) AS DOUBLE)"
DECIMAL_SUM_SQL = "CAST(SUM(CAST({x} AS DECIMAL(30,6))) AS DOUBLE)"
MONEY_SUM_SQL = "CAST(round(SUM(CAST({x} AS DECIMAL(30,6))), 2) AS DOUBLE)"
