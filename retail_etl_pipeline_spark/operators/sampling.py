"""Deterministic distributed sampling: weighted priority sampling.

Training-mix construction needs reproducible samples ("pick ~k docs per
source, weighted by length") that do not depend on partitioning, task
order, or engine. ``rand()`` fails all three. Priority sampling
(Duffield-Lund-Thorup, JACM 2007) makes the sample a *pure projection*:

    u(i) = ((id * MIX) % MOD) + 1          -- pseudo-uniform in [1, MOD]
    q(i) = (w(i) * MOD) // u(i)            -- priority ~ w/u, integer

and the weighted sample of size k per group is simply the top-k rows by
priority — a bounded per-group window, shuffled once on the group key.
Every quantity is integer arithmetic on the row's own columns, so the
sample is identical on any engine/partitioning (SURVEY.md §5 parity
contract) and between runs — the property that makes samples
cache-safe and diffable across pipeline versions.

Scale notes: the hash multiply is done in DECIMAL(38,0) — a corpus-scale
id times the 32-bit mixing constant overflows BIGINT (the same
hypothesis-caught overflow as operators/corpus.py:380). The per-group
top-k is a rank window over a real partition key (never a global
ORDER BY — SCALE.md), and Spark pushes the rank filter below the shuffle
as WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MIX = 2246822519  # xxhash32 prime-2; decorrelated from corpus_split's MIX
MOD = 2**32


def uniform_hash(id_col: Column) -> Column:
    """Pseudo-uniform integer in [1, MOD] from the row id (bit-exact on
    any engine: decimal multiply, modulo, +1)."""
    return ((id_col.cast("decimal(38,0)") * MIX) % MOD + 1).cast("bigint")


def uniform_hash_sql(id_col: str) -> str:
    return f"CAST((CAST({id_col} AS HUGEINT) * {MIX}) % {MOD} + 1 AS BIGINT)"


def priority_sql(id_col: str, weight: str) -> str:
    """DuckDB twin of the priority: integer `//` on BIGINTs is exact
    integer division, matching Spark's `div`."""
    return (
        f"GREATEST(COALESCE(CAST({weight} AS BIGINT), 0), 0) * {MOD}"
        f" // {uniform_hash_sql(id_col)}"
    )


def sample_per_group(
    df: DataFrame, group: str, id_col: str, weight: str, k: int
) -> DataFrame:
    """Top-k weighted priority sample per group; deterministic tie-break
    on the id. Returns the input columns plus (priority, sample_rank).

    NULL/negative weights coalesce to 0 — never sampled ahead of any
    positively-weighted row, never poisoning the top-k. Spark's `div`
    on BIGINT is exact integer division (`//` on the DuckDB side)."""
    staged = df.withColumn("_u", uniform_hash(F.col(id_col))).withColumn(
        "_w",
        F.greatest(F.coalesce(F.col(weight).cast("bigint"), F.lit(0)), F.lit(0)),
    )
    staged = staged.withColumn(
        "priority", F.expr(f"(_w * {MOD}) div _u")
    ).drop("_u", "_w")
    w = Window.partitionBy(group).orderBy(F.desc("priority"), F.asc(id_col))
    return staged.withColumn("sample_rank", F.row_number().over(w)).where(
        F.col("sample_rank") <= k
    )
