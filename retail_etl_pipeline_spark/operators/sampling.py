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
#: weights clamp here so priority = w * MOD // u fits BIGINT even at u=1.
WEIGHT_CAP = 2**31 - 1


def uniform_hash(id_col: Column) -> Column:
    """Pseudo-uniform integer in [1, MOD] from the row id (bit-exact on
    any engine: decimal multiply, modulo, +1)."""
    return ((id_col.cast("decimal(38,0)") * MIX) % MOD + 1).cast("bigint")


def uniform_hash_sql(id_col: str) -> str:
    return f"CAST((CAST({id_col} AS HUGEINT) * {MIX}) % {MOD} + 1 AS BIGINT)"


def priority_sql(id_col: str, weight: str) -> str:
    """DuckDB twin of the priority: integer `//` on BIGINTs is exact
    integer division, matching Spark's `div`; the same WEIGHT_CAP clamp
    keeps the product in-range."""
    return (
        f"LEAST(GREATEST(COALESCE(CAST({weight} AS BIGINT), 0), 0),"
        f" {WEIGHT_CAP}) * {MOD}"
        f" // {uniform_hash_sql(id_col)}"
    )


def sample_per_group(
    df: DataFrame, group: str, id_col: str, weight: str, k: int
) -> DataFrame:
    """Top-k weighted priority sample per group; deterministic tie-break
    on the id. Returns the input columns plus (priority, sample_rank).

    NULL/negative weights coalesce to 0 — never sampled ahead of any
    positively-weighted row, never poisoning the top-k. Weights clamp at
    2^31-1 so w * MOD stays inside BIGINT for ANY u (ANSI mode would
    otherwise throw ARITHMETIC_OVERFLOW on a >=2 GiB document sampled by
    byte count); above the clamp, relative order among such giants falls
    back to the tie-break — acceptable for a size-weighted sample, and
    stated here. Spark's `div` on BIGINT is exact integer division
    (`//` on the DuckDB side)."""
    staged = df.withColumn("_u", uniform_hash(F.col(id_col))).withColumn(
        "_w",
        F.least(
            F.greatest(
                F.coalesce(F.col(weight).cast("bigint"), F.lit(0)), F.lit(0)
            ),
            F.lit(WEIGHT_CAP),
        ),
    )
    staged = staged.withColumn(
        "priority", F.expr(f"(_w * {MOD}) div _u")
    ).drop("_u", "_w")
    w = Window.partitionBy(group).orderBy(F.desc("priority"), F.asc(id_col))
    return staged.withColumn("sample_rank", F.row_number().over(w)).where(
        F.col("sample_rank") <= k
    )


# ---------------------------------------------------------------------------
# Weighted reservoir sampling, A-Res form (Efraimidis-Spirakis, IPL 2006)
# ---------------------------------------------------------------------------

#: A-Res key scale: keys are rounded IN DECIMAL at this many places so
#: the cross-engine ordering is decided on identical decimal values
#: (ln() is not formally correctly-rounded everywhere; a disagreement
#: would need a key within ~1e-16 of a 1e-12 rounding tie — the same
#: accepted class as corpus_drift_psi, documented there).
ARES_KEY_SCALE = 12

_ARES_KEY_EXPR = (
    "CAST(round(CAST(ln(CAST(_u AS DOUBLE) / {mod}) / _w"
    " AS DECIMAL(38,18)), {scale}) AS DECIMAL(38,{scale}))"
)


def ares_sample_per_group(
    df: DataFrame, group: str, id_col: str, weight: str, k: int
) -> DataFrame:
    """Top-k per group by the A-Res key ln(u)/w (monotone twin of the
    textbook u^(1/w) — same ordering, better conditioning), u derived
    from the deterministic row hash. The Duffield priority sample above
    favors heavy rows MORE aggressively (inclusion ~ min(1, w/tau));
    A-Res is the exact weighted-without-replacement distribution
    (inclusion of round 1 ~ w_i / sum w) — keeping both as twins lets a
    training-mix builder choose the bias it wants. Weights clamp to
    [1, WEIGHT_CAP]: zero/NULL weights still draw (weight floor 1), and
    the key stays finite. Deterministic tie-break on the id."""
    staged = (
        df.withColumn("_u", uniform_hash(F.col(id_col)))
        .withColumn(
            "_w",
            F.least(
                F.greatest(
                    F.coalesce(F.col(weight).cast("bigint"), F.lit(1)),
                    F.lit(1),
                ),
                F.lit(WEIGHT_CAP),
            ),
        )
        .withColumn(
            "ares_key",
            F.expr(
                _ARES_KEY_EXPR.format(mod=MOD, scale=ARES_KEY_SCALE)
            ),
        )
        .drop("_u", "_w")
    )
    w = Window.partitionBy(group).orderBy(
        F.desc("ares_key"), F.asc(id_col)
    )
    return (
        staged.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .drop("ares_key")
    )


def ares_key_sql(id_col: str, weight: str) -> str:
    """DuckDB twin of the A-Res key (same hash, clamp, decimal round)."""
    u = uniform_hash_sql(id_col)
    w = (
        f"LEAST(GREATEST(COALESCE(CAST({weight} AS BIGINT), 1), 1),"
        f" {WEIGHT_CAP})"
    )
    return (
        f"CAST(round(CAST(ln(CAST({u} AS DOUBLE) / {MOD}) / {w}"
        f" AS DECIMAL(38,18)), {ARES_KEY_SCALE})"
        f" AS DECIMAL(38,{ARES_KEY_SCALE}))"
    )
