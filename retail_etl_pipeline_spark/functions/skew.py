"""Skew mitigation (SURVEY.md §7 phase 5 / 100 TB hygiene).

AQE's skew-join splitting handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory); these
utilities cover the two cases AQE does not:

- :func:`salted_agg` — a single hot GROUP BY key that overwhelms one
  reducer. Two-phase: partial-aggregate on (key, salt), then merge partials
  on key. Works for any algebraic aggregate (sum/count/min/max and
  compositions like max_by).
- :func:`salted_broadcast_left` — a skewed join where the hot side can't
  broadcast: replicate the small side SALT_N ways and scatter the big
  side's hot keys across the replicas.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default salt fan-out
SALT_N = 16


def with_salt(df: DataFrame, n: int = SALT_N, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n): hash of all columns, not
    rand() — reruns and retried tasks must land rows in the same salt
    bucket or aggregates double-count under task retry."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n: int = SALT_N,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1, grouped
    on keys + salt — the hot key's rows spread over n reducers).
    ``merge_aggs``: name -> aggregate over the phase-1 partials (phase 2,
    grouped on keys alone — at most n rows per key).

    Example (sum + count -> mean):
        salted_agg(df, ["k"],
                   {"s": F.sum("x"), "c": F.count(F.lit(1))},
                   {"s": F.sum("s"), "c": F.sum("c")})
    """
    salted = with_salt(df, n)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n: int = SALT_N,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small
    side across all n salt values, join on (key, salt). The hot key's rows
    no longer converge on one task. Inner join semantics."""
    big_s = with_salt(big, n, "_salt_b")
    small_r = small.withColumn(
        "_salt_b", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    out = big_s.join(small_r, [key, "_salt_b"], "inner")
    return out.drop("_salt_b")
