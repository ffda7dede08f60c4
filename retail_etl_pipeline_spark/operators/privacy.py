"""Privacy auditing: k-anonymity over quasi-identifier columns.

Companion to the PII scrubber (operators/text.py): after direct
identifiers are redacted, re-identification risk lives in the
*combination* of innocuous columns (quasi-identifiers). A table is
k-anonymous over a QI set when every distinct QI combination covers at
least k rows; the audit below reports the violating equivalence classes
— exactly the rows a release process must generalize or suppress.

Plan shape: one hash aggregation on the QI columns (map-side combined),
then a filter — no window, no self-join; the audit scales like any
groupBy-count. The per-class output is bounded by the number of rare
classes, which is what the release decision needs (publishing ALL class
sizes would itself be a disclosure channel for large tables).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_violations(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Equivalence classes smaller than k: the QI columns plus
    (class_size, deficit). NULL QI values form their own class (NULL is
    a disclosure-relevant value: groupBy treats NULLs as equal, same as
    the SQL GROUP BY the oracle runs)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") < k)
        .withColumn("deficit", F.lit(k) - F.col("class_size"))
    )


def k_anonymity_summary(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """One-row audit summary: total classes, violating classes, rows at
    risk, and the achieved k (the minimum class size — the largest k for
    which the table IS k-anonymous). Single aggregation pass over the
    class-size relation."""
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("class_size") < k, 1).otherwise(0)).alias(
            "violating_classes"
        ),
        F.sum(
            F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0)
        ).alias("rows_at_risk"),
        F.min("class_size").alias("achieved_k"),
    )


def l_diversity_summary(
    df: DataFrame, quasi_cols: Sequence[str], sensitive_col: str, l: int
) -> DataFrame:
    """One-row l-diversity audit: k-anonymity's necessary complement —
    a class of 50 rows that all share ONE sensitive value is perfectly
    k-anonymous yet discloses the attribute outright (homogeneity
    attack). A table is (distinct) l-diverse when every QI equivalence
    class contains at least ``l`` distinct sensitive values; reported
    here as total classes, violating classes, rows at risk, and the
    achieved l (the minimum distinct-sensitive count over classes).

    Same plan shape as :func:`k_anonymity_summary` plus a distinct
    count inside the class aggregation — Spark rewrites
    count_distinct within groupBy as a two-phase expand/aggregate,
    still one logical pass, no window or self-join."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(sensitive_col).alias("n_sensitive"),
    )
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("n_sensitive") < l, 1).otherwise(0))
        .cast("bigint")
        .alias("violating_classes"),
        F.sum(
            F.when(F.col("n_sensitive") < l, F.col("class_size")).otherwise(0)
        )
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("n_sensitive").cast("bigint").alias("achieved_l"),
    )
