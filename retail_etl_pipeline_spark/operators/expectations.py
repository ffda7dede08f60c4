"""Declarative data-quality expectations evaluated in ONE pass.

orders_data_quality (registry) is a hand-built profile; this is the
generic form: callers declare named boolean expectations over a table
and get one row per rule with violation counts — the
"expect/expect_or_drop" pattern from modern pipeline tooling, expressed
as a single conditional aggregation (no per-rule scan, no collect).

Plan shape: every rule compiles to SUM(CASE WHEN NOT rule THEN 1 END)
inside one hash aggregate over the whole table — N rules cost one scan,
map-side combined; the unpivot to (rule, violations) rows happens on the
already-aggregated single row via stack(). NULL semantics are explicit:
a rule evaluating to NULL counts as a violation (SQL three-valued logic
would otherwise silently pass NULLs — the exact failure mode the
corpus-pipeline NULL-text advisory was about).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_rule_name(name: str) -> None:
    """Rule names become column names and stack() literals — enforce
    identifier-safety in every consumer (check_expectations and the
    run_pipeline publish gate share this)."""
    if not name.replace("_", "").isalnum():
        raise ValueError(f"rule name must be identifier-safe: {name!r}")


def violations_expr(cond: Column) -> Column:
    """The one rendering of NULL-as-violation counting: a rule
    evaluating to NULL counts as a violation (three-valued logic made
    explicit). Shared so the pipeline gate and the standalone checker
    cannot drift."""
    return F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))


def check_expectations(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate named expectations; returns (rule, n_rows, violations,
    pass_rate_ppm) — one output row per rule, one input scan total.

    pass_rate is reported in exact ppm (integer arithmetic) rather than
    a double ratio, keeping the output engine-stable."""
    if not rules:
        raise ValueError("at least one expectation required")
    for name in rules:
        validate_rule_name(name)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(violations_expr(cond).alias(f"_v_{name}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', _v_{n}" for n in rules)
    long = one.select(
        F.col("_n"),
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, violations)"
        ),
    )
    # empty-table semantics made explicit (the module's whole contract):
    # SUM over zero rows is NULL -> coalesce violations to 0 so a
    # `violations == 0` health gate passes on an empty-but-healthy
    # input; pass_ppm has no defined value at n=0 -> NULL via NULLIF
    # (not an ANSI divide-by-zero crash)
    return long.select(
        "rule",
        F.col("_n").cast("bigint").alias("n_rows"),
        F.coalesce(F.col("violations"), F.lit(0))
        .cast("bigint")
        .alias("violations"),
        F.expr(
            "((_n - coalesce(violations, 0)) * 1000000) div NULLIF(_n, 0)"
        ).alias("pass_ppm"),
    )
