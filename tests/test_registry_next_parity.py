"""Differential tests for the round-6 STAGED queries (registry_next.py)
vs their DuckDB oracles at sf0.001 — identical harness to
test_oracle_parity.py, so the staged surface stays continuously green
until round 6 registers it with the driver."""

from __future__ import annotations

import pytest

from retail_etl_pipeline_spark.registry_next import ORACLES, QUERIES

from .oracle_utils import compare

PARAMS = sorted(ORACLES.keys())


def test_staged_registry_is_consistent():
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.slow  # staged-surface oracle sweep — opt-in (verify-window fit)
@pytest.mark.parametrize("name", PARAMS)
def test_staged_query_matches_oracle(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, duck, ORACLES[name])
    spark.catalog.clearCache()  # ordered-kernel queries persist partials
    assert not problems, f"{name}: " + " | ".join(problems)


def test_round6_batch_registered_by_identity():
    """Since the round-6 merge (registry._merge_round6_surface) every
    batch name must resolve to the SAME function object in the main
    registry — a same-named independent registration in registry.py
    would mean the oracle record tests a different implementation (the
    round-5 duplicate-registration gotcha, cross-module edition)."""
    from retail_etl_pipeline_spark.registry import QUERIES as REG

    for name, fn in QUERIES.items():
        assert REG.get(name) is fn, name


@pytest.mark.parametrize(
    "name",
    [
        "supplier_revenue_weighted_gini",   # two-level prefix sum offsets
        "store_revenue_cusum_breaches",     # partitioned prefix sum + min
        "daily_revenue_cusum_days",         # two-level sum THEN two-level min
        "nation_revenue_ks",                # partitioned ecdf-gap cumsum
        "event_type_steady_state",          # iterative fixed-point joins
        "part_abc_migration_matrix",        # two independent running sums
    ],
)
def test_staged_results_identical_across_shuffle_parallelism(
    spark, sf_dir, name
):
    """The partitioning-independence contract for the staged queries
    that ride the exactness machinery (two-level prefix sums/mins,
    partitioned cumulative windows, fixed-point loops): results must
    be IDENTICAL at 3 and 24 shuffle partitions — mirrors
    test_properties.test_results_identical_across_shuffle_parallelism
    for the registered surface."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in (3, 24):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            spark.catalog.clearCache()
            rows = QUERIES[name](spark, sf_dir).collect()
            results[n] = sorted(tuple(r) for r in rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.catalog.clearCache()
    assert results[3] == results[24]
