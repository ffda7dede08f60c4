"""Unit tests for count-min sketch, k-anonymity, and expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_spark.operators import expectations as ex
from retail_etl_pipeline_spark.operators import privacy as pv
from retail_etl_pipeline_spark.operators import sketches as sk


# --- count-min sketch -------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "tok string").repartition(5)
    sketch = sk.cms_build(df, "tok")
    probes = df.select("tok").distinct()
    est = {
        r["tok"]: r["cms_estimate"]
        for r in sk.cms_estimate(sketch, probes, "tok").collect()
    }
    true = {"a": 10, "b": 3, "c": 1}
    for tok, t in true.items():
        assert est[tok] >= t
    # 3 keys in 4x1024 cells: a full-depth collision for any key is
    # (3/1024)^... practically impossible -> min over rows is exact
    assert est == true


def test_cms_sketch_is_bounded(spark):
    df = spark.createDataFrame(
        [(f"t{i}",) for i in range(500)], "tok string"
    )
    sketch = sk.cms_build(df, "tok")
    assert sketch.count() <= sk.CMS_DEPTH * sk.CMS_WIDTH
    # all cells land in range
    bad = sketch.where(
        (F.col("cell") < 0) | (F.col("cell") >= sk.CMS_WIDTH)
    ).count()
    assert bad == 0


def test_cms_merge_is_sum_of_sketches(spark):
    """Mergeability: sketch(A union B) == re-aggregated union of
    sketch(A) and sketch(B), cell by cell."""
    a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, "tok string")
    b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 5, "tok string")
    merged = (
        sk.cms_build(a, "tok")
        .unionByName(sk.cms_build(b, "tok"))
        .groupBy("j", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = sk.cms_build(a.unionByName(b), "tok")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


# --- k-anonymity ------------------------------------------------------------


def _people(spark):
    rows = [
        ("M", 10, "x"),
        ("M", 10, "y"),
        ("M", 10, "z"),
        ("F", 10, "u"),
        ("F", 20, "v"),
        ("F", 20, "w"),
    ]
    return spark.createDataFrame(rows, "sex string, zip int, name string")


def test_k_anonymity_violations_and_summary(spark):
    df = _people(spark)
    v = pv.k_anonymity_violations(df, ["sex", "zip"], k=3).collect()
    assert {(r["sex"], r["zip"], r["class_size"], r["deficit"]) for r in v} == {
        ("F", 10, 1, 2),
        ("F", 20, 2, 1),
    }
    s = pv.k_anonymity_summary(df, ["sex", "zip"], k=3).collect()[0]
    assert (
        s["n_classes"],
        s["violating_classes"],
        s["rows_at_risk"],
        s["achieved_k"],
    ) == (3, 2, 3, 1)


def test_k_anonymity_nulls_form_a_class(spark):
    df = spark.createDataFrame(
        [("M", None), ("M", None), ("F", 1)], "sex string, zip int"
    )
    v = pv.k_anonymity_violations(df, ["sex", "zip"], k=2).collect()
    assert [(r["sex"], r["zip"], r["class_size"]) for r in v] == [("F", 1, 1)]


def test_k_anonymity_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        pv.k_anonymity_violations(_people(spark), ["sex"], k=0)


# --- expectations -----------------------------------------------------------


def test_expectations_null_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0)], "id int, v double"
    )
    out = {
        r["rule"]: (r["n_rows"], r["violations"], r["pass_ppm"])
        for r in ex.check_expectations(
            df, {"v_positive": F.col("v") > 0, "id_small": F.col("id") < 10}
        ).collect()
    }
    # NULL v -> NULL comparison -> violation (not silently passed)
    assert out["v_positive"] == (3, 2, 333333)
    assert out["id_small"] == (3, 0, 1000000)


def test_expectations_reject_bad_names_and_empty(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        ex.check_expectations(df, {})
    with pytest.raises(ValueError):
        ex.check_expectations(df, {"bad name; drop": F.col("id") > 0})


def test_expectations_single_scan_plan(spark):
    """All rules ride one aggregate: exactly one scan of the input in
    the optimized plan."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    out = ex.check_expectations(
        df,
        {
            "id_nonneg": F.col("id") >= 0,
            "m_small": F.col("m") < 7,
            "id_bounded": F.col("id") < 1000,
        },
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan


# --- review-fix regressions -------------------------------------------------


def test_expectations_empty_table_is_healthy_not_null(spark):
    """SUM over zero rows is NULL; the contract coalesces it: an empty
    input reports 0 violations (health gates pass) and NULL pass_ppm
    (undefined, not a divide-by-zero crash)."""
    df = spark.createDataFrame([], "id int, v double")
    out = ex.check_expectations(df, {"v_positive": F.col("v") > 0}).collect()
    assert len(out) == 1
    assert (out[0]["n_rows"], out[0]["violations"], out[0]["pass_ppm"]) == (
        0,
        0,
        None,
    )


def test_mg_candidates_non_string_column(spark):
    """The heavy-hitter API is type-generic: candidate schema mirrors
    the input column type (a hardcoded string schema broke bigint keys)."""
    from retail_etl_pipeline_spark.operators import frequent as fq

    df = spark.createDataFrame([(7,)] * 50 + [(i,) for i in range(40)], "k bigint")
    out = {
        r["k"]: r["term_freq"]
        for r in fq.exact_heavy_hitters(df, "k", denom=4, k=50).collect()
    }
    assert out[7] == 51  # 50 plus the one from range(40)
    assert all(isinstance(key, int) for key in out)


# --- hypothesis armor for the sketch/expectation algebra --------------------


def test_cms_matches_pure_python_model(spark):
    """The relational CMS equals a direct python model of the same
    hashes on a fixed skewed stream — cell-for-cell."""
    import hashlib

    rows = [(f"t{i % 7}",) for i in range(60)] + [("hot",)] * 25
    df = spark.createDataFrame(rows, "tok string").repartition(6)
    got = {
        (r["j"], r["cell"]): r["cnt"]
        for r in sk.cms_build(df, "tok").collect()
    }
    model: dict = {}
    for (tok,) in rows:
        fp = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for j, mix in enumerate(sk.CMS_MIX):
            cell = (fp * mix) % (2**32) % sk.CMS_WIDTH
            model[(j, cell)] = model.get((j, cell), 0) + 1
    assert got == model


def test_expectations_random_rules_sum_to_rowcount(spark):
    """For any rule, violations + passes == n_rows (NULLs land on the
    violation side, never dropped)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
            min_size=1,
            max_size=30,
        ),
        st.integers(min_value=-40, max_value=40),
    )
    @settings(max_examples=15, deadline=None)
    def _check(vals, threshold):
        df = spark.createDataFrame([(v,) for v in vals], "v int")
        out = ex.check_expectations(
            df, {"above": F.col("v") > threshold}
        ).collect()[0]
        passes = sum(1 for v in vals if v is not None and v > threshold)
        assert out["n_rows"] == len(vals)
        assert out["violations"] == len(vals) - passes

    _check()
