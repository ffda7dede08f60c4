"""Property/unit tests for the round-6 prep kernels in functions/stats.py
and functions/ordered.py (Mann-Whitney U, Atkinson, Theil decomposition,
stratified Kaplan-Meier + Greenwood, CUSUM, running min).

These kernels are implemented and tested ahead of their registry queries
(the round-5 driver window is full — DEVNOTES window math); round 6 wires
them to queries()/oracle_sql() entries. Each test pins the kernel against
an exact Python oracle or an algebraic identity, the same discipline as
tests/test_stats_kernels.py.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retail_etl_pipeline_spark.functions.ordered import with_running_min
from retail_etl_pipeline_spark.functions.stats import (
    atkinson_index,
    kaplan_meier,
    kaplan_meier_by,
    km_median_survival,
    mann_whitney_u2,
    theil_decomposition,
    with_cusum,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# ---------------------------------------------------------------------------
# with_running_min
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=40,
    )
)
def test_running_min_equals_python_prefix_min(spark, xs):
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i long, v long"
    ).repartition(7)
    out, gmin = with_running_min(df, [F.col("i")], "v", running_col="rm")
    got = {r.i: r.rm for r in out.collect()}
    spark.catalog.clearCache()
    best = None
    for i, x in enumerate(xs):
        best = x if best is None else min(best, x)
        assert got[i] == best
    assert gmin == min(xs)


def test_running_min_single_partition_and_order_desc(spark):
    df = spark.createDataFrame([(3, 5), (1, 9), (2, 2)], "i long, v long")
    out, gmin = with_running_min(
        df, [F.desc("i")], "v", running_col="rm", num_partitions=1
    )
    rows = {r.i: r.rm for r in out.collect()}
    spark.catalog.clearCache()
    # order i desc: 3 (5), 2 (min 2), 1 (min 2)
    assert rows == {3: 5, 2: 2, 1: 2}
    assert gmin == 2


# ---------------------------------------------------------------------------
# mann_whitney_u2
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
)
def test_mann_whitney_u2_equals_brute_force_pairs(spark, a, b):
    # exact oracle: 2U = 2*#{a>b} + #{a==b}
    u2 = sum(2 for x in a for y in b if x > y) + sum(
        1 for x in a for y in b if x == y
    )
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v long, is_a boolean")
    got = mann_whitney_u2(df, "v", "is_a").collect()[0]
    spark.catalog.clearCache()
    assert (got.n_a, got.n_b, got.u2_a) == (len(a), len(b), u2)


def test_mann_whitney_u2_complement_identity(spark):
    """u2_a + u2_b == 2 * n_a * n_b (every pair is won, lost, or split)."""
    a, b = [1, 3, 3, 7, 9], [2, 3, 5, 5]
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v long, is_a boolean")
    ua = mann_whitney_u2(df, "v", "is_a").collect()[0]
    ub = mann_whitney_u2(
        df.withColumn("is_b", ~F.col("is_a")), "v", "is_b"
    ).collect()[0]
    spark.catalog.clearCache()
    assert ua.u2_a + ub.u2_a == 2 * len(a) * len(b)


def test_mann_whitney_u2_one_sided_input(spark):
    df = spark.createDataFrame([(v, True) for v in [1, 2, 3]], "v long, is_a boolean")
    got = mann_whitney_u2(df, "v", "is_a").collect()[0]
    spark.catalog.clearCache()
    assert (got.n_a, got.n_b, got.u2_a) == (3, 0, 0)


# ---------------------------------------------------------------------------
# atkinson_index
# ---------------------------------------------------------------------------


def test_atkinson_zero_at_perfect_equality(spark):
    df = spark.createDataFrame([(7,)] * 6, "x long")
    got = atkinson_index(df, "x").collect()[0]
    assert got.n == 6
    assert got.atkinson == 0.0


def test_atkinson_one_when_any_zero_holder(spark):
    df = spark.createDataFrame([(0,), (5,), (9,)], "x long")
    got = atkinson_index(df, "x").collect()[0]
    assert got.atkinson == 1.0


def test_atkinson_null_on_all_zero(spark):
    df = spark.createDataFrame([(0,), (0,)], "x long")
    got = atkinson_index(df, "x").collect()[0]
    assert got.atkinson is None


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=2, max_size=25
    )
)
def test_atkinson_matches_float_mirror_and_bounds(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = atkinson_index(df, "x").collect()[0]
    n = len(xs)
    geo = math.exp(sum(math.log(x) for x in xs) / n)
    mean = sum(xs) / n
    expected = 1.0 - geo / mean
    # kernel rounds each ln at 6 places then the output at 6 places;
    # the mirror is unrounded -> tolerance covers both hops
    assert abs(got.atkinson - expected) < 5e-6
    assert 0.0 <= got.atkinson < 1.0


# ---------------------------------------------------------------------------
# theil_decomposition
# ---------------------------------------------------------------------------


def test_theil_decomposition_single_group_is_all_within(spark):
    df = spark.createDataFrame(
        [("g", x) for x in [1, 2, 3, 10]], "g string, x long"
    )
    got = theil_decomposition(df, "g", "x").collect()[0]
    assert got.n_groups == 1
    assert got.theil_between == 0.0
    assert got.theil_within == got.theil_total


def test_theil_decomposition_constant_values_all_zero(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, x long"
    )
    got = theil_decomposition(df, "g", "x").collect()[0]
    assert got.theil_total == 0.0
    assert got.theil_between == 0.0
    assert got.theil_within == 0.0


def test_theil_decomposition_within_zero_when_groups_internally_equal(spark):
    # each group internally equal but different means: inequality is
    # purely between-group
    df = spark.createDataFrame(
        [("a", 2), ("a", 2), ("b", 20), ("b", 20)], "g string, x long"
    )
    got = theil_decomposition(df, "g", "x").collect()[0]
    assert got.theil_within == 0.0
    assert got.theil_between > 0.0
    assert abs(got.theil_between - got.theil_total) < 1e-5


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_theil_decomposition_additivity_and_float_mirror(spark, rows):
    df = spark.createDataFrame(rows, "g string, x long")
    got = theil_decomposition(df, "g", "x").collect()[0]
    # unrounded float mirror
    n, s = len(rows), sum(x for _, x in rows)
    groups: dict[str, list[int]] = {}
    for g, x in rows:
        groups.setdefault(g, []).append(x)
    total = sum(x * math.log(x * n / s) for _, x in rows) / s
    within = (
        sum(
            x * math.log(x * len(v) / sum(v))
            for v in groups.values()
            for x in v
        )
        / s
    )
    between = (
        sum(
            sum(v) * math.log(sum(v) * n / (s * len(v)))
            for v in groups.values()
        )
        / s
    )
    assert abs(got.theil_total - total) < 5e-6
    assert abs(got.theil_within - within) < 5e-6
    assert abs(got.theil_between - between) < 5e-6
    # additive identity survives the rounding hops
    assert abs(got.theil_total - (got.theil_between + got.theil_within)) < 1e-5


# ---------------------------------------------------------------------------
# kaplan_meier_by + Greenwood + median survival
# ---------------------------------------------------------------------------

_LIVES = [
    # group a: events at 2 (1 of 4), 5 (1 of 3, after a censor at 3)
    ("a", 2, 1),
    ("a", 3, 0),
    ("a", 5, 1),
    ("a", 6, 0),
    # group b: everyone events at the same time -> terminal S=0
    ("b", 4, 1),
    ("b", 4, 1),
    # group c: censor-only -> no event rows at all
    ("c", 9, 0),
]


def _km_python(pairs):
    """Float-exact KM + Greenwood mirror: {t: (n, d, S, SE)}."""
    from collections import Counter

    d = Counter(t for t, e in pairs if e)
    c = Counter(t for t, _ in pairs)
    out = {}
    s, g, at_risk = 1.0, 0.0, len(pairs)
    for t in sorted(c):
        dt, ct = d.get(t, 0), c[t]
        if dt > 0:
            if at_risk > dt:
                s *= (at_risk - dt) / at_risk
                g += dt / (at_risk * (at_risk - dt))
                out[t] = (at_risk, dt, s, s * math.sqrt(g))
            else:
                s = 0.0
                out[t] = (at_risk, dt, 0.0, 0.0)
        at_risk -= ct
    return out


def test_kaplan_meier_by_matches_unstratified_per_group(spark):
    life = spark.createDataFrame(_LIVES, "g string, t long, ev int")
    strat = kaplan_meier_by(life, ["g"]).collect()
    for g in ["a", "b", "c"]:
        single = kaplan_meier(
            life.where(F.col("g") == g).select("t", "ev")
        ).collect()
        spark.catalog.clearCache()  # kaplan_meier persists via running sums
        mine = [r for r in strat if r.g == g]
        assert [
            (r.t_days, r.n_at_risk, r.n_events, r.survival) for r in mine
        ] == [
            (r.t_days, r.n_at_risk, r.n_events, r.survival) for r in single
        ]


def test_kaplan_meier_by_greenwood_matches_float_mirror(spark):
    life = spark.createDataFrame(_LIVES, "g string, t long, ev int")
    got = kaplan_meier_by(life, ["g"]).collect()
    for g in ["a", "b"]:
        mirror = _km_python([(t, e) for gg, t, e in _LIVES if gg == g])
        mine = {r.t_days: r for r in got if r.g == g}
        assert set(mine) == set(mirror)
        for t, (n, d, s, se) in mirror.items():
            r = mine[t]
            assert (r.n_at_risk, r.n_events) == (n, d)
            assert abs(r.survival - s) < 2e-6
            assert abs(r.greenwood_se - se) < 2e-6
    # censor-only group contributes no curve rows
    assert not [r for r in got if r.g == "c"]


def test_km_median_survival_first_time_at_or_below_half(spark):
    life = spark.createDataFrame(_LIVES, "g string, t long, ev int")
    curve = kaplan_meier_by(life, ["g"])
    med = {r.g: r.median_t_days for r in km_median_survival(curve, ["g"]).collect()}
    # group a: S(2)=0.75, S(5)=0.375 -> median 5; group b: S(4)=0 -> 4
    assert med == {"a": 5, "b": 4}


# ---------------------------------------------------------------------------
# with_cusum
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=40,
    )
)
def test_cusum_equals_textbook_recursion(spark, devs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(devs)], "i long, dev long"
    ).select("i", F.col("dev").cast("decimal(38,0)").alias("dev"))
    out = with_cusum(df.repartition(5), [F.col("i")], "dev", cusum_col="c")
    got = {r.i: int(r.c) for r in out.collect()}
    spark.catalog.clearCache()
    c = 0
    for i, d in enumerate(devs):
        c = max(0, c + d)
        assert got[i] == c


def test_cusum_requires_decimal_dev(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "i long, dev long")
    with pytest.raises(TypeError, match="DECIMAL"):
        with_cusum(df, [F.col("i")], "dev")


# ---------------------------------------------------------------------------
# empty-input safety (the repo discipline: degenerate inputs must not
# crash, and their outputs are pinned here so refactors can't drift)
# ---------------------------------------------------------------------------


def test_empty_input_safety(spark):
    empty_vf = spark.createDataFrame([], "v long, is_a boolean")
    mwu = mann_whitney_u2(empty_vf, "v", "is_a").collect()
    spark.catalog.clearCache()
    assert [tuple(r) for r in mwu] == [(0, 0, 0)]

    empty_x = spark.createDataFrame([], "x long")
    atk = atkinson_index(empty_x, "x").collect()
    assert [tuple(r) for r in atk] == [(0, None)]

    empty_gx = spark.createDataFrame([], "g string, x long")
    td = theil_decomposition(empty_gx, "g", "x").collect()
    # tot aggregates an empty group relation: sums are NULL, counts 0
    assert len(td) == 1
    assert td[0].n_groups == 0
    assert td[0].theil_total is None

    empty_life = spark.createDataFrame([], "g string, t long, ev int")
    assert kaplan_meier_by(empty_life, ["g"]).collect() == []

    empty_dev = spark.createDataFrame([], "i long, dev decimal(38,0)")
    assert with_cusum(empty_dev, [F.col("i")], "dev").collect() == []
    spark.catalog.clearCache()

    empty_iv = spark.createDataFrame([], "i long, v long")
    out, gmin = with_running_min(empty_iv, [F.col("i")], "v")
    assert out.collect() == [] and gmin is None
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# ks_statistic_by
# ---------------------------------------------------------------------------


def test_ks_by_matches_unstratified_per_group(spark):
    from retail_etl_pipeline_spark.functions.stats import (
        ks_statistic,
        ks_statistic_by,
    )

    rows = []
    for g, vals_a, vals_b in [
        ("x", [1, 2, 2, 5, 9], [2, 3, 3, 8]),
        ("y", [4, 4, 4], [1, 2, 9, 9]),
        ("z", [7], [7]),
    ]:
        rows += [(g, v, True) for v in vals_a]
        rows += [(g, v, False) for v in vals_b]
    df = spark.createDataFrame(rows, "g string, v long, a boolean")
    strat = {r.g: r for r in ks_statistic_by(df, ["g"], "v", "a").collect()}
    for g in ["x", "y", "z"]:
        single = ks_statistic(
            df.where(F.col("g") == g).select("v", "a"), "v", "a"
        ).collect()[0]
        spark.catalog.clearCache()  # ks_statistic uses the two-level sums
        got = strat[g]
        assert (got.n_a, got.n_b, got.ks_ppm, got.at_value) == tuple(single)


def test_ks_by_one_sided_group_is_null(spark):
    from retail_etl_pipeline_spark.functions.stats import ks_statistic_by

    df = spark.createDataFrame(
        [("only_a", 1, True), ("only_a", 2, True), ("both", 1, True),
         ("both", 2, False)],
        "g string, v long, a boolean",
    )
    out = {r.g: r for r in ks_statistic_by(df, ["g"], "v", "a").collect()}
    assert out["only_a"].ks_ppm is None
    assert out["both"].ks_ppm == 1_000_000  # disjoint singletons


# ---------------------------------------------------------------------------
# with_cusum_by
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cusum_by_equals_recursion_per_group(spark, rows):
    from retail_etl_pipeline_spark.functions.stats import with_cusum_by

    df = spark.createDataFrame(
        [(g, i, d) for i, (g, d) in enumerate(rows)],
        "g string, i long, dev long",
    ).select("g", "i", F.col("dev").cast("decimal(38,0)").alias("dev"))
    out = with_cusum_by(df, ["g"], [F.col("i")], "dev", cusum_col="c")
    got = {(r.g, r.i): int(r.c) for r in out.collect()}
    state: dict[str, int] = {}
    for i, (g, d) in enumerate(rows):
        state[g] = max(0, state.get(g, 0) + d)
        assert got[(g, i)] == state[g]


def test_cusum_by_requires_decimal_dev(spark):
    import pytest

    from retail_etl_pipeline_spark.functions.stats import with_cusum_by

    df = spark.createDataFrame([("a", 1, 2)], "g string, i long, dev long")
    with pytest.raises(TypeError, match="DECIMAL"):
        with_cusum_by(df, ["g"], [F.col("i")], "dev")


def test_mwu_by_matches_unstratified_per_group(spark):
    from retail_etl_pipeline_spark.functions.stats import (
        mann_whitney_u2,
        mann_whitney_u2_by,
    )

    rows = []
    for g, vals_a, vals_b in [
        ("x", [1, 2, 2, 5], [2, 3]),
        ("y", [4], [1, 2, 9]),
        ("z", [7, 7], [7]),
    ]:
        rows += [(g, v, True) for v in vals_a]
        rows += [(g, v, False) for v in vals_b]
    df = spark.createDataFrame(rows, "g string, v long, a boolean")
    strat = {
        r.g: r for r in mann_whitney_u2_by(df, ["g"], "v", "a").collect()
    }
    for g in ["x", "y", "z"]:
        single = mann_whitney_u2(
            df.where(F.col("g") == g).select("v", "a"), "v", "a"
        ).collect()[0]
        spark.catalog.clearCache()  # the unstratified kernel persists
        assert tuple(strat[g])[1:] == tuple(single)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["p", "q"]),
            st.integers(min_value=0, max_value=20),
            st.booleans(),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_ks_by_property_matches_python_oracle(spark, rows):
    """Grouped KS vs the exact Python oracle (the same oracle as the
    unstratified property test, applied per group)."""
    from retail_etl_pipeline_spark.functions.stats import ks_statistic_by

    df = spark.createDataFrame(rows, "g string, v long, a boolean")
    got = {r.g: r for r in ks_statistic_by(df, ["g"], "v", "a").collect()}
    groups: dict[str, list[tuple[int, bool]]] = {}
    for g, v, a in rows:
        groups.setdefault(g, []).append((v, a))
    assert set(got) == set(groups)
    for g, pairs in groups.items():
        a = [v for v, fl in pairs if fl]
        b = [v for v, fl in pairs if not fl]
        r = got[g]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        if not a or not b:
            assert r.ks_ppm is None
            continue
        best, best_at, ca, cb = -1, None, 0, 0
        for v in sorted(set(a) | set(b)):
            ca += sum(1 for x in a if x == v)
            cb += sum(1 for x in b if x == v)
            gap = abs(ca * len(b) - cb * len(a))
            if gap > best:
                best, best_at = gap, v
        assert r.ks_ppm == best * 1_000_000 // (len(a) * len(b))
        assert r.at_value == best_at


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=2, max_size=25),
    st.lists(st.integers(min_value=0, max_value=15), min_size=2, max_size=25),
)
def test_mann_whitney_z_matches_float_mirror(spark, a, b):
    from retail_etl_pipeline_spark.functions.stats import mann_whitney_z

    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v long, is_a boolean")
    got = mann_whitney_z(df, "v", "is_a").collect()[0]
    spark.catalog.clearCache()
    na, nb, n = len(a), len(b), len(a) + len(b)
    u2 = sum(2 for x in a for y in b if x > y) + sum(
        1 for x in a for y in b if x == y
    )
    assert (got.n_a, got.n_b, got.u2_a) == (na, nb, u2)
    from collections import Counter

    ties = Counter(a) + Counter(b)
    stie = sum(t**3 - t for t in ties.values())
    var_term = (n + 1) - stie / (n * (n - 1))
    if var_term <= 0:  # all pooled values tied
        assert got.z is None
        return
    z = (u2 - na * nb) / (2.0 * math.sqrt((na * nb / 12.0) * var_term))
    assert abs(got.z - z) < 2e-6
    # antisymmetry: swapping the sides negates z (exact integers in)
    swapped = mann_whitney_z(
        df.withColumn("is_b", ~F.col("is_a")), "v", "is_b"
    ).collect()[0]
    spark.catalog.clearCache()
    assert abs(got.z + swapped.z) < 2e-6


def test_mann_whitney_z_null_when_degenerate(spark):
    from retail_etl_pipeline_spark.functions.stats import mann_whitney_z

    # all pooled values tied -> zero variance -> NULL z
    df = spark.createDataFrame(
        [(5, True), (5, True), (5, False)], "v long, is_a boolean"
    )
    got = mann_whitney_z(df, "v", "is_a").collect()[0]
    spark.catalog.clearCache()
    assert got.z is None and got.u2_a == 2  # two ties split
    # one empty side -> NULL z, zero-filled counts
    one = spark.createDataFrame([(1, True)], "v long, is_a boolean")
    g1 = mann_whitney_z(one, "v", "is_a").collect()[0]
    spark.catalog.clearCache()
    assert (g1.n_a, g1.n_b, g1.u2_a, g1.z) == (1, 0, 0, None)


# ---------------------------------------------------------------------------
# gini_weighted_ppm
# ---------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=2, max_size=20
    )
)
def test_weighted_gini_with_unit_weights_equals_gini(spark, xs):
    from hypothesis import assume

    from retail_etl_pipeline_spark.functions.stats import (
        gini_ppm,
        gini_weighted_ppm,
    )

    assume(sum(xs) != 0)
    df = spark.createDataFrame(
        [(i, x, 1) for i, x in enumerate(xs)], "k long, cents long, w long"
    )
    wg = gini_weighted_ppm(df, "cents", "w", "k").collect()[0]
    g = gini_ppm(df, "cents", "k").collect()[0]
    spark.catalog.clearCache()
    assert (wg.n, wg.total_w) == (len(xs), len(xs))
    assert wg.gini_ppm == g.gini_ppm


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**4),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_weighted_gini_equals_replicated_multiset(spark, pairs):
    from hypothesis import assume

    from retail_etl_pipeline_spark.functions.stats import gini_weighted_ppm

    assume(sum(x * w for x, w in pairs) != 0)
    weighted = spark.createDataFrame(
        [(i, x, w) for i, (x, w) in enumerate(pairs)],
        "k long, cents long, w long",
    )
    replicated_rows = []
    i = 0
    for x, w in pairs:
        for _ in range(w):
            replicated_rows.append((i, x, 1))
            i += 1
    replicated = spark.createDataFrame(
        replicated_rows, "k long, cents long, w long"
    )
    wg = gini_weighted_ppm(weighted, "cents", "w", "k").collect()[0]
    rep = gini_weighted_ppm(replicated, "cents", "w", "k").collect()[0]
    spark.catalog.clearCache()
    assert wg.total_w == rep.total_w == rep.n
    assert wg.gini_ppm == rep.gini_ppm


# ---------------------------------------------------------------------------
# km_confidence_bands + atkinson2_index (round-7 prep)
# ---------------------------------------------------------------------------


def test_km_confidence_bands_clamp_and_order(spark):
    from retail_etl_pipeline_spark.functions.stats import km_confidence_bands

    life = spark.createDataFrame(_LIVES, "g string, t long, ev int")
    curve = km_confidence_bands(kaplan_meier_by(life, ["g"]))
    for r in curve.collect():
        assert 0.0 <= r.ci_lo <= r.survival <= r.ci_hi <= 1.0
        if r.n_at_risk == r.n_events:  # terminal S = 0, se = 0
            assert r.ci_lo == r.ci_hi == 0.0
        else:
            mirror_lo = max(r.survival - 1.96 * r.greenwood_se, 0.0)
            mirror_hi = min(r.survival + 1.96 * r.greenwood_se, 1.0)
            assert abs(r.ci_lo - mirror_lo) < 1e-6
            assert abs(r.ci_hi - mirror_hi) < 1e-6


def test_atkinson2_degenerate_cases(spark):
    from retail_etl_pipeline_spark.functions.stats import atkinson2_index

    eq = spark.createDataFrame([(7,)] * 5, "x long")
    assert atkinson2_index(eq, "x").collect()[0].atkinson2 == 0.0
    zero = spark.createDataFrame([(0,), (3,)], "x long")
    assert atkinson2_index(zero, "x").collect()[0].atkinson2 == 1.0
    allz = spark.createDataFrame([(0,)], "x long")
    assert atkinson2_index(allz, "x").collect()[0].atkinson2 is None


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=2, max_size=20
    )
)
def test_atkinson2_mirror_and_dominates_epsilon1(spark, xs):
    from retail_etl_pipeline_spark.functions.stats import atkinson2_index

    df = spark.createDataFrame([(x,) for x in xs], "x long")
    a2 = atkinson2_index(df, "x").collect()[0].atkinson2
    a1 = atkinson_index(df, "x").collect()[0].atkinson
    n = len(xs)
    harm = n / sum(1.0 / x for x in xs)
    mean = sum(xs) / n
    assert abs(a2 - (1.0 - harm / mean)) < 5e-6
    assert 0.0 <= a2 < 1.0
    # aversion ordering: ge by the generalized-mean inequality
    # (harmonic <= geometric), up to the rounding hops
    assert a2 >= a1 - 2e-6
