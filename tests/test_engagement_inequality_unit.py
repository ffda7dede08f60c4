"""Unit tests for the engagement/inequality kernels factored out of the
registry: weekly_streak_histogram + consecutive_gap_stats
(operators/behavior.py) and theil_index (functions/stats.py).

The oracle-parity sweep proves these match DuckDB on the fixtures; the
tests here pin the CLAIMS the docstrings make on synthetic inputs the
fixtures don't guarantee to contain — above all that a weekly streak
SURVIVES a year boundary, which is the entire reason the kernel uses a
linear week index instead of isoyear*100+weekofyear keys."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from retail_etl_pipeline_spark.operators.behavior import (
    consecutive_gap_stats,
    weekly_streak_histogram,
)
from retail_etl_pipeline_spark.functions.stats import (
    lorenz_buckets,
    theil_index,
)
from retail_etl_pipeline_spark.operators.text import bigram_pmi


def _acts(spark, rows):
    return spark.createDataFrame(
        [(u, dt.date.fromisoformat(d)) for u, d in rows],
        "user_id bigint, day date",
    )


def _streaks(spark, rows) -> dict[int, int]:
    out = weekly_streak_histogram(_acts(spark, rows)).collect()
    return {r.max_streak_weeks: r.n_users for r in out}


def test_streak_survives_new_year_52_week_year(spark):
    # 1999 has 52 ISO weeks: 1999-12-20 is W51, 12-27 is W52, 2000-01-03
    # is 2000-W01. Week-number keys jump 199952 -> 200001; the linear
    # index runs n, n+1, n+2 — one unbroken streak of 3.
    rows = [(1, "1999-12-20"), (1, "1999-12-27"), (1, "2000-01-03")]
    assert _streaks(spark, rows) == {3: 1}


def test_streak_survives_new_year_53_week_year(spark):
    # 1998 has 53 ISO weeks (ends in W53): the jump ...9853 -> ...9901
    # is -9952 in key arithmetic; the linear index is still contiguous.
    rows = [(1, "1998-12-21"), (1, "1998-12-28"), (1, "1999-01-04")]
    assert _streaks(spark, rows) == {3: 1}


def test_isoweek_key_arithmetic_would_split_the_same_streak(spark):
    # The counter-factual the kernel exists to avoid: run the identical
    # gaps-and-islands arithmetic on isoyear*100+weekofyear keys over
    # the 52-week-year rows above — the year boundary splits the run
    # into 2 + 1, i.e. a max "streak" of 2, which is WRONG.
    wk = (
        _acts(
            spark,
            [(1, "1999-12-20"), (1, "1999-12-27"), (1, "2000-01-03")],
        )
        .select(
            "user_id",
            F.expr(
                "CAST(extract(YEAROFWEEK FROM day) * 100"
                " + weekofyear(day) AS BIGINT)"
            ).alias("widx"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("widx")
    runs = (
        wk.select(
            "user_id",
            (F.col("widx") - F.row_number().over(w)).alias("grp"),
        )
        .groupBy("user_id", "grp")
        .count()
    )
    assert runs.agg(F.max("count")).collect()[0][0] == 2


def test_streak_gap_week_splits_runs(spark):
    # active W0, W1, skip W2, active W3 -> runs of 2 and 1, max 2
    rows = [(1, "1995-01-02"), (1, "1995-01-09"), (1, "1995-01-23")]
    assert _streaks(spark, rows) == {2: 1}


def test_streak_same_week_days_collapse(spark):
    # three days inside one week are ONE active week, and users
    # histogram independently
    rows = [
        (1, "1995-01-02"),
        (1, "1995-01-04"),
        (1, "1995-01-08"),  # Sunday, same ISO week as the Monday above
        (2, "1995-01-02"),
        (2, "1995-01-09"),
    ]
    assert _streaks(spark, rows) == {1: 1, 2: 1}


def _orders(spark, rows):
    return spark.createDataFrame(
        [(k, dt.date.fromisoformat(d), tb) for k, d, tb in rows],
        "k bigint, d date, tb bigint",
    )


def test_gap_stats_lower_median_even_count(spark):
    # gaps 1, 3, 5, 7 -> n=4, lower median = rank (4+1) div 2 = 2 -> 3
    rows = [
        (1, "1995-01-01", 1),
        (1, "1995-01-02", 2),
        (1, "1995-01-05", 3),
        (1, "1995-01-10", 4),
        (1, "1995-01-17", 5),
    ]
    out = consecutive_gap_stats(_orders(spark, rows), "k", "d", "tb").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_gaps, r.median_gap_days, r.min_gap_days, r.max_gap_days) == (
        4,
        3,
        1,
        7,
    )


def test_gap_stats_same_day_zero_gap_and_min_row_filter(spark):
    # key 1: three orders, two on the same day -> gaps [0, 4], median
    # at rank (2+1) div 2 = 1 -> 0; key 2: two orders = one gap only,
    # excluded by the >= 2 gaps rule
    rows = [
        (1, "1995-01-01", 1),
        (1, "1995-01-01", 2),
        (1, "1995-01-05", 3),
        (2, "1995-01-01", 4),
        (2, "1995-02-01", 5),
    ]
    out = consecutive_gap_stats(_orders(spark, rows), "k", "d", "tb").collect()
    assert len(out) == 1
    r = out[0]
    assert r.k == 1
    assert (r.n_gaps, r.median_gap_days, r.min_gap_days, r.max_gap_days) == (
        2,
        0,
        0,
        4,
    )


def _cents(spark, values):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i bigint, cents bigint"
    )


def _theil(spark, values) -> tuple[int, float]:
    r = theil_index(_cents(spark, values), "cents").collect()[0]
    return r.n, r.theil_index


def test_theil_zero_at_perfect_equality(spark):
    n, t = _theil(spark, [700] * 9)
    assert n == 9
    assert t == 0.0


def test_theil_scale_invariant(spark):
    vals = [100, 2500, 317, 40000, 9, 9, 777]
    _, t1 = _theil(spark, vals)
    _, t13 = _theil(spark, [13 * v for v in vals])
    # identical up to the two 6-decimal rounding hops
    assert abs(t1 - t13) < 2e-6
    assert t1 > 0


def test_theil_matches_direct_formula_and_concentration_limit(spark):
    vals = [1, 1, 1, 1, 10**9]  # near-total concentration, n=5
    n, t = _theil(spark, vals)
    sx = sum(vals)
    expected = sum(v * math.log(v * n / sx) for v in vals) / sx
    assert abs(t - expected) < 1e-4
    # approaches ln(n) as the top holder takes everything
    assert abs(t - math.log(n)) < 1e-4
    # zeros are excluded, not counted into n
    n0, t0 = _theil(spark, vals + [0, 0])
    assert n0 == 5 and abs(t0 - t) < 1e-9


def test_lorenz_buckets_exact_shares_and_invariants(spark):
    # values 1..10 into 5 buckets of 2: totals 3,7,11,15,19 over 55
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 11)], "tb bigint, v bigint"
    )
    out = lorenz_buckets(df, "v", "tb", buckets=5).collect()
    assert [r.bucket for r in out] == [1, 2, 3, 4, 5]
    assert [r.n_rows for r in out] == [2] * 5
    totals = [r.bucket_total for r in out]
    assert totals == [3, 7, 11, 15, 19]
    assert sum(totals) == 55
    assert [r.share_ppm for r in out] == [
        x * 10**6 // 55 for x in totals
    ]
    cums = [r.cum_share_ppm for r in out]
    assert cums == sorted(cums)  # monotone
    assert cums[-1] == 1_000_000  # exact, not 999999.99...
    assert cums == [c * 10**6 // 55 for c in [3, 10, 21, 36, 55]]


def test_lorenz_buckets_uneven_sizes_larger_first(spark):
    # SQL NTILE convention: 7 rows into 3 buckets -> sizes 3, 2, 2
    df = spark.createDataFrame(
        [(i, 1) for i in range(7)], "tb bigint, v bigint"
    )
    out = lorenz_buckets(df, "v", "tb", buckets=3).collect()
    assert [r.n_rows for r in out] == [3, 2, 2]


def test_bigram_pmi_hand_computed(spark):
    # doc1 = "x y x y", doc2 = "x z": unigrams x:3 y:2 z:1 (t=6),
    # bigrams (x,y):2 (y,x):1 (x,z):1 (bt=4)
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x z")], "doc_id bigint, text string"
    )
    out = bigram_pmi(docs, min_count=1, top_k=10).collect()
    got = {(r.tok_a, r.tok_b): (r.n_bigram, r.pmi) for r in out}
    assert got[("x", "y")] == (2, round(math.log(2 * 36 / (4 * 3 * 2)), 6))
    assert got[("y", "x")] == (1, round(math.log(1 * 36 / (4 * 2 * 3)), 6))
    assert got[("x", "z")] == (1, round(math.log(1 * 36 / (4 * 3 * 1)), 6))
    # ordering: desc pmi, then (tok_a, tok_b) asc on the ln(3) tie
    assert [(r.tok_a, r.tok_b) for r in out] == [
        ("x", "y"),
        ("x", "z"),
        ("y", "x"),
    ]


def test_bigram_pmi_min_count_filters(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x z")], "doc_id bigint, text string"
    )
    out = bigram_pmi(docs, min_count=2, top_k=10).collect()
    assert [(r.tok_a, r.tok_b, r.n_bigram) for r in out] == [("x", "y", 2)]


from retail_etl_pipeline_spark.functions.stats import kaplan_meier


def _km(spark, rows):
    life = spark.createDataFrame(rows, "t bigint, ev int")
    out = kaplan_meier(life).collect()
    return [(r.t_days, r.n_at_risk, r.n_events, r.survival) for r in out]


def test_kaplan_meier_hand_computed_with_censoring(spark):
    # classic worked example: events at t=1 (1 of 5 at risk) and t=3
    # (1 of 3 at risk — the t=2 censored subject LEFT the risk set
    # without an event); censored at t=2 and t=4; event at t=5 is the
    # last subject -> terminal S=0
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    out = _km(spark, rows)
    assert [(t, n, d) for t, n, d, _ in out] == [
        (1, 5, 1),
        (3, 3, 1),
        (5, 1, 1),
    ]
    s = {t: sv for t, _, _, sv in out}
    assert abs(s[1] - 4 / 5) < 1e-5
    assert abs(s[3] - (4 / 5) * (2 / 3)) < 1e-5
    assert s[5] == 0.0  # n == d at the terminal time: literal, not ln(0)


def test_kaplan_meier_censoring_changes_the_curve(spark):
    # same event times, but the t=2 subject is an EVENT instead of a
    # censor: S(3) must drop further — a naive ecdf that ignores the
    # ev flag would give identical curves
    censored = _km(spark, [(1, 1), (2, 0), (3, 1), (9, 0)])
    evented = _km(spark, [(1, 1), (2, 1), (3, 1), (9, 0)])
    sc = {t: sv for t, _, _, sv in censored}
    se = {t: sv for t, _, _, sv in evented}
    assert abs(sc[3] - (3 / 4) * (1 / 2)) < 1e-5
    assert abs(se[3] - (3 / 4) * (2 / 3) * (1 / 2)) < 1e-5
    assert se[3] < sc[3]
    # censor-only times never appear as curve rows
    assert 2 not in sc and 9 not in sc and 9 not in se


def test_kaplan_meier_ties_and_all_event_input(spark):
    # tied events: d=2 of n=3 at t=2 -> S = 1/3; terminal t=7 -> 0
    out = _km(spark, [(2, 1), (2, 1), (7, 1)])
    assert [(t, n, d) for t, n, d, _ in out] == [(2, 3, 2), (7, 1, 1)]
    assert abs(out[0][3] - 1 / 3) < 1e-5
    assert out[1][3] == 0.0


def test_hhi_monopoly_equal_shares_and_zero_total(spark):
    from retail_etl_pipeline_spark.functions.stats import hhi_ppm

    # the SAME kernel supplier_revenue_hhi runs, on hand-checkable groups
    rev = spark.createDataFrame(
        [("m", 1, 500), ("e", 1, 250), ("e", 2, 250), ("e", 3, 250),
         ("e", 4, 250), ("z", 1, 0), ("z", 2, 0)],
        "g string, k bigint, cents bigint",
    )
    out = {
        r.g: (r.n_units, r.total, r.hhi_ppm)
        for r in hhi_ppm(rev, ["g"], "cents").collect()
    }
    assert out["m"] == (1, 500, 1_000_000)  # monopoly
    assert out["e"] == (4, 1000, 250_000)  # 4 equal shares -> 1e6 / 4
    assert out["z"] == (2, 0, None)  # zero total: undefined, not 0


def test_kernels_are_empty_safe_and_km_single_subject(spark):
    # degenerate inputs must yield empty results, not runtime errors
    # (with_running_sum's driver-side offset fold sees zero partials)
    assert (
        kaplan_meier(spark.createDataFrame([], "t bigint, ev int")).collect()
        == []
    )
    ev = spark.createDataFrame([], "k bigint, cents bigint")
    assert lorenz_buckets(ev, "cents", "k").collect() == []
    assert theil_index(ev, "cents").collect() == []
    assert (
        weekly_streak_histogram(
            spark.createDataFrame([], "user_id bigint, day date")
        ).collect()
        == []
    )
    assert (
        consecutive_gap_stats(
            spark.createDataFrame([], "k bigint, d date, tb bigint"),
            "k",
            "d",
            "tb",
        ).collect()
        == []
    )
    # a single evented subject is its own terminal time: S = 0 exactly
    one = kaplan_meier(
        spark.createDataFrame([(5, 1)], "t bigint, ev int")
    ).collect()
    assert [(r.t_days, r.n_at_risk, r.n_events, r.survival) for r in one] == [
        (5, 1, 1, 0.0)
    ]
