"""Property tests for functions/stats.py against exact Python oracles.

Each kernel claims an algebraic identity (Gini rank form == textbook
mean-absolute-difference form; KS prefix-sum form == sup over ecdf
gaps; moment-sum slope == exact rational OLS). Hypothesis searches for
integer inputs where the distributed formulation and the
fractions-based oracle disagree — any divergence is a real bug, not
float noise, because both sides are exact.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retail_etl_pipeline_spark.functions.stats import (
    gini_ppm,
    ks_statistic,
    moment_sums,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=10**7), min_size=2, max_size=25)
)
def test_gini_rank_form_equals_mean_absolute_difference(spark, xs):
    # textbook form: sum |xi - xj| / (2 n^2 mu), exact in Fractions
    n = len(xs)
    total = sum(xs)
    assume(total != 0)  # all-zero spend: Gini undefined (0/0)
    mad = sum(abs(a - b) for a in xs for b in xs)  # includes both orders
    expected = (Fraction(mad, 2 * n * n) / Fraction(total, n)) * 1_000_000
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "k long, cents long"
    )
    row = gini_ppm(df, "cents", "k").collect()[0]
    assert row.n == n
    assert row.total == total
    # kernel floors (exact integer div); the oracle fraction floors too
    assert row.gini_ppm == expected.numerator // expected.denominator


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
)
def test_ks_prefix_sum_form_equals_ecdf_sup(spark, a, b):
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    best, best_at = -1, None
    ca = cb = 0
    for v in values:
        ca += sum(1 for x in a if x == v)
        cb += sum(1 for x in b if x == v)
        gap = abs(ca * nb - cb * na)
        if gap > best:
            best, best_at = gap, v
    expected_ppm = best * 1_000_000 // (na * nb)
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v long, a boolean")
    row = ks_statistic(df, "v", "a").collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.ks_ppm == expected_ppm
    assert row.at_value == best_at


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=3,
        max_size=25,
    )
)
def test_moment_slope_equals_exact_rational_ols(spark, pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sxx = sum(x * x for x, _ in pts)
    assume(n * sxx - sx * sx != 0)  # all-equal x: slope undefined
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    expected = Fraction((n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx)
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "g string, x long, y long"
    )
    m = moment_sums(df, ["g"], F.col("x"), F.col("y"))
    got = m.select(
        F.expr(
            "CAST(((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)"
            " AS BIGINT)"
        ).alias("slope")
    ).collect()[0]
    # Spark decimal `div` truncates toward zero; match exactly
    exact = expected.numerator // expected.denominator
    if expected < 0 and expected.numerator % expected.denominator != 0:
        exact += 1  # floor -> trunc adjustment for negatives
    assert got.slope == exact


def test_moment_sums_partition_invariance(spark):
    """The exactness contract: identical results at any partitioning."""
    pts = [("g", i % 97, (i * 31) % 1009 - 500) for i in range(500)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    one = moment_sums(df.coalesce(1), ["g"], F.col("x"), F.col("y"))
    many = moment_sums(
        df.repartition(13), ["g"], F.col("x"), F.col("y")
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**7), min_size=1, max_size=23
    ),
    st.integers(min_value=1, max_value=7),
)
def test_lorenz_buckets_match_exact_python_oracle(spark, xs, buckets):
    from retail_etl_pipeline_spark.functions.stats import lorenz_buckets

    assume(sum(xs) != 0)  # all-zero: shares are 0/0
    n = len(xs)
    # SQL NTILE over ascending (value, tiebreak): first n % buckets
    # buckets get ceil(n/buckets) rows, the rest floor(n/buckets) —
    # empty buckets simply don't appear
    order = sorted(range(n), key=lambda i: (xs[i], i))
    sizes = [
        (n // buckets) + (1 if b < n % buckets else 0)
        for b in range(buckets)
    ]
    exp_rows, exp_totals, pos = [], [], 0
    for sz in sizes:
        if sz == 0:
            continue
        chunk = order[pos : pos + sz]
        pos += sz
        exp_rows.append(sz)
        exp_totals.append(sum(xs[i] for i in chunk))
    total = sum(exp_totals)
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "k long, cents long"
    )
    out = lorenz_buckets(df, "cents", "k", buckets=buckets).collect()
    assert [r.n_rows for r in out] == exp_rows
    assert [r.bucket_total for r in out] == exp_totals
    assert [r.share_ppm for r in out] == [
        t * 1_000_000 // total for t in exp_totals
    ]
    cum = 0
    exp_cum = []
    for t in exp_totals:
        cum += t
        exp_cum.append(cum * 1_000_000 // total)
    assert [r.cum_share_ppm for r in out] == exp_cum
    assert out[-1].cum_share_ppm == 1_000_000


def test_kruskal_wallis_textbook_and_properties(spark):
    """H on the no-tie textbook partition {1-3},{4-6},{7-9} is exactly
    7.2 (12/90*(12+75+192)-30); a two-group KW must agree with the
    normal-equivalent identity H = z² asymptotically — here checked
    against the exact MWU doubling instead: for k=2 with no ties,
    H = (u2/2 - n1*n2/2)² * 12 / (n1*n2*(N+1)) ... verified numerically
    via the package's own mann_whitney_u2. Ties: duplicating every
    value halves nothing silently — corrected H > raw H."""
    from retail_etl_pipeline_spark.functions.stats import (
        kruskal_wallis,
        mann_whitney_u2,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6),
         ("c", 7), ("c", 8), ("c", 9)],
        "g string, v long",
    )
    row = kruskal_wallis(df, "v", "g").first()
    assert row["n_groups"] == 3 and row["n_total"] == 9
    assert abs(row["h"] - 7.2) < 1e-9
    assert row["h_tie_corrected"] == row["h"]  # no ties

    # k=2: H equals the normalized-U statistic squared (no ties)
    two = spark.createDataFrame(
        [("a", 10), ("a", 30), ("a", 50), ("b", 20), ("b", 40),
         ("b", 60), ("b", 70)],
        "g string, v long",
    )
    h2 = kruskal_wallis(two, "v", "g").first()["h"]
    u = mann_whitney_u2(
        two.select("v", (F.col("g") == "a").alias("f")), "v", "f"
    ).first()
    n1, n2 = u["n_a"], u["n_b"]
    n = n1 + n2
    z2 = ((u["u2_a"] / 2 - n1 * n2 / 2) ** 2) * 12 / (n1 * n2 * (n + 1))
    assert abs(h2 - z2) < 1e-6

    # ties raise the corrected H above the raw H
    tied = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 3), ("b", 3)],
        "g string, v long",
    )
    t = kruskal_wallis(tied, "v", "g").first()
    assert t["h_tie_corrected"] > t["h"]


def test_kruskal_wallis_empty_input_matches_oracle(spark):
    """Degenerate-input parity (r8 ADVICE): zero rows must yield
    (n_groups=0, n_total=0, h=NULL, h_tie_corrected=NULL) from BOTH the
    Spark kernel and the DuckDB oracle — the oracle's SUM over zero
    rows previously left n_total NULL where the kernel coalesces to 0."""
    import duckdb

    from retail_etl_pipeline_spark.functions.stats import kruskal_wallis

    empty = spark.createDataFrame([], "g string, v long")
    row = kruskal_wallis(empty, "v", "g").first()
    assert (
        row["n_groups"],
        row["n_total"],
        row["h"],
        row["h_tie_corrected"],
    ) == (0, 0, None, None)

    from __spark_entry__ import oracle_sql

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("lineitem", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf}/{t}.parquet') WHERE false"
        )
    (orow,) = con.execute(oracle_sql()["nation_revenue_kruskal"]).fetchall()
    assert orow == (0, 0, None, None)


def test_mood_median_test_textbook_and_robustness(spark):
    """2x2 textbook check: groups a=(1,2,3,4), b=(5,6,7,8) — pooled
    lower median 4, a has 4 of 4 below-or-equal, b has 0 of 4; all
    margins 4/4 so chi2 = sum over 4 cells of (2-obs-exp)^2/2 = 8.
    Robustness: blowing one value up to 10^9 must not change the
    statistic (only which side of the median each count falls on
    matters), unlike rank-based H which shifts."""
    from retail_etl_pipeline_spark.functions.stats import mood_median_test

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 4),
         ("b", 5), ("b", 6), ("b", 7), ("b", 8)],
        "g string, v long",
    )
    row = mood_median_test(df, "v", "g").first()
    assert row["n_groups"] == 2 and row["n_total"] == 8
    assert row["pooled_median"] == 4 and row["dof"] == 1
    assert abs(row["chi2"] - 8.0) < 1e-9

    wild = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 4),
         ("b", 5), ("b", 6), ("b", 7), ("b", 10**9)],
        "g string, v long",
    )
    w = mood_median_test(wild, "v", "g").first()
    assert w["chi2"] == row["chi2"] and w["pooled_median"] == 4

    # degenerate margins: all values equal -> everything <= median,
    # GT margin empty -> chi2 NULL, median still reported
    const = spark.createDataFrame(
        [("a", 7), ("a", 7), ("b", 7)], "g string, v long"
    )
    c = mood_median_test(const, "v", "g").first()
    assert c["chi2"] is None and c["pooled_median"] == 7

    # empty input
    empty = spark.createDataFrame([], "g string, v long")
    e = mood_median_test(empty, "v", "g").first()
    assert (e["n_groups"], e["n_total"], e["pooled_median"], e["dof"],
            e["chi2"]) == (0, 0, None, None, None)


def _jt_brute(rows):
    """Doubled Jonckheere-Terpstra by definition: 2·Σ_{i<j} U_ij with
    the ½-tie convention — the O(n²) oracle for the kernel's grid form."""
    j2 = 0
    for g1, x in rows:
        for g2, y in rows:
            if g1 < g2:
                if x < y:
                    j2 += 2
                elif x == y:
                    j2 += 1
    return j2


def test_jonckheere_terpstra_textbook_brute_and_edges(spark):
    """Perfectly separated ascending groups {1-3},{4-6},{7-9}: every
    cross-group pair ascends, J = 27, and with no ties the null
    variance is 20.25, so z = (27 - 13.5) / 4.5 = exactly 3. A tied,
    interleaved dataset must match the O(n²) brute-force doubling, and
    reversing the group order must negate z (antisymmetry of the trend
    statistic). Empty input returns zeros/NULL — and the
    revenue_trend_jt ORACLE agrees on empty views (the r7 ADVICE
    degenerate-parity discipline)."""
    import duckdb

    from retail_etl_pipeline_spark.functions.stats import (
        jonckheere_terpstra,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (2, 4), (2, 5), (2, 6),
         (3, 7), (3, 8), (3, 9)],
        "g int, v long",
    )
    row = jonckheere_terpstra(df, "v", "g").first()
    assert row["n_groups"] == 3 and row["n_total"] == 9
    assert row["jt2"] == 54
    assert abs(row["z"] - 3.0) < 1e-9

    tied_rows = [
        (1, 5), (1, 7), (1, 7), (1, 12), (2, 7), (2, 9), (2, 12),
        (3, 9), (3, 9), (3, 15), (3, 5),
    ]
    tied = spark.createDataFrame(tied_rows, "g int, v long")
    t = jonckheere_terpstra(tied, "v", "g").first()
    assert t["jt2"] == _jt_brute(tied_rows)
    rev = spark.createDataFrame(
        [(-g, v) for g, v in tied_rows], "g int, v long"
    )
    r = jonckheere_terpstra(rev, "v", "g").first()
    assert abs(r["z"] + t["z"]) < 1e-9

    # all values tied -> variance 0 -> z NULL, jt2 still exact
    const = spark.createDataFrame(
        [(1, 7), (1, 7), (2, 7)], "g int, v long"
    )
    c = jonckheere_terpstra(const, "v", "g").first()
    assert c["z"] is None and c["jt2"] == _jt_brute([(1, 7), (1, 7), (2, 7)])

    empty = spark.createDataFrame([], "g int, v long")
    e = jonckheere_terpstra(empty, "v", "g").first()
    assert (e["n_groups"], e["n_total"], e["jt2"], e["z"]) == (0, 0, 0, None)

    from __spark_entry__ import oracle_sql

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM"
        f" read_parquet('{sf}/lineitem.parquet') WHERE false"
    )
    (orow,) = con.execute(oracle_sql()["revenue_trend_jt"]).fetchall()
    assert orow == (0, 0, 0, None)
