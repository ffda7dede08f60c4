"""Unit tests for the attribution kernels (operators/behavior.py) on
synthetic journeys — the cases the fixture can't pin individually:
exact lookback boundary, untouched purchases, single/double/4-touch
position credit, and per-purchase credit conservation."""

from __future__ import annotations

from datetime import datetime, timedelta

from retail_etl_pipeline_spark.operators.behavior import (
    ATTRIBUTION_LOOKBACK_US,
    attribute_last_touch,
    attribute_linear,
    attribute_u_shaped,
)

T0 = datetime(2024, 3, 1, 12, 0, 0)
SEVEN_D = timedelta(microseconds=ATTRIBUTION_LOOKBACK_US)
EPS = timedelta(microseconds=1)

_ROWS = [
    # user 1: click -> view -> purchase (two touches)
    (1, T0, 1, "click"),
    (2, T0 + timedelta(hours=1), 1, "view"),
    (3, T0 + timedelta(hours=2), 1, "purchase"),
    # user 2: touch 8 days before the purchase -> outside lookback
    (10, T0, 2, "signup"),
    (11, T0 + timedelta(days=8), 2, "purchase"),
    # user 3: single touch inside
    (20, T0, 3, "signup"),
    (21, T0 + timedelta(days=1), 3, "purchase"),
    # user 4: four touches -> first/middles/last
    (30, T0, 4, "click"),
    (31, T0 + timedelta(minutes=1), 4, "view"),
    (32, T0 + timedelta(minutes=2), 4, "click"),
    (33, T0 + timedelta(minutes=3), 4, "error"),
    (34, T0 + timedelta(minutes=4), 4, "purchase"),
    # user 5: purchase with no prior event at all
    (40, T0, 5, "purchase"),
    # user 6: touch at EXACTLY the lookback boundary -> attributed (<=)
    (50, T0, 6, "click"),
    (51, T0 + SEVEN_D, 6, "purchase"),
    # user 7: one microsecond beyond the boundary -> none
    (60, T0, 7, "view"),
    (61, T0 + SEVEN_D + EPS, 7, "purchase"),
]


def _events(spark):
    return spark.createDataFrame(
        _ROWS, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_last_touch_credit(spark):
    got = {
        r.attributed_to: r.n_purchases
        for r in attribute_last_touch(_events(spark)).collect()
    }
    assert got == {"view": 1, "signup": 1, "error": 1, "click": 1, "none": 3}


def test_linear_credit(spark):
    got = {
        r.channel: (r.n_touches, r.credit_ppm)
        for r in attribute_linear(_events(spark)).collect()
    }
    assert got == {
        "click": (4, 2_000_000),   # 500k (u1) + 2x250k (u4) + 1e6 (u6)
        "view": (2, 750_000),      # 500k (u1) + 250k (u4)
        "signup": (1, 1_000_000),  # u3 single touch
        "error": (1, 250_000),     # u4 quarter share
    }
    # conservation: total credit == 1e6 per fully-attributed purchase
    # (u1, u3, u4, u6 -> 4e6 exactly; 4 touches divide 1e6 evenly)
    assert sum(c for _n, c in got.values()) == 4_000_000


def test_u_shaped_credit(spark):
    got = {
        r.channel: (r.n_touches, r.credit_ppm)
        for r in attribute_u_shaped(_events(spark)).collect()
    }
    assert got == {
        # u1 two-touch 500k + u4 first 400k + u4 middle 100k + u6 1e6
        "click": (4, 2_000_000),
        "view": (2, 600_000),      # u1 500k + u4 middle 100k
        "signup": (1, 1_000_000),
        "error": (1, 400_000),     # u4 last
    }
    assert sum(c for _n, c in got.values()) == 4_000_000


# ---------------------------------------------------------------------------
# markov_power_iteration (behavior.py) vs an exact Python mirror
# ---------------------------------------------------------------------------


def test_markov_power_iteration_matches_python_mirror(spark):
    from retail_etl_pipeline_spark.operators.behavior import (
        MARKOV_SCALE,
        markov_power_iteration,
    )

    # two users, three types, deterministic sequences
    seqs = {1: ["a", "b", "a", "c", "a"], 2: ["b", "c", "b", "a", "b", "c"]}
    rows, eid = [], 0
    for uid, seq in seqs.items():
        for i, t in enumerate(seq):
            rows.append((eid, T0 + timedelta(minutes=i), uid, t))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r.event_type: r.mass_fp
        for r in markov_power_iteration(ev, iterations=5).collect()
    }
    spark.catalog.clearCache()  # the kernel persists the transition relation

    # exact integer mirror of the fixed-point recurrence
    from collections import Counter

    c: Counter = Counter()
    for seq in seqs.values():
        for x, y in zip(seq, seq[1:]):
            c[(x, y)] += 1
    rowsum: Counter = Counter()
    for (x, _y), n in c.items():
        rowsum[x] += n
    mass = {t: MARKOV_SCALE for t in "abc"}
    for _ in range(5):
        new: dict[str, int] = {}
        for (x, y), n in c.items():
            new[y] = new.get(y, 0) + (mass[x] * n) // rowsum[x]
        mass = new
    assert got == mass
    # floor-only loss: total mass never exceeds the start, and the
    # per-round loss is bounded by the number of transition edges
    assert sum(mass.values()) <= 3 * MARKOV_SCALE
    assert 3 * MARKOV_SCALE - sum(mass.values()) <= 5 * len(c)


def test_first_touch_credit(spark):
    from retail_etl_pipeline_spark.operators.behavior import (
        attribute_first_touch,
    )

    got = {
        r.attributed_to: r.n_purchases
        for r in attribute_first_touch(_events(spark)).collect()
    }
    # u1 first=click, u3 signup, u4 first=click, u6 click (boundary),
    # none: u2 (outside), u5 (no touch), u7 (1us beyond)
    assert got == {"click": 3, "signup": 1, "none": 3}


def test_first_and_last_touch_totals_agree(spark):
    """Both single-touch models partition the same purchase set: their
    n_purchases totals must be identical."""
    from retail_etl_pipeline_spark.operators.behavior import (
        attribute_first_touch,
        attribute_last_touch,
    )

    ev = _events(spark)
    first_total = sum(
        r.n_purchases for r in attribute_first_touch(ev).collect()
    )
    last_total = sum(
        r.n_purchases for r in attribute_last_touch(ev).collect()
    )
    assert first_total == last_total == 7


# ---------------------------------------------------------------------------
# basket_entropy_by_size (behavior.py) — exact synthetic baskets
# ---------------------------------------------------------------------------


def test_basket_entropy_known_compositions(spark):
    import math

    from retail_etl_pipeline_spark.operators.behavior import (
        basket_entropy_by_size,
    )

    rows = (
        [(100, "x")] * 4                      # size 4, one class: H = 0
        + [(200, "x")] * 2 + [(200, "y")] * 2  # size 4, 2+2: H = ln 2
        + [(300, c) for c in "wxyz"]           # size 4, uniform: H = ln 4
        + [(400, "x"), (400, "y")]             # size 2: H = ln 2
    )
    df = spark.createDataFrame(rows, "order_key long, item_class string")
    got = {r.basket_size: r for r in basket_entropy_by_size(df).collect()}
    assert set(got) == {2, 4}
    assert got[2].n_orders == 1
    assert abs(got[2].avg_entropy - math.log(2)) < 5e-6
    assert got[4].n_orders == 3
    expected4 = (0.0 + math.log(2) + math.log(4)) / 3
    assert abs(got[4].avg_entropy - expected4) < 5e-6
