"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

This is the driver-facing inventory (SURVEY.md §2): every implemented
operator has a named query here, a Spark implementation (taking
``(spark, sf_dir)``) and — when SQL-expressible — an exactly-equivalent
ANSI SQL string the DuckDB oracle runs on the same parquet tables.

Alignment rules (SURVEY.md §5, FIXTURES.md):
- every computed column aliased identically on both sides;
- money sums/ratios rounded via DECIMAL (see functions.metrics — double
  rounding is not cross-engine-stable at exact ties) on both sides;
- ``NULLIF(denom, 0)`` in SQL to match Spark's null-on-divide-by-zero;
- ``CAST(SUM(int) AS BIGINT)`` in SQL (DuckDB sums ints to HUGEINT);
- week keys cast to INTEGER on both sides;
- deterministic tie-breaks on every window/top-k.
"""

from __future__ import annotations

# The registrations live in queries/part*.py (split round 7 — the
# monolith crossed 10k lines); this module remains the public face:
# importing it populates QUERIES/ORACLES in the ORIGINAL order
# (queries/__init__.py imports parts in sequence; order is
# load-bearing for the driver correctness rotation).
from .queries._base import ORACLES, QUERIES, QueryFn  # noqa: F401
from . import queries  # noqa: F401  (registration side effects)


# Round-6 surface: the 24 queries staged in registry_next.py during round 5
# (attribution quartet, KM/Greenwood survival family, MWU/CUSUM/KS drift,
# Atkinson/weighted-Gini/Theil inequality, Markov steady-state, ABC
# migration, chained Laspeyres, HHI trend, basket entropy, stockout
# streaks, lapsed customers).  They were held out of this registry while
# the driver's ~50-query CORRECTNESS window drained the round-5 backlog
# (registry_next.py module doc); round 6 registers them by merging the
# staging dicts here rather than duplicating 2k lines of source.  The
# implementations, oracle pairs, and their sf0.001 parity tests
# (tests/test_registry_next_parity.py) are unchanged.
# ---------------------------------------------------------------------------


def _merge_round6_surface() -> None:
    from . import registry_next as _r6

    for _name in _r6.QUERIES:
        # same loud-failure contract as registry_next._stage: a silent
        # dict overwrite here would shadow a registered query with a
        # same-named staged one (or vice versa) and the oracle record
        # would quietly test the wrong implementation.
        if _name in QUERIES:
            raise ValueError(
                f"round-6 merge collision with registered query: {_name}"
            )
        QUERIES[_name] = _r6.QUERIES[_name]
        ORACLES[_name] = _r6.ORACLES[_name]


_merge_round6_surface()
