"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real inventory lives in ``retail_etl_pipeline_spark.registry``; this
module is a thin adapter.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def _last_checked_round() -> dict[str, int]:
    """name -> most recent round with a GREEN driver CORRECTNESS row.

    The driver verifies a bounded prefix of ``queries()`` per round (r1
    stopped at 50 of 99 entries), so ordering matters: names it has never
    checked must come first. Reading the committed CORRECTNESS_r*.json
    files makes the rotation self-maintaining — each round the
    least-recently-verified queries move to the front of the window.
    A red row does NOT count as seen: a query that failed its last driver
    check stays at the front of the window until a green row lands (r2:
    two representation failures were fixed but would otherwise have
    rotated to the back and stayed red in the record for several rounds).
    """
    seen: dict[str, int] = {}
    for p in Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.stem)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if green:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The 13-metric weekly retail summary (reference ``df_final``,
    ``Data Transformation.py:156-175``) as a single aggregation pass.
    """
    from retail_etl_pipeline_spark.plans.weekly_summary import weekly_summary

    return weekly_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    never-driver-checked first (then least-recently-checked) so the
    driver's bounded per-round verification window rotates over the whole
    inventory across rounds."""
    from retail_etl_pipeline_spark.registry import QUERIES

    seen = _last_checked_round()
    registry_pos = {name: i for i, name in enumerate(QUERIES)}
    # never-checked first; within never-checked, OLDEST registry entries
    # first: once the backlog fills the driver's ~50-query window, new
    # additions must queue BEHIND it — the earlier newest-first tiebreak
    # would displace the longest-waiting queries out of the window every
    # time an operator ships, so the backlog would never clear
    names = sorted(
        QUERIES, key=lambda n: (seen.get(n, -1), registry_pos[n])
    )
    return {name: QUERIES[name] for name in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only for
    genuinely non-SQL-expressible ops -> driver does a rows-only check)."""
    from retail_etl_pipeline_spark.registry import ORACLES

    return dict(ORACLES)
