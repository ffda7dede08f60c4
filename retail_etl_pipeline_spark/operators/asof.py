"""As-of join (point-in-time join) — a custom operator Spark lacks
natively, composed from built-ins (union + ignore-nulls window fill).

For every left row, attach the value of the most recent right row with
``right.ts <= left.ts`` for the same key — the canonical time-series /
feature-store lookup ("state as of event time"). Generalizes the
reference's daily-snapshot -> end-of-period pattern (W1) from fixed weeks
to per-row event time.

Plan shape (scale analysis): tag both inputs, UNION, ONE window pass per
key ordered by (ts, side, tiebreak) carrying the last non-null right value
forward, keep left rows. Cost = one shuffle on the key + a per-key sort —
same complexity as a sort-merge join, with no range-explosion: each left
row emits exactly once (a naive range join explodes to every earlier right
row before picking the max).

Equal timestamps: the right row sorts BEFORE the left row (side 0 < 1), so
a state update at exactly t is visible to an event at t; remaining ties
break on the unique ``tiebreak`` column. The oracle mirrors the identical
window, so the comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Left as-of join: all left columns + ``out_col`` = latest
    at-or-before ``value_col`` from ``right`` (NULL when no prior row)."""
    lt = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(right.dtypes)[value_col]).alias("_pv"),
    )
    rt_cols = [
        F.col(key),
        F.col(ts),
        F.col(tiebreak),
        F.lit(0).alias("_side"),
        F.col(value_col).alias("_pv"),
    ]
    rt = right.select(*rt_cols)
    # align schemas for the union: left's extra columns become NULL on the
    # right side
    for c in left.columns:
        if c not in {key, ts, tiebreak}:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    combined = lt.unionByName(rt)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"), F.col(tiebreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.withColumn(
        out_col, F.last("_pv", ignorenulls=True).over(w)
    )
    return filled.where(F.col("_side") == 1).select(*left.columns, out_col)
