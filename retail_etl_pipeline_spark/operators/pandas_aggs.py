"""GROUPED_AGG Arrow pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations``: the
pandas-UDF type-hint inference reads the function's evaluated
annotations, and PEP-563 stringified hints break it (the registry, like
the rest of the package, enables the future import).

These are Arrow-batched per GROUP — never per-row Python — and exist
for aggregations SQL can't express (plus API-surface coverage); when a
window/aggregate form exists (as for the weighted median), prefer it at
scale — it stays in codegen.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_median_lower(
    price: pd.Series, weight: pd.Series, key: pd.Series
) -> float:
    """LOWER weighted median: the smallest price whose cumulative weight
    reaches half the total, cumulating in (price, key) order — the same
    rule the SQL-window oracle implements, so the convention is pinned
    on both engines."""
    df = pd.DataFrame({"p": price, "w": weight, "k": key}).sort_values(
        ["p", "k"], kind="mergesort"
    )
    cum = df["w"].cumsum()
    total = int(df["w"].sum())
    return float(df["p"][2 * cum >= total].iloc[0])
