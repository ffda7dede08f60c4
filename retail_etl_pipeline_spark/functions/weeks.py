"""Week-key derivation (SURVEY.md §2.9 Q8).

The reference takes ``yr_wk_num`` from the calendar dimension
(``Data Ingestion.sql:74``); when no calendar table exists (the driver
fixtures have none) we derive an ISO week key ``isoyear*100 + isoweek``.
Using the ISO year (not the calendar year) keeps the key correct at year
boundaries — 1996-12-31 belongs to ISO week 1997W01, not 1996W01.

The DuckDB-oracle equivalent is ``isoyear(d)*100 + weekofyear(d)`` — both
engines implement the same ISO-8601 definition, so the values agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def yr_wk_num(date_col: Column | str) -> Column:
    """ISO week key ``yyyyww`` as an INT (e.g. 199702)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    iso_year = F.extract(F.lit("YEAROFWEEK"), c)
    iso_week = F.weekofyear(c)
    return (iso_year * F.lit(100) + iso_week).cast("int")


#: DuckDB SQL fragment equivalent to :func:`yr_wk_num` — keep in sync.
YR_WK_NUM_SQL = "CAST(isoyear({d}) * 100 + weekofyear({d}) AS INTEGER)"
