"""Local replica of the driver's Spark-vs-DuckDB comparison.

Compares row count, column names, and order-insensitive values (columns
sorted by name, rows sorted after normalization). Floats are compared to a
tolerance and also rounded before hashing so last-ulp accumulation-order
differences don't read as mismatches.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def spark_rows(df) -> tuple[list[tuple], list[str]]:
    return [tuple(r) for r in df.collect()], list(df.columns)


def duck_rows(con, sql: str) -> tuple[list[tuple], list[str]]:
    rel = con.sql(sql)
    return rel.fetchall(), list(rel.columns)


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    s_rows, s_cols = spark_rows(spark_df)
    d_rows, d_cols = duck_rows(con, sql)
    problems: list[str] = []
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    s_norm = normalize(s_rows, [c.lower() for c in s_cols])
    d_norm = normalize(d_rows, [c.lower() for c in d_cols])
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ][:5]
        only_s = [r for r in s_norm[:2000] if r not in set(d_norm[:2000])][:3]
        problems.append(
            f"values differ; first row-aligned diffs: {diffs!r}; "
            f"spark-only sample: {only_s!r}"
        )
    return problems
