"""Local replica of the driver's Spark-vs-DuckDB comparison.

Compares row count, column names, and order-insensitive values (columns
sorted by name, rows sorted after normalization). Floats are compared to a
tolerance and also rounded before hashing so last-ulp accumulation-order
differences don't read as mismatches.

Hardened after round 2: the driver canonicalizes through pandas
(``sort_values`` over all columns, then a value hash), which (a) raises
``TypeError: unhashable type`` on list/array cells and (b) hashes
``Decimal`` cells differently on the Spark and DuckDB sides even when the
values are numerically equal (r2: ``segment_priority_lists`` ERROR,
``weekly_sales_rollup_decimal`` hash FAIL — both replica-green under the
old, forgiving normalizer).  This replica is now *stricter* than before:

* list / tuple / ndarray / dict / set / bytes cells are reported as
  ``driver-unrepresentable`` failures (no list→tuple forgiveness);
* ``Decimal`` cells are reported as ``driver-unrepresentable`` failures
  (no Decimal→float forgiveness) — queries must cast terminal decimal
  projections to double on BOTH sides;
* the raw result is additionally pushed through the same pandas
  ``sort_values`` call the driver uses, so any unhashable cell type we
  didn't anticipate fails here first.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pandas as pd

#: cell types the driver's pandas canonicalizer cannot hash consistently
#: (or at all) — any query emitting these must normalize its projection.
_UNREPRESENTABLE = (Decimal, list, tuple, dict, set, frozenset, bytes, bytearray)


def _unrepresentable_columns(rows: list[tuple], columns: list[str]) -> list[str]:
    """Column names holding cell types the driver cannot canonicalize.

    The first non-null cell of each column is representative (a column has
    one Spark/DuckDB type).
    """
    bad: list[str] = []
    for i, col in enumerate(columns):
        v = next((r[i] for r in rows if r[i] is not None), None)
        if v is not None and isinstance(v, _UNREPRESENTABLE):
            bad.append(f"{col}:{type(v).__name__}")
    return bad


def _driver_sort_check(rows: list[tuple], columns: list[str]) -> str | None:
    """Reproduce the driver's pandas ``sort_values`` canonicalization step.

    Returns an error string if pandas raises (the driver would record the
    query as ERROR), else None.
    """
    if not rows:
        return None
    try:
        pdf = pd.DataFrame(rows, columns=list(columns))
        pdf.sort_values(by=list(columns))
    except Exception as exc:  # noqa: BLE001 — mirror driver behavior
        return f"driver canonicalizer would fail: {exc.__class__.__name__}: {exc}"
    return None


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
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
    for side, rows, cols in (("spark", s_rows, s_cols), ("duck", d_rows, d_cols)):
        bad = _unrepresentable_columns(rows, cols)
        if bad:
            problems.append(f"driver-unrepresentable {side} column types: {bad}")
        err = _driver_sort_check(rows, cols)
        if err:
            problems.append(f"{side}: {err}")
    if problems:
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
