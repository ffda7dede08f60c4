"""Snapshot reconciliation (anti-entropy table diff).

Validating a migration or a replicated pipeline at 100 TB cannot compare
rows: it compares FINGERPRINTS. Each side reduces to (key, md5-of-values)
inside its scan stage, the full-outer join moves 24-byte pairs instead of
full rows, and the result classifies every key as added / removed /
changed / unchanged. One shuffle per side on the key — the same cost as
any keyed join — and the fingerprint is md5 over a canonical
field-separated string, reproducible in any engine (the DuckDB oracle
replays it verbatim).

Caveat the API enforces by documentation: fingerprint inputs must be
cast to engine-stable strings first (ints/strings/dates are stable;
raw doubles are NOT — their VARCHAR rendering differs between engines;
floor/round them to integers or format them explicitly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: unit separator — never appears in normal data, keeps ('a','bc') and
#: ('ab','c') distinct
_SEP = "\x1f"


def row_fingerprint(cols: list[Column]) -> Column:
    """md5 of the canonical concatenation. concat_ws SKIPS null fields
    (identically in Spark and DuckDB), which makes (NULL, 'x') collide
    with ('x', NULL); callers needing NULL-vs-empty distinction coalesce
    to an explicit sentinel first."""
    return F.md5(F.concat_ws(_SEP, *[c.cast("string") for c in cols]))


def row_fingerprint_sql(cols: list[str]) -> str:
    cast = ", ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return f"md5(concat_ws(chr(31), {cast}))"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[Column],
) -> DataFrame:
    """Classify every key: one row per status with its count.

    ``value_cols`` are the fingerprinted value expressions (engine-stable
    string-castable — see module doc). Both inputs reduce to
    (key..., fp) projections before the join, so the exchange carries
    fingerprints, never payloads. ``key_cols`` must be unique per side
    (the usual snapshot contract); duplicate keys would cross-multiply
    in the full-outer join.
    """
    o = old.select(*key_cols, row_fingerprint(value_cols).alias("_fp_old"))
    n = new.select(*key_cols, row_fingerprint(value_cols).alias("_fp_new"))
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), "added")
        .when(F.col("_fp_new").isNull(), "removed")
        .when(F.col("_fp_old") != F.col("_fp_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
