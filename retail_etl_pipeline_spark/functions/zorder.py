"""Z-order (Morton-curve) clustering for multi-dimensional file pruning.

A 100 TB table filtered on TWO OR MORE columns can't be range-sorted to
serve both predicates: sorting by (a, b) gives perfect parquet min/max
pruning on ``a`` and nearly none on ``b``. Interleaving the bits of the
(scaled) dimensions into one Morton key and range-sorting by THAT bounds
every file's extent in EVERY dimension at once — each file covers a
small hyper-rectangle, so row-group min/max stats skip most files for
any conjunctive box predicate. This is the standard lakehouse
``OPTIMIZE ... ZORDER BY`` layout, built here from public Spark
primitives only:

- :func:`zvalue` is a pure codegen expression — shift/mask/or terms, no
  UDF, constant-folded by Catalyst;
- :func:`zorder_write` is ``repartitionByRange(z) +
  sortWithinPartitions(z)`` then a plain parquet write — one range
  shuffle, P parallel writer tasks, no single-task stage.

Dimensions must be mapped to non-negative ints < 2**bits first
(:func:`scale_to_bits` for bounded numerics; percent_rank/NTILE for
skewed ones). Total key width ``bits * n_cols`` must fit a BIGINT
(<= 63).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine-map a bounded numeric into the integer grid [0, 2**bits).

    ``lo``/``hi`` are the (inclusive) domain bounds — plan constants, e.g.
    from table statistics. Out-of-range values clamp to the grid edges, so
    a stale bound degrades locality but never correctness.
    """
    if not hi > lo:
        raise ValueError(f"scale_to_bits needs hi > lo, got [{lo}, {hi}]")
    cells = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    idx = F.floor(scaled * cells + F.lit(0.5)).cast("bigint")
    return F.greatest(F.lit(0), F.least(F.lit(cells), idx))


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: bit j of column i lands at output bit ``j*n + i``.

    Pure shift/mask/or expression tree (``2 * bits * n`` leaf ops) —
    whole-stage-codegen folds it into straight-line JVM code; no Python
    in the hot path.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds BIGINT range")
    out = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        src = c.cast("bigint")
        for j in range(bits):
            bit = F.shiftright(src, j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB replica of :func:`zvalue` — keep in sync (same bit layout)."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {j}) & 1) << {j * n + i})"
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    dims: dict[str, Column],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Cluster ``df`` on the Morton key of ``dims`` and write parquet.

    ``dims`` maps dimension names to ALREADY-SCALED integer columns (see
    :func:`scale_to_bits`). Plan: one ``repartitionByRange`` on the key
    (parallel range-partitioned sort, P tasks), partition-local sort,
    parquet write — every file covers a contiguous z-range, i.e. a small
    box in every dimension, which is what parquet min/max skipping needs.
    """
    z = zvalue(list(dims.values()), bits)
    p = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("_z", z)
        .repartitionByRange(p, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
