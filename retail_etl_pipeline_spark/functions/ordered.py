"""Scale-safe total-order operators: exact global rank, exact NTILE, and
exact running (prefix) sums WITHOUT an empty-partition window.

Spark executes a window whose ``partitionBy`` is empty by moving EVERY
row into a single partition (``WindowExec`` requires the full frame in
one task) — fine at fixture scale, a one-task sort of the whole relation
at 100 TB. These helpers replace that shape with the classic two-level
decomposition:

1. ``repartitionByRange`` on the order key — a PARALLEL range-partitioned
   sort (the same machinery as a global ``orderBy``), P tasks;
2. one bounded per-partition statistics pass (count / sum) collected to
   the driver — exactly P scalars, a plan constant in the same spirit as
   the IVF centroid literals (``operators/similarity.py``);
3. partition-local window (partitioned by ``spark_partition_id``) plus
   the broadcast per-partition offsets — P parallel tasks again.

The relation is persisted between the statistics pass and the final
plan so both read the same range partitioning (and the base relation —
typically an aggregate of a much larger fact — is computed once).

Determinism note: ``repartitionByRange`` samples boundaries with a
deterministic seed, and the offset arithmetic is exact for ANY boundary
placement (offsets are derived from actual partition contents), so the
results are stable across runs and partition counts. Callers must make
the order total (include a unique tiebreaker column), as with any
cross-engine-comparable window.

Cache lifecycle: the persist is REQUIRED for correctness (the statistics
pass and the final plan must observe the identical range partitioning;
an unpersisted recompute could legally sample different boundaries) and
it cannot be released inside these functions — the returned DataFrame is
lazy and still reads it. The contract is therefore: consume the result,
then ``spark.catalog.clearCache()`` (or unpersist via
``spark.sparkContext._jsc``-level cache inspection). The repo's bench
and replica loops both do this between queries; long-lived sessions
embedding these operators must do the same or accumulate cached
partials.
"""

from __future__ import annotations

import re
from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: internal partition-id column
_PID = "_range_pid"


def _range_partitioned(
    df: DataFrame, order: list[Column], num_partitions: int | None
) -> DataFrame:
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(p, *order).withColumn(
        _PID, F.spark_partition_id()
    )


def _offset_expr(entries: list, zero: Column) -> Column:
    """pid -> offset lookup as a plan-literal map (no join)."""
    if not entries:
        return zero
    return F.coalesce(F.element_at(F.create_map(*entries), F.col(_PID)), zero)


def with_global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based global rank in ``order`` (which must be total).

    Returns ``(df + rank_col, total_row_count)``. Plan shape: range
    shuffle -> bounded per-partition counts -> partition-local
    ``row_number`` + literal offsets. No single-task stage.
    """
    d = _range_partitioned(df, order, num_partitions).persist()
    counts = {
        r[_PID]: r["cnt"]
        for r in d.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    entries: list[Column] = []
    acc = 0
    for pid in sorted(counts):
        entries += [F.lit(pid), F.lit(acc)]
        acc += counts[pid]
    w = Window.partitionBy(_PID).orderBy(*order)
    rank = (F.row_number().over(w) + _offset_expr(entries, F.lit(0))).cast(
        "bigint"
    )
    return d.withColumn(rank_col, rank).drop(_PID), acc


def ntile_from_rank(rank_col: str, n_rows: int, n_buckets: int) -> Column:
    """Exact ``NTILE(n_buckets)`` bucket from a total-order rank.

    Reproduces SQL NTILE: the first ``n_rows % n_buckets`` buckets get
    ``n_rows // n_buckets + 1`` rows, the rest one fewer. Integer DIV
    throughout — no float path that could mis-floor at 1e9 rows.
    """
    q, r = divmod(n_rows, n_buckets)
    if n_rows <= 0:
        return F.lit(None).cast("int")
    if q == 0:  # fewer rows than buckets: bucket i = rank i
        return F.col(rank_col).cast("int")
    pivot = r * (q + 1)
    big = F.expr(f"CAST(1 + ({rank_col} - 1) DIV {q + 1} AS INT)")
    small = F.expr(f"CAST(1 + {r} + ({rank_col} - {pivot} - 1) DIV {q} AS INT)")
    return F.when(F.col(rank_col) <= F.lit(pivot), big).otherwise(small)


def with_running_min(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    running_col: str = "running_min",
    num_partitions: int | None = None,
):
    """Exact running (prefix) minimum of ``value_col`` in ``order``
    (rows from the first row through the current one), plus the global
    minimum.

    Same two-level shape as :func:`with_running_sum` — range shuffle,
    bounded per-partition MIN partials collected as plan literals,
    partition-local cumulative window — but with MIN instead of SUM,
    so it is exact for ANY orderable column type (no accumulation).
    The per-partition offset for partition p is the minimum over all
    PRIOR partitions' minimums (none for the first partition → the
    local window stands alone via ``least``'s null-skipping).

    Primary consumer: :func:`..functions.stats.with_cusum`, where the
    running minimum of an exact prefix sum turns the recursive
    ``max(0, C + dev)`` CUSUM into two prefix passes.
    """
    vt = df.schema[value_col].dataType.simpleString()
    d = _range_partitioned(df, order, num_partitions).persist()
    mins = {
        r[_PID]: r["m"]
        for r in d.groupBy(_PID).agg(F.min(value_col).alias("m")).collect()
    }
    entries: list[Column] = []
    prior = None  # min over all PRIOR partitions, exact driver-side
    for pid in sorted(mins):
        if prior is not None:
            entries += [F.lit(pid), F.lit(prior).cast(vt)]
        m = mins[pid]
        if m is not None and (prior is None or m < prior):
            prior = m
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # least() skips nulls: first partition (null offset) = local min alone
    running = F.least(
        _offset_expr(entries, F.lit(None).cast(vt)),
        F.min(value_col).over(w),
    )
    return d.withColumn(running_col, running).drop(_PID), prior


def with_running_sum(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    running_col: str = "running",
    num_partitions: int | None = None,
    sum_type: str | None = None,
) -> tuple[DataFrame, Decimal]:
    """Exact running sum of ``value_col`` in ``order`` (rows from the
    first row through the current one), plus the exact grand total.

    ``value_col`` MUST be a DECIMAL column (enforced) so per-partition
    partials, driver-side offset accumulation, and the partition-local
    cumulative window are all exact and order-independent — a double
    column would both break the Decimal offset arithmetic and forfeit
    the exactness contract. ``sum_type`` defaults to
    ``decimal(38, <input scale>)``; an explicit override must not lose
    scale (enforced — a narrower scale would silently round each
    partition offset). Plan shape mirrors :func:`with_global_rank` with
    SUM partials instead of counts.
    """
    from pyspark.sql.types import DecimalType

    in_type = df.schema[value_col].dataType
    if not isinstance(in_type, DecimalType):
        raise TypeError(
            f"with_running_sum needs a DECIMAL value column for exact, "
            f"order-independent prefix sums; {value_col} is "
            f"{in_type.simpleString()} — cast it first"
        )
    if sum_type is None:
        sum_type = f"decimal(38,{in_type.scale})"
    else:
        m = re.fullmatch(r"decimal\(\s*\d+\s*,\s*(\d+)\s*\)", sum_type.lower())
        if not m or int(m.group(1)) < in_type.scale:
            raise ValueError(
                f"sum_type {sum_type!r} would lose scale vs input "
                f"{in_type.simpleString()}"
            )
    d = _range_partitioned(df, order, num_partitions).persist()
    sums = {
        r[_PID]: r["s"]
        for r in d.groupBy(_PID)
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    entries: list[Column] = []
    acc = Decimal(0)
    for pid in sorted(sums):
        entries += [F.lit(pid), F.lit(acc).cast(sum_type)]
        acc += sums[pid] if sums[pid] is not None else Decimal(0)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = (
        _offset_expr(entries, F.lit(Decimal(0)).cast(sum_type))
        + F.sum(value_col).over(w)
    ).cast(sum_type)
    return d.withColumn(running_col, running).drop(_PID), acc
