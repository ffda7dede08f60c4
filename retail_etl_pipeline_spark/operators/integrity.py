"""Referential-integrity audit: orphan counts for FK edges.

A 100 TB star schema can't afford one scan per constraint: a child table
with k foreign keys is scanned ONCE, left-joining every parent's
distinct key set with a presence marker, and a single aggregation emits
all k orphan counts; ``stack`` pivots them to one row per edge. Parents
with bounded cardinality should be passed pre-wrapped in
``F.broadcast``; large parents go through the planner's shuffle join
(AQE handles skew). Cited shape: the reference has no integrity checks
at all — its loads trust the staged CSVs (``Data Ingestion.sql``) — so
this is the audit the warehouse DDL's implicit FKs imply.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FkEdge:
    """One FK edge: ``child_key`` must exist in ``parent[parent_key]``."""

    child_key: str
    parent: DataFrame
    parent_key: str
    name: str  # edge label in the output
    broadcast: bool = False  # True for bounded-cardinality parents


def _miss(marker: str) -> Column:
    return F.sum(F.when(F.col(marker).isNull(), 1).otherwise(0)).cast("bigint")


def orphan_counts(child: DataFrame, edges: list[FkEdge]) -> DataFrame:
    """One row per edge: (fk_edge, n_child_rows, n_orphans) — ONE child
    scan for all edges. NULL child keys count as orphans (a NULL FK
    violates the implied NOT-NULL of a warehouse FK column; gate them
    upstream if intentional)."""
    if not edges:
        raise ValueError("orphan_counts needs at least one FkEdge")
    # select each child key ONCE (two edges may share a child column)
    j = child.select(*dict.fromkeys(e.child_key for e in edges))
    # markers and parent keys are index-named: edge labels are free-form
    # strings (dots, arrows) that F.col would parse as struct paths, and
    # a parent key named like the child key (nation_key -> nation_key,
    # the common star-schema convention) would make the join condition
    # ambiguous
    for i, e in enumerate(edges):
        keys = (
            e.parent.select(F.col(e.parent_key).alias(f"_pk_{i}"))
            .distinct()
            .withColumn(f"_in_{i}", F.lit(1))
        )
        if e.broadcast:
            keys = F.broadcast(keys)
        j = j.join(keys, F.col(e.child_key) == F.col(f"_pk_{i}"), "left")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        *[_miss(f"_in_{i}").alias(f"m_{i}") for i in range(len(edges))],
    )
    pairs = ", ".join(
        f"'{e.name}', m_{i}" for i, e in enumerate(edges)
    )
    return agg.select(
        F.expr(
            f"stack({len(edges)}, {pairs}) AS (fk_edge, n_orphans)"
        ),
        F.col("n").alias("n_child_rows"),
    ).select("fk_edge", "n_child_rows", "n_orphans")
