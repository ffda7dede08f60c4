"""Exact distributed heavy hitters: Misra-Gries candidates + recount.

The textbook two-pass exact heavy-hitter plan for data too wide to
shuffle its full key space:

  pass 1 — each partition runs a bounded-memory Misra-Gries summary
           (Misra & Gries 1982) over its local token stream and emits at
           most ``k`` candidate keys. MG guarantees every item with
           local frequency > n_p/k survives locally; an item with
           global frequency >= n/k is local-heavy in at least one
           partition (averaging argument), so the union of per-partition
           candidates is a SUPERSET of the true heavy hitters.
  pass 2 — exact recount of candidates only (broadcast semi-join +
           hash aggregate over a key space of at most k * partitions),
           filtered against the exact total.

Correctness therefore does NOT depend on MG's approximation: pass 2 is
exact, pass 1 only prunes the aggregation key space. That is what makes
the operator oracle-checkable (the DuckDB twin is the plain exact
GROUP BY) while the Spark plan never shuffles the full vocabulary.

Scale notes (100 TB): the full-vocabulary groupBy a naive plan would run
shuffles O(|vocab|) rows per partition; this plan shuffles at most
``k`` candidate rows per partition in pass 1 and O(k * partitions)
exact counts in pass 2. MG state is bounded at ~4k dict entries per
task regardless of stream length. The pandas path is Arrow-batched
(mapInPandas) with vectorized ``value_counts`` per batch — no per-row
Python.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(counts: Counter, k: int) -> None:
    """Misra-Gries decrement step, batched: subtract the (k+1)-th
    largest count from every entry and drop the non-positive ones —
    equivalent to running the classic one-at-a-time decrement until at
    most k entries remain, and preserves the MG error bound n_p/k."""
    if len(counts) <= k:
        return
    kth = sorted(counts.values(), reverse=True)[k]
    for key in [t for t, c in counts.items() if c <= kth]:
        del counts[key]
    for key in counts:
        counts[key] -= kth


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (at most ~k per task).
    Output: one column named like the input, distinct across tasks."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        for pdf in batches:
            # vectorized per-batch frequency, merged into bounded state
            for tok, c in pdf[col].value_counts().items():
                counts[tok] += int(c)
            # compress lazily at 4k to amortize the sort
            if len(counts) > 4 * k:
                _mg_compress(counts, k)
        _mg_compress(counts, k)
        yield pd.DataFrame({col: list(counts.keys())})

    # output schema mirrors the input column's type — the operator is
    # type-generic (string tokens, bigint ids, ...)
    return df.select(col).mapInPandas(
        summarize, schema=df.select(col).schema
    ).distinct()


def exact_heavy_hitters(
    df: DataFrame, col: str, denom: int = 1000, k: int = 2000
) -> DataFrame:
    """Items with frequency * denom >= total, computed exactly with the
    MG-pruned two-pass plan. k must satisfy k >= denom for the superset
    guarantee (local threshold n_p/k must not exceed global n/denom)."""
    if k < denom:
        raise ValueError(f"k ({k}) must be >= denom ({denom})")
    cand = mg_candidates(df, col, k)
    # no forced broadcast: the candidate set is k * tasks rows — small in
    # practice, but a hint would override AQE's size check and OOM on a
    # 50k-task corpus job; AQE broadcasts it while it fits and degrades
    # to a shuffled join when it doesn't (same policy as graph.py's deg)
    counted = (
        df.join(cand, col, "inner")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    # products widened to DECIMAL(38,0): at the module's documented
    # ~1e13-token corpus scale, term_freq * 1e6 (and * denom) overflow
    # BIGINT and throw under ANSI — same class fixed in sampling.py /
    # graph.py / source_mix_weights
    return (
        counted.crossJoin(F.broadcast(total))
        .where(
            F.col("term_freq").cast("decimal(38,0)") * denom
            >= F.col("_total")
        )
        .select(
            col,
            "term_freq",
            F.expr(
                "cast((cast(term_freq as decimal(38,0)) * 1000000)"
                " div _total as bigint)"
            ).alias("freq_ppm"),
        )
    )
