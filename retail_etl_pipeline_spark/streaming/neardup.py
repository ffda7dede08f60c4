"""Incremental MinHash-LSH near-duplicate detection (streaming fold).

Batch LSH (``operators/dedup.py``) re-hashes the whole corpus per run; a
100-TB corpus ingests incrementally, so the production shape is a fold:
keep the band-bucket index of everything seen so far as a state table,
and hash ONLY the new documents — each micro-batch joins its delta
against the existing buckets (new-vs-old) and against itself
(new-vs-new), appends the discovered pairs, then appends its delta to
the state. This is the incremental-HLL discipline (sketch-union fold in
``tests/test_streaming``) applied to LSH:

- the state table holds (doc_id, band_id, band_key) rows — bounded by
  corpus x LSH_BANDS, never raw pairwise comparisons;
- per-batch cost is O(|delta| x bucket collision rate), NOT
  O(|corpus|): the delta⋈state join touches only buckets the new docs
  hash into (at cluster scale, bucket/partition pruning on band_key);
- every pair is emitted EXACTLY once across batches — by the time doc b
  arrives, every earlier doc a sharing a bucket is in the state, so
  (a, b) surfaces in b's batch and never again (within-batch pairs are
  ordered doc_a < doc_b; per-fold DISTINCT collapses multi-band hits);
- the fold is append-only on both tables: no read-modify-write cycle,
  so a replayed micro-batch (foreachBatch's at-least-once contract)
  re-appends the same rows and the reader's DISTINCT absorbs them.

Equivalence: after folding any partition of the corpus into batches in
any order, ``read_candidates`` == batch ``minhash_lsh_candidates`` on
the full corpus (asserted in tests/test_streaming). Both sides build
the identical :func:`..operators.dedup.band_index` relation, so the
equivalence is structural: the batch self-join enumerates bucket pairs
(a, b); the fold enumerates each such pair exactly when the later of
a, b arrives.

Reference parity note: the reference engine has no streaming near-dup;
this extends its batch dedup surface the same way incremental HLL
extends its rollups (SURVEY.md §2.10 extension discipline).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import band_index


def lsh_fold_batch(
    batch_df: DataFrame, state_dir: str, pairs_dir: str
) -> None:
    """Fold one micro-batch of documents into the LSH state.

    Appends this batch's (new-vs-old + new-vs-new) candidate pairs to
    ``pairs_dir`` and the batch's band index to ``state_dir``. Order of
    operations matters: pairs are computed against the state BEFORE the
    delta is appended to it, so within-batch pairs come only from the
    explicit delta self-join (no double counting).
    """
    spark = batch_df.sparkSession
    delta = band_index(batch_df).persist()
    try:
        within = (
            delta.alias("a")
            .join(
                delta.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )
        pairs = within
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            old = spark.read.parquet(state_dir)
            # new docs against existing buckets; doc ids normalized so
            # the pair orientation matches the batch join's a < b
            cross = (
                delta.alias("n")
                .join(
                    old.alias("o"),
                    (F.col("n.band_id") == F.col("o.band_id"))
                    & (F.col("n.band_key") == F.col("o.band_key"))
                    & (F.col("n.doc_id") != F.col("o.doc_id")),
                )
                .select(
                    F.least(
                        F.col("n.doc_id"), F.col("o.doc_id")
                    ).alias("doc_a"),
                    F.greatest(
                        F.col("n.doc_id"), F.col("o.doc_id")
                    ).alias("doc_b"),
                )
            )
            pairs = pairs.unionByName(cross)
        pairs.distinct().write.mode("append").parquet(pairs_dir)
        delta.write.mode("append").parquet(state_dir)
    finally:
        delta.unpersist()


def stream_lsh_candidates(
    docs_stream: DataFrame, state_dir: str, pairs_dir: str
):
    """writeStream.foreachBatch wiring of :func:`lsh_fold_batch` — the
    caller starts it with a checkpoint + trigger (see tests)."""
    return docs_stream.writeStream.foreachBatch(
        lambda df, _id: lsh_fold_batch(df, state_dir, pairs_dir)
    )


def read_candidates(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """The accumulated candidate-pair set. DISTINCT absorbs replayed
    micro-batches (foreachBatch is at-least-once on failure); in the
    exactly-once happy path it is a no-op by the emission argument in
    the module doc."""
    return spark.read.parquet(pairs_dir).distinct()
