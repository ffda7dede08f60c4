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


# ---------------------------------------------------------------------------
# incremental connected components: the fold AFTER the LSH fold
# ---------------------------------------------------------------------------


def cc_fold_batch(pairs_batch: DataFrame, labels_dir: str) -> None:
    """Fold one micro-batch of near-dup PAIRS into a persistent
    component-label table (doc_id, component = min reachable doc_id) —
    the incremental twin of :func:`..operators.dedup.
    connected_components`, so a streamed corpus keeps its dedup
    clusters current without ever re-clustering history.

    The trick is CONTRACTION: map each new edge's endpoints to their
    current component labels (two broadcast-friendly left joins against
    the state — a doc not yet labeled is its own label), then run
    connected components on the CONTRACTED edge list only. That graph
    is bounded by the BATCH (|contracted edges| <= |new pairs|), never
    the corpus: history participates only through its labels, and only
    the labels the batch actually touches. The resulting mapping
    (old label -> merged min label) remaps the state with one
    broadcast join. min is associative, so label-of-labels = min doc
    of the merged set = exactly what the batch algorithm computes on
    the full pair list (asserted in tests/test_streaming).

    At 100 TB: per-batch cost is O(|delta| + |touched labels|); the
    contracted CC reuses the hybrid driver/star-contraction kernel,
    so a pathological merge-everything batch degrades to the batch
    algorithm's own distributed path rather than failing.
    """
    from ..operators.dedup import connected_components

    spark = pairs_batch.sparkSession
    delta = pairs_batch.select("doc_a", "doc_b").distinct().persist()
    try:
        have_state = os.path.exists(os.path.join(labels_dir, "_SUCCESS"))
        if have_state:
            state = spark.read.parquet(labels_dir)
            la = state.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "component", "ca"
            )
            lb = state.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "component", "cb"
            )
            contracted = (
                delta.join(la, "doc_a", "left")
                .join(lb, "doc_b", "left")
                .select(
                    F.coalesce("ca", "doc_a").alias("doc_a"),
                    F.coalesce("cb", "doc_b").alias("doc_b"),
                )
            )
        else:
            state = None
            contracted = delta
        # components over the batch-bounded contracted graph: node ids
        # here are labels (= min doc of their old component) or brand-new
        # doc ids, so the merged component is the min over the union
        merge = connected_components(
            contracted.where(F.col("doc_a") != F.col("doc_b"))
        ).withColumnsRenamed({"doc_id": "old", "component": "new"})
        if state is not None:
            remapped = (
                state.join(
                    merge, state.component == merge.old, "left"
                )
                .select(
                    "doc_id",
                    F.coalesce("new", "component").alias("component"),
                )
            )
            # docs first seen in this batch: endpoints not in the state
            fresh = (
                delta.select(F.col("doc_a").alias("doc_id"))
                .unionByName(delta.select(F.col("doc_b").alias("doc_id")))
                .distinct()
                .join(state.select("doc_id"), "doc_id", "left_anti")
                .join(merge, F.col("doc_id") == merge.old, "left")
                .select(
                    "doc_id", F.coalesce("new", "doc_id").alias("component")
                )
            )
            out = remapped.unionByName(fresh)
        else:
            out = merge.select(
                F.col("old").alias("doc_id"), F.col("new").alias("component")
            )
        # A/B write: materialize fully before replacing the state the
        # plan itself reads (overwrite-in-place would truncate our input)
        tmp = labels_dir + "__next"
        out.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(labels_dir)
    finally:
        delta.unpersist()


def stream_cc_labels(pairs_stream: DataFrame, labels_dir: str):
    """writeStream.foreachBatch wiring of :func:`cc_fold_batch`."""
    return pairs_stream.writeStream.foreachBatch(
        lambda df, _id: cc_fold_batch(df, labels_dir)
    )
