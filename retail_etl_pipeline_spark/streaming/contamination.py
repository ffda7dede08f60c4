"""Incremental eval-set contamination detection (streaming fold).

The batch operator (``operators/corpus.eval_contamination_lsh``) band-
hashes the whole corpus per run to find training documents sharing an
LSH bucket with any held-out eval document. A production training
pipeline ingests continuously on BOTH sides — new training documents
must be checked against every eval bucket seen so far, and a newly
arrived eval document must retroactively flag earlier training
documents — so the production shape is the same band-state fold as the
near-dup pipeline (``streaming/neardup.py``), specialized bipartite:

- ONE band-index state table (doc_id, band_id, band_key, plus the
  side predicate doc_id % EVAL_MOD == 0 evaluated on read) — identical
  relation to the batch operator's ``band_index``;
- per batch, collision pairs come from three bounded joins:
  delta_train x eval_state (new train vs old eval), train_state x
  delta_eval (the RETROACTIVE flags — the case a naive one-directional
  fold silently drops), delta_train x delta_eval (within-batch);
- each (train, eval) bucket collision is emitted exactly once across
  batches (the later side's batch emits it; per-fold DISTINCT absorbs
  multi-band hits), so the accumulated pair set equals the batch
  join's — ``read_contamination`` then aggregates
  countDistinct(eval_doc_id) per train doc, exactly the batch output
  (equivalence asserted in tests/test_streaming).

Replay idempotency and state probes inherit the neardup fold's
machinery: per-batch dynamic partition overwrite, Hadoop-FS existence
checks, explicit schemas on possibly-empty reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import EVAL_MOD
from ..operators.dedup import band_index
from .neardup import _state_ready, _write_batch_partition

_HITS_SCHEMA = "doc_id long, eval_doc_id long"


def _is_eval(col):
    return col % EVAL_MOD == 0


def contamination_fold_batch(
    batch_df: DataFrame,
    state_dir: str,
    hits_dir: str,
    batch_id: int | None = None,
) -> None:
    """Fold one micro-batch of documents into the contamination state:
    append this batch's (train doc, eval doc) bucket-collision pairs to
    ``hits_dir`` and the batch's band index to ``state_dir``.

    Pairs are computed against the state BEFORE the delta joins it, so
    within-batch pairs come only from the explicit delta-train x
    delta-eval join — no double counting, same discipline as
    ``lsh_fold_batch``."""
    spark = batch_df.sparkSession
    delta = band_index(batch_df).persist()
    try:
        if delta.isEmpty():
            return
        d_train = delta.where(~_is_eval(F.col("doc_id")))
        d_eval = delta.where(_is_eval(F.col("doc_id")))
        keys = ["band_id", "band_key"]

        def hits(train, ev):
            return (
                train.alias("t")
                .join(
                    ev.alias("e"),
                    [
                        F.col(f"t.{k}") == F.col(f"e.{k}")
                        for k in keys
                    ],
                )
                .select(
                    F.col("t.doc_id").alias("doc_id"),
                    F.col("e.doc_id").alias("eval_doc_id"),
                )
            )

        pairs = hits(d_train, d_eval)
        if _state_ready(spark, state_dir):
            old = spark.read.parquet(state_dir)
            o_train = old.where(~_is_eval(F.col("doc_id")))
            o_eval = old.where(_is_eval(F.col("doc_id")))
            pairs = pairs.unionByName(hits(d_train, o_eval)).unionByName(
                hits(o_train, d_eval)
            )
        pairs = pairs.distinct()
        if batch_id is None:
            pairs.write.mode("append").parquet(hits_dir)
            delta.write.mode("append").parquet(state_dir)
        else:
            _write_batch_partition(pairs, hits_dir, batch_id)
            _write_batch_partition(delta, state_dir, batch_id)
    finally:
        delta.unpersist()


def stream_contamination(
    docs_stream: DataFrame, state_dir: str, hits_dir: str
):
    """writeStream.foreachBatch wiring of
    :func:`contamination_fold_batch`."""
    return docs_stream.writeStream.foreachBatch(
        lambda df, bid: contamination_fold_batch(
            df, state_dir, hits_dir, batch_id=bid
        )
    )


def read_contamination(spark: SparkSession, hits_dir: str) -> DataFrame:
    """The live contamination table: (doc_id, n_eval_matches) over every
    accumulated bucket collision — the same output schema and values as
    the batch ``eval_contamination_lsh`` on the corpus so far. DISTINCT
    on the pair absorbs replays AND multi-band hits; the countDistinct
    matches the batch operator's."""
    if not _state_ready(spark, hits_dir):
        return spark.createDataFrame([], _HITS_SCHEMA).groupBy(
            "doc_id"
        ).agg(F.countDistinct("eval_doc_id").alias("n_eval_matches"))
    return (
        spark.read.parquet(hits_dir)
        .select("doc_id", "eval_doc_id")
        .distinct()
        .groupBy("doc_id")
        .agg(F.countDistinct("eval_doc_id").alias("n_eval_matches"))
    )
