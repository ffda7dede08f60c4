"""Registry part10 (round 9): corpus-curation + retrieval depth.

Sections:
- Complete IVF-PQ16 + exact-rerank retrieval stack (the serving path a
  100 TB embedding store actually runs end to end).
- Semantic dedup (SemDeDup, Abbas et al. 2023): cell-bucketed
  embedding near-dup with a greedy min-id keep rule — the semantic
  companion to the lexical MinHash chain.
- DSIR-style data selection (Xie et al. NeurIPS 2023): hashed-bigram
  importance weights of every document against a target distribution,
  plus the Gumbel-key resampling step.
- Unigram-LM quality scoring (the CCNet recipe determinized): per-doc
  cross-entropy under a corpus-trained add-1 unigram model, and the
  head/middle/tail perplexity bucketing by source.
- Boilerplate REMOVAL (applying boilerplate_spans): per-doc kept/cut
  stats after dropping cross-document repeated lines, C4-style.
- Token-frequency Zipf fit: log-log OLS slope/intercept/r2 over the
  rank-frequency curve — the corpus-health power-law check.
- Brown-Forsythe spread test: k-sample variance homogeneity on
  |x - group median| via exact doubled deviations.

Registration ORDER is load-bearing (the driver correctness rotation
walks QUERIES in insertion order) — append only, never reorder
(tests/test_rotation_guard.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession

from ..operators import corpus as cp
from ..operators import fixtures_adapter as fx
from ..operators import selection as sel
from ..operators import similarity as sim
from ._base import _register


@_register("ann_ivfpq16_rerank_topk", sim.ann_ivfpq16_rerank_topk_sql())
def ann_ivfpq16_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete production retrieval stack (faiss IndexIVFPQ +
    refine, determinized): nprobe=2 Lloyd cells prune the corpus,
    trained 16-byte PQ ADC shortlists 64 candidates from the
    survivors, and exact L2 reranks ONLY the shortlist's raw vectors —
    per-query cost at scale is (nprobe/|cells|) x 16 bytes/vector
    scanned plus 64 key-fetches. Shortlist cut on ROUND6(adc) keeps
    the candidate set engine-identical (measured recall in SCALE.md)."""
    return sim.ann_ivfpq16_rerank_topk(
        fx._read(spark, sf_dir, "embeddings")
    )


@_register("semdedup_keep", sim.semdedup_keep_sql())
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023): k-means cells
    bucket the embedding space, exact cosine runs ONLY within a cell,
    and every epsilon-duplicate pair keeps its lowest vec_id — the
    embedding-space companion to the lexical MinHash chain. Pair work
    is bounded per cell (sum |cell|^2, never corpus^2) and the greedy
    min-id rule is one bucketed self-join + one anti-join, no
    iterative connected components."""
    return sim.semdedup_keep(fx._read(spark, sf_dir, "embeddings"))


@_register("semdedup_rate_by_label", sim.semdedup_rate_by_label_sql())
def semdedup_rate_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label semantic-dedup health (label, n_docs, n_dropped,
    drop_ppm exact-integer) — the monitoring table a curation pipeline
    tracks per feed to catch an embedding source collapsing onto
    itself; the semantic twin of neardup_rate_by_source."""
    return sim.semdedup_rate_by_label(
        fx._read(spark, sf_dir, "embeddings")
    )


@_register("dsir_importance_weights", sel.DSIR_IMPORTANCE_WEIGHTS_SQL)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. NeurIPS 2023), determinized:
    per-doc log importance weight of the raw pool against the English
    target slice over add-1-smoothed hashed unigram+bigram bucket
    models (md5 buckets — cross-engine stable). The model is a
    1024-row broadcast; the per-doc sum is an ordered fold over bucket
    id; the shuffle carries (doc_id, bucket) counts, never feature
    strings."""
    return sel.dsir_importance_weights(
        fx._read(spark, sf_dir, "documents")
    )


@_register("dsir_gumbel_topk", sel.dsir_gumbel_topk_sql())
def dsir_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's resampling step via the Gumbel-top-k trick with
    hash-uniform draws: key = logw + Gumbel(u(doc_id)), take the 64
    largest — sampling-without-replacement proportional to exp(logw),
    fully replayable (no RNG state), TakeOrdered plan (no global
    sort)."""
    return sel.dsir_gumbel_topk(fx._read(spark, sf_dir, "documents"))


@_register("unigram_logprob_quality", sel.UNIGRAM_LOGPROB_QUALITY_SQL)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal, determinized: per-doc
    cross-entropy (nats/token) under the corpus-trained add-1 unigram
    model — the (doc, token)-level model join is bucketable at any
    corpus size and the per-doc sum is an ordered fold over the token
    string."""
    return sel.unigram_logprob_quality(
        fx._read(spark, sf_dir, "documents")
    )


@_register("ccnet_quality_buckets", sel.CCNET_QUALITY_BUCKETS_SQL)
def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail staging: exact perplexity terciles over
    (rounded xent, doc_id) via the scale-safe global-rank machinery
    (range shuffle + literal offsets — no single-task NTILE window),
    counted per source."""
    return sel.ccnet_quality_buckets(fx._read(spark, sf_dir, "documents"))


@_register("boilerplate_removal_stats", cp.boilerplate_removal_stats_sql())
def boilerplate_removal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal APPLIED (the C4 strip step at the shingle
    level): per-doc token total, tokens covered by any cross-document
    repeated n-gram, and the surviving ratio — positional shingles
    shuffle as 60-bit fingerprints, coverage explodes positions only
    for flagged instances, kept_ratio is a ratio of exact integers."""
    return cp.boilerplate_removal_stats(
        fx._read(spark, sf_dir, "documents")
    )


@_register("token_zipf_fit", cp.TOKEN_ZIPF_FIT_SQL)
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health power law: one-row log-log OLS of token frequency
    on rank (slope ~ -1 for natural text; template spam flattens it).
    ln values round into DECIMAL(12,6) so every OLS moment is an EXACT
    distributive decimal sum — no ordered fold, no collect, at any
    vocabulary size; ranking via the scale-safe global-rank shuffle."""
    return cp.token_zipf_fit(fx._read(spark, sf_dir, "documents"))
