"""Round-11 query surface: (query, oracle) pairs built during round 10,
STAGED here — parity-tested at sf0.001 on every suite run
(``tests/test_registry_r11_parity.py``) but NOT yet merged into the
driver-facing registry. Round 10's registration budget was spent
fronting the 41 r4-stale re-verify slots (DEVNOTES "round-10 window
math": 5 new + 41 stale fills the ~50-slot driver window); round 11
merges this batch the way ``registry.py``'s ``_merge_round6_surface``
merged ``registry_next.py``.

The batch: the exact-substring (aligned-span) dedup family — Lee et
al. 2022's suffix-array dedup re-expressed as positional-shingle
inverted index + anti-diagonal gaps-and-islands (``operators/dedup.py``)
— and the IVF coarse-quantizer quality census that pairs with
``ivfpq16_index_stats`` (``operators/similarity.py``).

Same alignment rules as ``registry.py`` (aliases identical on both
sides, deterministic tie-breaks, DECIMAL-hop rounding before
order-sensitive float aggregation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import dedup as dd
from .operators import fixtures_adapter as fx
from .operators import similarity as sim

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _stage(name: str, oracle: str):
    def deco(fn: QueryFn) -> QueryFn:
        # same loud-duplicate contract as registry_next._stage
        if name in QUERIES:
            raise ValueError(f"duplicate staged query name: {name}")
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


@_stage("exact_substring_pairs", dd.exact_substring_pairs_sql())
def exact_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup worklist (Lee et al. 2022): document pairs
    sharing an exact run of >= MIN_SPAN_TOKENS tokens, found via the
    positional-shingle inverted index + anti-diagonal islands — order-
    sensitive overlap the set-based Jaccard chain cannot see. Rare-
    shingle cap bounds the self-join the way LSH bands do."""
    return dd.exact_substring_pairs(fx._read(spark, sf_dir, "documents"))


@_stage("substring_dedup_keep", dd.substring_dedup_keep_sql())
def substring_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept documents after exact-substring dedup: greedy keep-lowest-id
    over the >= MIN_SPAN_TOKENS pairs (one broadcast anti-join, no
    connected components) — the span-level member of the keep-rule
    family (neardup_canonical_keep, semdedup_keep)."""
    return dd.substring_dedup_keep(fx._read(spark, sf_dir, "documents"))


@_stage(
    "source_span_overlap_matrix", dd.source_span_overlap_matrix_sql()
)
def source_span_overlap_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-feed exact-overlap monitor: per unordered source pair, how
    many document pairs share a >= MIN_SPAN_TOKENS exact run and the
    longest run — catches one feed mirroring another (or eval->train
    leakage) at the span level."""
    return dd.source_span_overlap_matrix(
        fx._read(spark, sf_dir, "documents")
    )


@_stage("ivf_cell_quality", sim.ivf_cell_quality_sql())
def ivf_cell_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-quantizer health: per Lloyd cell, population + mean
    squared member-to-centroid L2 (quantizer distortion) — the rebuild
    monitor that pairs with ivfpq16_index_stats' code census. Exact
    distributive DECIMAL sum, order-free at any cell size."""
    return sim.ivf_cell_quality(fx._read(spark, sf_dir, "embeddings"))


@_stage("exact_span_removal_stats", dd.exact_span_removal_stats_sql())
def exact_span_removal_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-substring removal APPLIED (Lee et al.'s cut, keep-one-
    copy): every >= MIN_SPAN_TOKENS aligned run is removed from the
    higher-id document, reported per doc as (n_tokens, n_removed,
    kept_ratio) — the span-exact companion to the DF-based
    boilerplate_removal_stats."""
    return dd.exact_span_removal_stats(
        fx._read(spark, sf_dir, "documents")
    )


from pyspark.sql import functions as F  # noqa: E402

from .functions import stats as st  # noqa: E402
from .operators import selection as sel  # noqa: E402


@_stage(
    "stratified_sample_by_source", sel.stratified_sample_by_source_sql()
)
def stratified_sample_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic fixed-quota-per-source downsample: smallest
    md5-hash priority per source wins — the cap-any-one-feed sampling
    step, replayable with no RNG state. Plan is a WindowGroupLimit
    top-k per source, never a per-source sort."""
    return sel.stratified_sample_by_source(
        fx._read(spark, sf_dir, "documents")
    )


@_stage("bigram_logprob_quality", sel.BIGRAM_LOGPROB_QUALITY_SQL)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet LM quality one n-gram order up: per-doc cross-entropy
    (nats/bigram) under the corpus-trained add-1 CONDITIONAL bigram
    model — token ORDER now matters, so common words in rare
    arrangements score badly where the unigram signal cannot see
    them."""
    return sel.bigram_logprob_quality(fx._read(spark, sf_dir, "documents"))


_CA_ORACLE = (
    "WITH vals AS (SELECT (l_returnflag = 'R') AS flag,"
    " CAST(year(l_shipdate) AS BIGINT) AS w FROM lineitem),"
    + st.COCHRAN_ARMITAGE_SQL
)


@_stage("returns_trend_cochran_armitage", _CA_ORACLE)
def returns_trend_cochran_armitage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordered-alternative battery, binary-outcome member: is the
    lineitem RETURN RATE trending across ship years? Cochran-Armitage
    z from five exact integer sums (functions/stats.cochran_armitage)
    — the logistic-regression-free trend test that pairs with
    revenue_trend_jt's continuous response on the same year
    ordering."""
    li = fx._read(spark, sf_dir, "lineitem")
    vals = li.select(
        (F.col("l_returnflag") == "R").alias("flag"),
        F.year("l_shipdate").cast("bigint").alias("w"),
    )
    return st.cochran_armitage(vals, "flag", "w")


@_stage(
    "ann_ivfpq16_residual_topk", sim.ann_ivfpq16_residual_topk_sql()
)
def ann_ivfpq16_residual_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """faiss IndexIVFPQ proper: PQ16 codes over RESIDUALS (v − cell
    centroid) with per-probed-cell query LUTs — the 16 bytes/vector
    spend their precision on within-cell structure, upgrading accuracy
    at identical storage and scan cost to ann_ivfpq16_topk."""
    return sim.ann_ivfpq16_residual_topk(
        fx._read(spark, sf_dir, "embeddings")
    )


@_stage("ivf_recall_census", sim.ivf_recall_census_sql())
def ivf_recall_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offline recall harness AS A QUERY: exact-cosine truth over a
    deterministic query sample vs the Lloyd-IVF probe at nprobe 1/2/4 —
    (nprobe, hits, recall_ppm) in exact integer arithmetic, the
    scheduled-job form of tools/ann_recall.py's measurement."""
    return sim.ivf_recall_census(fx._read(spark, sf_dir, "embeddings"))


@_stage(
    "split_span_contamination", dd.split_span_contamination_sql()
)
def split_span_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Span-level train/val/test leakage audit: cross-split document
    pairs sharing an exact >= MIN_SPAN_TOKENS token run, with
    per-side implicated-doc counts and the longest run — literal
    copied passages across the split boundary that set-based cluster
    auditing can miss."""
    return dd.split_span_contamination(
        fx._read(spark, sf_dir, "documents")
    )
