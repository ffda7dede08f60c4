"""Registry part4: query registrations, in original registry order.

Sections:
- Corpus-preparation operators (operators/corpus.py): chunking, repetition
- PII scrubbing + URL/domain analytics (operators/text.py): training-data
- Z-order clustering key (functions/zorder.py): the Morton interleave that
- time-series RANGE-frame window: trailing 7-day moving average of daily
- referential-integrity audit: orphan counts for every FK edge of the
- snapshot reconciliation (operators/reconcile.py): anti-entropy diff of
- bitwise activity bitmap: per-user weekday activity as one integer (bit
- corpus trigram frequency table (the canonical MapReduce workload): word
- language-ID evaluation: confusion counts of predicted vs labeled lang.
- unpivot/melt: the weekly rollup reshaped long — (grain, metric, value)
- median aggregation (per brand): F.median and DuckDB median both take
- blocked string similarity: near-identical part names via a BLOCKING-KEY
- per-store missing sales days — counted arithmetically (span minus
- pandas-on-Spark surface (pyspark.pandas): the same relational work
- incremental aggregate maintenance (operators/incremental.py): the weekly
- URL canonicalization + URL-level dedup (operators/text.py): messy URL
- Iterative graph analytics (operators/graph.py): fixed-point PageRank
- Deterministic weighted sampling (operators/sampling.py): priority
- Exact heavy hitters with Misra-Gries pruning (operators/frequent.py):

Split from the monolithic registry.py (round 7); the
registration ORDER is load-bearing (the driver correctness
rotation walks QUERIES in insertion order) — append only,
never reorder (tests/test_rotation_guard.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ..functions import zorder as zo
from ..functions.metrics import money
from ..functions.metrics import money_sum
from ..functions.weeks import yr_wk_num
from ..operators import corpus as cp
from ..operators import fixtures_adapter as fx
from ..operators import frequent as fq
from ..operators import graph as gph
from ..operators import reconcile as rc
from ..operators import retail
from ..operators import sampling as sp
from ..operators import similarity as sim
from ..operators import text as tx
from ._base import (_register, _m, _ms, _W_TRANS)  # noqa: F401
from .part1_retail_flagship import (_ROLLUP_ORACLE)

# ---------------------------------------------------------------------------
# Corpus-preparation operators (operators/corpus.py): chunking, repetition
# profiling, eval-set contamination, corpus shape statistics — the
# document-level transforms between raw ingestion and tokenization.
# ---------------------------------------------------------------------------



@_register("doc_chunks", cp.DOC_CHUNKS_SQL)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunks, one row per (doc, chunk) — the
    sequence+explode pretraining chunker. Map-only (no shuffle): output
    partitioning follows the input scan at any corpus size."""
    return cp.doc_chunks(fx._read(spark, sf_dir, "documents"))


@_register("word_repetition", cp.WORD_REPETITION_SQL)
def word_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition profile (token totals, distinct count, top
    token + ratio) — the degenerate-repetition quality signal. Two compact
    exchanges of post-partial-agg (doc_id, tok, cnt) rows; raw text never
    shuffles."""
    return cp.word_repetition(fx._read(spark, sf_dir, "documents"))


@_register("gopher_quality_flags", tx.GOPHER_QUALITY_SQL)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher/MassiveText quality-rule battery (Rae et al.
    2021 App. A1.1, word-adapted) in ONE relational pass: per-doc
    measured signals + one boolean per rule + the keep conjunction.
    Every flag decided by exact-integer cross-multiplication — zero
    float at the thresholds (operators/text.gopher_quality_flags)."""
    return tx.gopher_quality_flags(fx._read(spark, sf_dir, "documents"))


@_register("eval_contamination", cp.EVAL_CONTAMINATION_SQL)
def eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram contamination of a held-out eval split vs the training
    corpus: equi-join on 60-bit shingle fingerprints (never text); the
    eval side is 1/EVAL_MOD of the data, so AQE broadcasts it when it
    fits."""
    return cp.eval_contamination(fx._read(spark, sf_dir, "documents"))


@_register("eval_contamination_13gram", cp.eval_contamination_sql(13))
def eval_contamination_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GPT-3 published decontamination width (Brown et al. 2020
    App. C: 13-gram overlap): same fingerprint equi-join as
    eval_contamination at n=13 — long grams trade recall for precision;
    a 13-gram collision is near-certain verbatim leakage, so this is
    the REMOVAL criterion while the 3-gram form is the audit signal.
    Same one-equi-join plan; the shingle relation is larger per doc but
    still 8-byte keys."""
    return cp.eval_contamination(
        fx._read(spark, sf_dir, "documents"), n=13
    )


@_register("token_length_histogram", cp.TOKEN_LENGTH_HISTOGRAM_SQL)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram by language — bounded-key (lang × bucket)
    two-phase aggregate; exact BIGINT sums divided at the end keep the
    averages bit-stable across engines and partition counts."""
    return cp.token_length_histogram(fx._read(spark, sf_dir, "documents"))


@_register("ann_batch_topk", sim.ann_batch_topk_sql())
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched brute-force cosine top-k: one corpus scan scores a bounded
    broadcast batch of query vectors; per-query top-k via a rank window
    whose rn <= k filter pushes below the shuffle (WindowGroupLimit), so
    the exchange moves O(|Q|*k*tasks) rows, not |corpus|×|Q|."""
    return sim.ann_batch_topk(fx._read(spark, sf_dir, "embeddings"))


@_register("boilerplate_spans", cp.BOILERPLATE_SPANS_SQL)
def boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction — share of shingles occurring in
    >= BOILERPLATE_MIN_DOCS distinct docs. Join-free: document frequency
    is a count window over the shingle partition (same shuffle a
    groupBy(sh) would cost, no shingle recomputation), then one per-doc
    roll-up; plan-locked to three exchanges."""
    return cp.boilerplate_spans(fx._read(spark, sf_dir, "documents"))


@_register("corpus_split", cp.CORPUS_SPLIT_SQL)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split via multiplicative hash
    of doc_id (stable across runs/engines/partitionings, unlike
    randomSplit) + per-(split, source) doc/token/char stats — one
    bounded-key aggregate."""
    return cp.corpus_split(fx._read(spark, sf_dir, "documents"))


@_register("documents_epoch_shuffle", cp.epoch_shuffle_prefix_sql((1, 2), 64))
def documents_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle (training-loader order):
    each epoch is a different multiplicative-hash permutation of the
    same documents, reproducible across runs/engines/partitionings —
    the property rand(seed) does NOT have (its output depends on
    partitioning). The query emits the first 64 docs of epochs 1 and 2;
    both prefixes run as TakeOrdered top-k merges, and the oracle
    replays the identical hash arithmetic."""
    return cp.epoch_shuffle_prefix(
        fx._read(spark, sf_dir, "documents"), epochs=(1, 2), k=64
    )


@_register("documents_arrow_byte_profile", tx.ARROW_BYTE_PROFILE_SQL)
def documents_arrow_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte/codepoint accounting via mapInArrow — the
    zero-copy RecordBatch exchange shape (no pandas materialization);
    pyarrow.compute binary_length/utf8_length kernels, bounded
    per-source aggregate on top."""
    return tx.arrow_byte_profile(fx._read(spark, sf_dir, "documents"))


@_register("shingle_novelty", cp.SHINGLE_NOVELTY_SQL)
def shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: share of shingles whose first occurrence
    (min doc_id) is this document — marginal-contribution ranking for
    corpus trimming. Join-free: min(doc_id) as a window over the shingle
    partition, then one per-doc roll-up; plan-locked to three
    exchanges."""
    return cp.shingle_novelty(fx._read(spark, sf_dir, "documents"))


@_register("label_centroid_similarity", sim.LABEL_CENTROID_SQL)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label centroids (cluster coherence).
    Cosine's scale-invariance lets the plan skip the mean: decimal-exact
    component SUMS give the identical cosine with order-independent
    accumulation. One bounded-key (label × dim) aggregate + a |labels|²
    broadcast pairing."""
    return sim.label_centroid_similarity(fx._read(spark, sf_dir, "embeddings"))


@_register("embedding_quantize", sim.EMBEDDING_QUANTIZE_SQL)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min-max int8 quantization with a cross-engine-exact
    code checksum — pure row-local projection, no shuffle; explicit
    floor(z+0.5) rounding because round() tie modes differ between
    engines."""
    return sim.embedding_quantize(fx._read(spark, sf_dir, "embeddings"))


@_register(
    "customer_nation_salted",
    f"""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {_ms("c.c_acctbal")} AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def customer_nation_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant dim join through functions.skew.salted_broadcast_left:
    the big side is salted 16 ways and the dim replicated across salts, so
    a hot nation key spreads over 16 tasks instead of one. Salting is
    result-neutral (same rows, different placement) — the oracle is the
    plain join. At 100 TB this is the manual fallback when AQE's skew-join
    splitting can't apply (e.g. the skewed side feeds an aggregation in
    the same stage)."""
    from ..functions.skew import salted_broadcast_left

    c = fx._read(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "nk"
    )
    n = fx._read(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "nk"
    )
    joined = salted_broadcast_left(c, n, "nk")
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_sum(F.col("c_acctbal")).alias("total_acctbal"),
    )


@_register(
    "document_vector_profile",
    f"""
WITH e AS (
  SELECT vec_id,
         label,
         sqrt(list_dot_product({{v}}, {{v}})) AS norm
  FROM embeddings
)
SELECT d.lang,
       e.label,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(round(CAST(SUM(CAST(norm AS DECIMAL(30,15)))
                       / COUNT(*) AS DECIMAL(20,9)), 6) AS DOUBLE)
         AS avg_norm,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN e ON d.doc_id = e.vec_id
GROUP BY 1, 2
""".format(v="list_transform(embedding, x -> CAST(x AS DOUBLE))"),
)
def document_vector_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: documents ⋈ embeddings on doc_id = vec_id, rolled
    up per (lang, label) with a decimal-exact average vector norm. The
    norm is row-local double math (deterministic fold); only the exact
    DECIMAL sum crosses rows, so the result is partition-order-independent.
    At scale this is a co-partitionable equi-join on the shared id — the
    canonical text-table-meets-vector-table shape; both sides bucket by
    the same key in a real deployment, making it shuffle-free."""
    from ..operators.similarity import _vectors, dot

    d = fx._read(spark, sf_dir, "documents")
    e = _vectors(fx._read(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("norm"),
    )
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                (
                    F.sum(F.col("norm").cast("decimal(30,15)"))
                    / F.count(F.lit(1))
                ).cast("decimal(20,9)"),
                6,
            )
            .cast("double")
            .alias("avg_norm"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@_register(
    "token_length_percentiles",
    f"""
WITH d AS (
  SELECT source, len({{tokens}}) AS n_tokens FROM documents
)
SELECT source,
       quantile_disc(n_tokens, 0.25) AS tok_p25,
       quantile_disc(n_tokens, 0.50) AS tok_p50,
       quantile_disc(n_tokens, 0.90) AS tok_p90,
       quantile_disc(n_tokens, 0.99) AS tok_p99
FROM d
GROUP BY source
""".format(tokens="regexp_split_to_array(trim(text), '\\s+')"),
)
def token_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length distribution (p25/p50/p90/p99) via
    approx_percentile — the mergeable Greenwald-Khanna sketch, so the
    shuffle carries one bounded sketch per (source) instead of the raw
    length column, and the same query degrades gracefully from exact (at
    fixture scale, below the accuracy parameter) to rank-error <=
    1/accuracy at corpus scale. The sequence-length histogram every
    training-mix decision starts from.

    Cross-engine convention note (ADVICE r2): the oracle pairs this with
    DuckDB ``quantile_disc``. Both engines return an ACTUAL element of
    the group (discrete quantile), but their rank conventions differ:
    Spark's GK sketch returns the smallest value whose rank >= ceil(p*N),
    while quantile_disc uses the type-7-style index floor(p*(N-1)).
    For some (N, p) the two pick adjacent order statistics — e.g. N=10,
    p=0.25 -> GK rank 3 vs quantile_disc index floor(2.25)=2 (the 3rd
    element either way), but N=4, p=0.5 -> GK 2nd vs disc floor(1.5)=1
    -> 2nd as well; divergence appears when p*N is integral. The fixture
    groups (500 docs, 20 sources) don't hit a divergent combination; if
    a future fixture does, pin both sides to an explicit
    ``ceil(p*N)``-th order statistic via a rank window instead of
    treating it as a correctness bug in either engine."""
    from ..operators.text import token_count

    acc = 1_000_000
    d = fx._read(spark, sf_dir, "documents").select(
        "source", token_count(F.col("text")).alias("n_tokens")
    )
    return d.groupBy("source").agg(
        *[
            F.expr(f"approx_percentile(n_tokens, {p}, {acc})").alias(a)
            for p, a in [
                (0.25, "tok_p25"),
                (0.50, "tok_p50"),
                (0.90, "tok_p90"),
                (0.99, "tok_p99"),
            ]
        ]
    )


# ---------------------------------------------------------------------------
# PII scrubbing + URL/domain analytics (operators/text.py): training-data
# hygiene passes. The fixture corpus contains no PII-shaped strings, so
# both engines deterministically AUGMENT each doc with synthetic
# email/card/ip/phone/url substrings derived from doc_id before the
# operator runs — the same both sides, so the redaction/extraction
# automata are genuinely exercised and oracle-checked (the clean-corpus
# alternative would verify an identity map).
# ---------------------------------------------------------------------------

_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.7 call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' card 4111 1111 1111 1111.'"
)


@_register(
    "pii_scrub",
    f"""
WITH augmented AS (
  SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents
)
SELECT doc_id,
       {tx.scrub_pii_sql("text").replace("AS scrubbed", "AS scrubbed_text")}
FROM augmented
""",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails, card numbers, IPv4, phone runs) with
    per-rule match counts. Map-only JVM regexp chain — no shuffle; the
    patterns live in the Java-regex/RE2 common subset so the oracle runs
    the identical automaton."""
    d = fx._read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" card 4111 1111 1111 1111."),
        ).alias("text"),
    )
    out = tx.scrub_pii(aug)
    return out.select(
        "doc_id",
        "n_email",
        "n_card",
        "n_ipv4",
        "n_phone",
        F.col("scrubbed").alias("scrubbed_text"),
    )


_URL_AUG_SQL = (
    "text || ' see https://docs' || CAST(doc_id % 10 AS VARCHAR)"
    " || '.example.org/p/' || CAST(doc_id AS VARCHAR)"
    " || ' and http://mirror' || CAST(doc_id % 3 AS VARCHAR)"
    " || '.example.net/q?x=' || CAST(doc_id % 7 AS VARCHAR)"
)


@_register(
    "url_domains",
    tx.DOMAIN_STATS_SQL.replace("FROM documents", "FROM aug_documents")
    .replace(
        "WITH urls AS (",
        f"WITH aug_documents AS (\n  SELECT doc_id, {_URL_AUG_SQL} AS text"
        " FROM documents\n),\nurls AS (",
    )
    .format(text="text"),
)
def url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain link profile: regexp_extract_all -> executor-side
    explode -> one hash aggregation on the domain key."""
    d = fx._read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://docs"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and http://mirror"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".example.net/q?x="),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("text"),
    )
    return tx.domain_stats(aug)


# ---------------------------------------------------------------------------
# Z-order clustering key (functions/zorder.py): the Morton interleave that
# zorder_write clusters files by, verified cell-by-cell against a DuckDB
# replica of the same bit arithmetic. The scale bounds are plan constants
# (in production: table statistics); 8 bits/dim keeps the demo grid
# readable while the operator itself goes to 16 bits x 3 dims.
# ---------------------------------------------------------------------------

_Z_BITS = 8
_Z_CELLS = (1 << _Z_BITS) - 1
_Z_VLO, _Z_VHI = 0.0, 500.0  # events.value domain bound (stats-derived)
_Z_ULO, _Z_UHI = 0.0, 256.0  # events.user_id domain bound


def _z_scale_sql(expr: str, lo: float, hi: float) -> str:
    return (
        f"GREATEST(0, LEAST({_Z_CELLS}, CAST(floor("
        f"(CAST({expr} AS DOUBLE) - {lo}) / {hi - lo} * {_Z_CELLS} + 0.5"
        f") AS BIGINT)))"
    )


@_register(
    "events_zorder_cells",
    f"""
WITH scaled AS (
  SELECT {_z_scale_sql("user_id", _Z_ULO, _Z_UHI)} AS u,
         {_z_scale_sql("value", _Z_VLO, _Z_VHI)} AS v
  FROM events
),
z AS (
  SELECT {zo.zvalue_sql(["u", "v"], _Z_BITS)} AS zval FROM scaled
)
SELECT CAST(zval >> {_Z_BITS} AS BIGINT) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(zval) AS BIGINT) AS z_min,
       CAST(MAX(zval) AS BIGINT) AS z_max
FROM z
GROUP BY 1
""",
)
def events_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key cell histogram over events (user_id x value): the exact
    clustering key ``zorder_write`` lays files out by, as a pure codegen
    shift/mask expression — bit-identical to the DuckDB replica."""
    e = fx._read(spark, sf_dir, "events")
    u = zo.scale_to_bits(F.col("user_id"), _Z_ULO, _Z_UHI, _Z_BITS)
    v = zo.scale_to_bits(F.col("value"), _Z_VLO, _Z_VHI, _Z_BITS)
    z = zo.zvalue([u, v], _Z_BITS)
    return (
        e.select(z.alias("zval"))
        .groupBy(
            F.shiftright("zval", _Z_BITS).cast("bigint").alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("zval").cast("bigint").alias("z_min"),
            F.max("zval").cast("bigint").alias("z_max"),
        )
    )


# ---------------------------------------------------------------------------
# time-series RANGE-frame window: trailing 7-day moving average of daily
# store revenue. The frame is a RANGE over an integer day index (not ROWS),
# so gaps in the calendar shrink the window honestly; the window is
# partitioned by store — parallel across stores, never a global sort. The
# frame sum runs in exact DECIMAL so the two engines' different sliding-
# aggregation strategies (running accumulation vs segment tree) cannot
# diverge in the last ulp before the cents rounding.
# ---------------------------------------------------------------------------


@_register(
    "store_revenue_7d_ma",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT store_key,
         trans_dt,
         CAST(trans_dt - DATE '1970-01-01' AS BIGINT) AS day_idx,
         SUM(CAST(sales_amt AS DECIMAL(30,6))) AS rev_dec
  FROM sales
  GROUP BY 1, 2, 3
)
SELECT store_key,
       trans_dt,
       CAST(round(rev_dec, 2) AS DOUBLE) AS daily_rev,
       {_m("CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w")}
         AS ma_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_days_7d
FROM daily
WINDOW w AS (
  PARTITION BY store_key
  ORDER BY day_idx
  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
)
""",
)
def store_revenue_7d_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily revenue per store (RANGE
    frame on a day index, partitioned by store)."""
    s = fx.sales(spark, sf_dir)
    daily = s.groupBy(
        "store_key",
        "trans_dt",
        F.datediff("trans_dt", F.lit("1970-01-01").cast("date")).alias(
            "day_idx"
        ),
    ).agg(F.sum(F.col("sales_amt").cast("decimal(30,6)")).alias("rev_dec"))
    w = (
        Window.partitionBy("store_key")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "store_key",
        "trans_dt",
        F.round("rev_dec", 2).cast("double").alias("daily_rev"),
        money(
            F.sum("rev_dec").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma_7d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days_7d"),
    )


# ---------------------------------------------------------------------------
# referential-integrity audit: orphan counts for every FK edge of the
# star schema in ONE relation. Each child table is scanned ONCE with all
# its parent key-sets left-joined in the same pass (markers), so the
# seven edges cost four fact/dim scans; bounded-cardinality parents
# (nation, region) are broadcast, big parents go through the planner's
# shuffle join + AQE. Output: one row per edge.
# ---------------------------------------------------------------------------


def _orphan_sql(child: str, ck: str, parent: str, pk: str, extra: str = "") -> str:
    return f"""
SELECT '{child}.{ck}->{parent}.{pk}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(SUM(CASE WHEN NOT EXISTS (
           SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck}
         ) THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM {child} c{extra}"""


@_register(
    "fk_orphans_audit",
    " UNION ALL ".join(
        [
            _orphan_sql("lineitem", "l_orderkey", "orders", "o_orderkey"),
            _orphan_sql("lineitem", "l_partkey", "part", "p_partkey"),
            _orphan_sql("lineitem", "l_suppkey", "supplier", "s_suppkey"),
            _orphan_sql("orders", "o_custkey", "customer", "c_custkey"),
            _orphan_sql("customer", "c_nationkey", "nation", "n_nationkey"),
            _orphan_sql("supplier", "s_nationkey", "nation", "n_nationkey"),
            _orphan_sql("nation", "n_regionkey", "region", "r_regionkey"),
        ]
    )
    + " ORDER BY fk_edge",
)
def fk_orphans_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-row counts for all seven FK edges of the star schema
    (``operators/integrity.py``): each child table scanned once for ALL
    its parents, per-edge rows unioned."""
    from ..operators.integrity import FkEdge, orphan_counts

    def t(name: str) -> DataFrame:
        return fx._read(spark, sf_dir, name)

    groups = [
        (
            t("lineitem"),
            [
                FkEdge(
                    "l_orderkey", t("orders"), "o_orderkey",
                    "lineitem.l_orderkey->orders.o_orderkey",
                ),
                FkEdge(
                    "l_partkey", t("part"), "p_partkey",
                    "lineitem.l_partkey->part.p_partkey",
                ),
                FkEdge(
                    "l_suppkey", t("supplier"), "s_suppkey",
                    "lineitem.l_suppkey->supplier.s_suppkey",
                ),
            ],
        ),
        (
            t("orders"),
            [
                FkEdge(
                    "o_custkey", t("customer"), "c_custkey",
                    "orders.o_custkey->customer.c_custkey",
                )
            ],
        ),
        (
            t("customer"),
            [
                FkEdge(
                    "c_nationkey", t("nation"), "n_nationkey",
                    "customer.c_nationkey->nation.n_nationkey",
                    broadcast=True,
                )
            ],
        ),
        (
            t("supplier"),
            [
                FkEdge(
                    "s_nationkey", t("nation"), "n_nationkey",
                    "supplier.s_nationkey->nation.n_nationkey",
                    broadcast=True,
                )
            ],
        ),
        (
            t("nation"),
            [
                FkEdge(
                    "n_regionkey", t("region"), "r_regionkey",
                    "nation.n_regionkey->region.r_regionkey",
                    broadcast=True,
                )
            ],
        ),
    ]
    out = None
    for child, edges in groups:
        part = orphan_counts(child, edges)
        out = part if out is None else out.unionByName(part)
    return out.orderBy("fk_edge")


# ---------------------------------------------------------------------------
# snapshot reconciliation (operators/reconcile.py): anti-entropy diff of
# two table versions by (key, md5 fingerprint) pairs. The "new" snapshot
# is derived deterministically from lineitem in-query (drops, mutations,
# inserts keyed off order/part keys) so both engines diff the same pair
# of relations; fingerprint inputs are ints/strings only (raw doubles
# render differently as VARCHAR between engines).
# ---------------------------------------------------------------------------

_RECON_FP_COLS = ["q_int", "l_returnflag", "l_linestatus"]
_RECON_OLD_CTE = f"""
old AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor(l_quantity) AS BIGINT) AS q_int,
         l_returnflag, l_linestatus
  FROM lineitem
)"""
_RECON_NEW_CTE = """
new AS (
  -- deletes: every 97th order; mutations: quantity bump on part%31;
  -- inserts: shifted-linenumber clones of every 89th order
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_partkey % 31 = 0 THEN CAST(floor(l_quantity) AS BIGINT) + 1
              ELSE CAST(floor(l_quantity) AS BIGINT) END AS q_int,
         l_returnflag, l_linestatus
  FROM lineitem WHERE l_orderkey % 97 <> 0
  UNION ALL
  SELECT l_orderkey, l_linenumber + 100,
         CAST(floor(l_quantity) AS BIGINT), l_returnflag, l_linestatus
  FROM lineitem WHERE l_orderkey % 89 = 0
)"""


@_register(
    "lineitem_snapshot_diff",
    f"""
WITH {_RECON_OLD_CTE.strip()},
{_RECON_NEW_CTE.strip()},
o AS (
  SELECT l_orderkey, l_linenumber,
         {rc.row_fingerprint_sql(_RECON_FP_COLS)} AS fp_old
  FROM old
),
n AS (
  SELECT l_orderkey, l_linenumber,
         {rc.row_fingerprint_sql(_RECON_FP_COLS)} AS fp_new
  FROM new
)
SELECT CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old <> fp_new THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM o FULL OUTER JOIN n USING (l_orderkey, l_linenumber)
GROUP BY 1
""",
)
def lineitem_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy diff of lineitem vs a simulated next-day snapshot:
    added/removed/changed/unchanged key counts via (key, md5) pairs."""
    from ..operators.reconcile import snapshot_diff

    li = fx._read(spark, sf_dir, "lineitem")
    q_int = F.floor("l_quantity").cast("bigint")
    old = li.select(
        "l_orderkey",
        "l_linenumber",
        q_int.alias("q_int"),
        "l_returnflag",
        "l_linestatus",
    )
    kept = li.filter(F.col("l_orderkey") % 97 != 0).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_partkey") % 31 == 0, q_int + 1)
        .otherwise(q_int)
        .alias("q_int"),
        "l_returnflag",
        "l_linestatus",
    )
    inserted = li.filter(F.col("l_orderkey") % 89 == 0).select(
        "l_orderkey",
        (F.col("l_linenumber") + 100).alias("l_linenumber"),
        q_int.alias("q_int"),
        "l_returnflag",
        "l_linestatus",
    )
    new = kept.unionByName(inserted)
    return snapshot_diff(
        old,
        new,
        ["l_orderkey", "l_linenumber"],
        [F.col(c) for c in _RECON_FP_COLS],
    )


# ---------------------------------------------------------------------------
# bitwise activity bitmap: per-user weekday activity as one integer (bit
# i = active on ISO weekday i), rolled up to a distribution of users by
# active-day count. Bitmap aggregation (bit_or) is THE compact rollup for
# presence-style facts at 100 TB: the per-user state is 4 bytes whatever
# the event volume, partials combine map-side, and bit_count replaces a
# count_distinct expansion.
# ---------------------------------------------------------------------------


@_register(
    "user_activity_bitmap",
    f"""
WITH {fx.EVENTS_STREAM_CTE.strip()},
per_user AS (
  SELECT user_id,
         bit_or(1 << (isodow(ts) - 1)) AS mask
  FROM events_norm
  GROUP BY user_id
)
SELECT CAST(bit_count(mask) AS INTEGER) AS n_active_weekdays,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(mask) AS INTEGER) AS min_mask,
       CAST(MAX(mask) AS INTEGER) AS max_mask
FROM per_user
GROUP BY 1
""",
)
def user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users by number of distinct active ISO weekdays, via bit_or of a
    7-bit weekday mask (Spark ``weekday`` = 0-Monday = DuckDB isodow-1)."""
    ev = fx.events_stream(spark, sf_dir)
    # SQL shiftleft: the Python wrapper only takes a literal bit count
    per = ev.groupBy("user_id").agg(
        F.bit_or(F.expr("shiftleft(1, weekday(ts))")).alias("mask")
    )
    return per.groupBy(
        F.bit_count("mask").cast("int").alias("n_active_weekdays")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("mask").cast("int").alias("min_mask"),
        F.max("mask").cast("int").alias("max_mask"),
    )


# ---------------------------------------------------------------------------
# corpus trigram frequency table (the canonical MapReduce workload): word
# 3-grams via posexplode + lead() windows (native, codegen — HOF lambdas
# are interpreted), two-phase count on the gram string, top-k via
# TakeOrdered with a full deterministic tiebreak. At 100 TB the shuffle
# carries (gram, partial count) pairs and the top-k merge moves
# k x partitions rows — never the full gram table.
# ---------------------------------------------------------------------------

_TRIGRAM_K = 100


@_register(
    "trigram_topk",
    f"""
WITH grams AS (
  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM (
    SELECT doc_id, {tx.TOKENS_SQL.format(c="text")} AS t FROM documents
  ) AS d, unnest(range(1, len(t) - 1)) AS r(i)
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams
GROUP BY gram
ORDER BY n DESC, gram ASC
LIMIT {_TRIGRAM_K}
""",
)
def trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} corpus word trigrams by frequency (deterministic
    count-desc, gram-asc order)."""
    from pyspark.sql import Window as W

    d = fx._read(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(tx.tokens(F.col("text"))).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    t1 = F.lead("tok", 1).over(w)
    t2 = F.lead("tok", 2).over(w)
    grams = toks.select(
        F.concat_ws(" ", F.col("tok"), t1, t2).alias("gram"),
        t2.alias("_last"),
    ).where(F.col("_last").isNotNull())
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(_TRIGRAM_K)
    )


# ---------------------------------------------------------------------------
# language-ID evaluation: confusion counts of predicted vs labeled lang.
# Pure re-aggregation of the language_id projection (map-only) into one
# bounded-key hash agg (|langs|² cells) — the classifier-eval pattern at
# corpus scale: the expensive per-doc scoring never leaves the scan
# stage, only (true, pred, partial count) triples shuffle.
# ---------------------------------------------------------------------------


@_register(
    "language_id_confusion",
    f"""
WITH scored AS ({tx.LANGUAGE_ID_SQL.strip()})
SELECT lang_true,
       lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN lang_true = lang_pred THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct
FROM scored
GROUP BY 1, 2
""",
)
def language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-cell counts for the stopword-marker language classifier
    against the fixtures' ground-truth ``lang`` label."""
    scored = tx.language_id(fx._read(spark, sf_dir, "documents"))
    return scored.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("lang_true") == F.col("lang_pred"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    )


# ---------------------------------------------------------------------------
# unpivot/melt: the weekly rollup reshaped long — (grain, metric, value)
# — the standard feed for metric stores and plotting layers. Spark's
# unpivot/stack is a zero-shuffle projection: each input row fans out to
# |metrics| rows inside the scan stage, and the expensive part (the
# rollup itself) is the same single-shuffle aggregate it always was.
# ---------------------------------------------------------------------------


@_register(
    "weekly_rollup_long",
    f"""
WITH {fx.SALES_CTE.strip()},
wide AS (
  SELECT {_W_TRANS} AS yr_wk_num,
         store_key,
         prod_key,
         {_m("SUM(sales_qty)")} AS total_sales_qty,
         {_ms("sales_amt")} AS total_sales_amt,
         {_ms("sales_cost")} AS total_sales_cost
  FROM sales
  GROUP BY 1, 2, 3
)
SELECT yr_wk_num, store_key, prod_key, metric, value
FROM wide
UNPIVOT (value FOR metric IN (
  total_sales_qty, total_sales_amt, total_sales_cost
))
""",
)
def weekly_rollup_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly rollup melted to (grain, metric, value) via unpivot —
    a map-side fan-out above the same single-shuffle aggregate."""
    s = retail.add_week(fx.sales(spark, sf_dir), "trans_dt")
    wide = s.groupBy("yr_wk_num", "store_key", "prod_key").agg(
        money(F.sum("sales_qty")).alias("total_sales_qty"),
        money_sum(F.col("sales_amt")).alias("total_sales_amt"),
        money_sum(F.col("sales_cost")).alias("total_sales_cost"),
    )
    return wide.unpivot(
        ["yr_wk_num", "store_key", "prod_key"],
        ["total_sales_qty", "total_sales_amt", "total_sales_cost"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# median aggregation (per brand): F.median and DuckDB median both take
# the midpoint average on even counts — aligned through the money hop.
# At scale median is a per-group sort of group-local values (same class
# as exact percentiles); approx_percentile is the mergeable-sketch swap.
# ---------------------------------------------------------------------------


@_register(
    "brand_price_median",
    f"""
SELECT p_brand,
       {_m("median(p_retailprice)")} AS median_price,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part
GROUP BY p_brand
""",
)
def brand_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median retail price per brand (midpoint interpolation on even
    counts in both engines)."""
    p = fx._read(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        money(F.median("p_retailprice")).alias("median_price"),
        F.count(F.lit(1)).alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# blocked string similarity: near-identical part names via a BLOCKING-KEY
# equi-join (shared head noun) + Levenshtein verify — the scalable shape
# for fuzzy matching: candidate pairs come from an equi-join on a cheap
# key, the O(len²) edit distance runs only on candidates, and the
# all-pairs cross join never exists. Same architecture as the MinHash
# band join, for strings instead of shingle sets.
# ---------------------------------------------------------------------------

_LEV_MAX = 4


@_register(
    "similar_part_names",
    f"""
WITH names AS (
  SELECT DISTINCT p_name,
         split_part(p_name, ' ', 2) AS block_key
  FROM part
)
SELECT a.p_name AS name_a,
       b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM names a
JOIN names b
  ON a.block_key = b.block_key AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
""",
)
def similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part-name pairs: block on the shared noun, verify
    with Levenshtein <= {k} — candidate-only edit distance.

    Recall contract: candidates are DEFINED by the block (same-noun
    family) — cross-noun pairs are out of scope even when their raw edit
    distance is small, the standard entity-resolution trade where the
    blocking key encodes the match intent. A guaranteed-recall variant
    needs an overlap-style scheme (q-gram pigeonhole blocks, like the
    SimHash 4-block join) at ~q× the candidate volume."""
    names = (
        fx._read(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block_key", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.alias("a")
    b = names.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(lev <= _LEV_MAX)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            lev.cast("int").alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# per-store missing sales days — counted arithmetically (span minus
# distinct active days) on both engines; the day-spine densification
# pattern (sequence + explode) lives where the gap ROWS are actually
# consumed, store_revenue_interpolated.
# ---------------------------------------------------------------------------


@_register(
    "missing_sales_days",
    f"""
WITH {fx.SALES_CTE.strip()}
SELECT store_key,
       CAST(MAX(trans_dt) - MIN(trans_dt) + 1 AS BIGINT) AS n_days_span,
       CAST(COUNT(DISTINCT trans_dt) AS BIGINT) AS n_active_days,
       CAST(MAX(trans_dt) - MIN(trans_dt) + 1
            - COUNT(DISTINCT trans_dt) AS BIGINT) AS n_missing_days
FROM sales
GROUP BY store_key
""",
)
def missing_sales_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-store gap count inside the store's own [first, last] sales
    window — as PURE ARITHMETIC: span = max - min + 1, missing = span -
    distinct active days. One aggregation, no spine.

    This query used to materialize the day spine (sequence+explode) and
    anti-join the actual days back, only to COUNT the leftovers — 8x
    slower at sf0.1 for the identical result (the oracle was always the
    arithmetic form). The lesson is the plan-shape one: densify only
    when downstream needs the gap ROWS (store_revenue_interpolated
    does — that is where the spine pattern lives now)."""
    s = fx.sales(spark, sf_dir).select("store_key", "trans_dt")
    return s.groupBy("store_key").agg(
        (
            F.datediff(F.max("trans_dt"), F.min("trans_dt")) + 1
        ).cast("bigint").alias("n_days_span"),
        F.count_distinct("trans_dt").cast("bigint").alias("n_active_days"),
        (
            F.datediff(F.max("trans_dt"), F.min("trans_dt"))
            + 1
            - F.count_distinct("trans_dt")
        ).cast("bigint").alias("n_missing_days"),
    )


# ---------------------------------------------------------------------------
# pandas-on-Spark surface (pyspark.pandas): the same relational work
# through the pandas API, compiling to the identical Catalyst plan — the
# migration path for pandas-shaped code. Scale guards: the default-index
# type is forced to 'distributed' (the default 'sequence' index builds a
# GLOBAL order — exactly the empty-partition window this repo bans), and
# the result returns to a plain DataFrame via to_spark() so nothing
# driver-side materializes.
# ---------------------------------------------------------------------------


@_register(
    "pandas_api_brand_profile",
    """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       AVG(p_size) AS avg_size,
       CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
FROM part
GROUP BY p_brand
""",
)
def pandas_api_brand_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand profile via the pandas API on Spark (groupby/agg/reset_index
    -> to_spark). The mean is exact in double (integer sums < 2^53), so
    no decimal hop is needed."""
    import pyspark.pandas as ps

    # option_context, not set_option: the index-type choice must not leak
    # to other pandas-on-Spark users in the process. The conversion goes
    # through fx._read so the fixture path convention and session confs
    # stay in one place.
    with ps.option_context("compute.default_index_type", "distributed"):
        pdf = fx._read(spark, sf_dir, "part").pandas_api()
        out = (
            pdf.groupby("p_brand")
            .agg(
                n_parts=("p_partkey", "count"),
                avg_size=("p_size", "mean"),
                max_price=("p_retailprice", "max"),
            )
            .reset_index()
        )
        sdf = out.to_spark()
    return sdf.select(
        "p_brand",
        F.col("n_parts").cast("bigint"),
        "avg_size",
        F.col("max_price").cast("double"),
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (operators/incremental.py): the weekly
# rollup produced by MERGING two independently-computed partial states
# (history ∪ delta) instead of one scan — shares the direct rollup's
# oracle, so the driver proves merge(partials(A), partials(B)) ==
# direct(A ∪ B) bit-for-bit. The run-over-run pattern that makes a daily
# 100 TB pipeline O(delta), not O(history).
# ---------------------------------------------------------------------------


@_register("incremental_weekly_rollup", _ROLLUP_ORACLE)
def incremental_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly rollup via mergeable partials: the fact is split into two
    disjoint 'runs' (orderkey parity stands in for history vs today),
    each aggregated to partial state independently, the states merged,
    then finalized — decimal partials make the merge exact on any
    grouping of runs."""
    from ..operators.incremental import (
        finalize_rollup,
        merge_partials,
        rollup_partials,
    )

    s = retail.add_week(fx.sales(spark, sf_dir), "trans_dt")
    history = s.filter(F.col("trans_id") % 2 == 0)
    today = s.filter(F.col("trans_id") % 2 == 1)
    state = merge_partials(rollup_partials(history), rollup_partials(today))
    return finalize_rollup(state)


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (operators/text.py): messy URL
# variants (mixed-case host, utm params, fragments, trailing slashes)
# collapse to one canonical resource before dedup — the standard web-
# corpus step ahead of content dedup. Variants are synthesized from
# doc_id (fixtures carry no URLs) the same way on both engines; the
# canonicalization chain is map-only regexp work.
# ---------------------------------------------------------------------------

_URL_VARIANT_SQL = """
CASE doc_id % 4
  WHEN 0 THEN 'https://Docs' || CAST(doc_id % 50 AS VARCHAR)
              || '.Example.org/res/' || CAST(doc_id % 50 AS VARCHAR)
  WHEN 1 THEN 'https://docs' || CAST(doc_id % 50 AS VARCHAR)
              || '.example.org/res/' || CAST(doc_id % 50 AS VARCHAR)
              || '?utm_source=feed'
  WHEN 2 THEN 'https://docs' || CAST(doc_id % 50 AS VARCHAR)
              || '.example.org/res/' || CAST(doc_id % 50 AS VARCHAR)
              || '#section2'
  ELSE 'HTTPS://DOCS' || CAST(doc_id % 50 AS VARCHAR)
              || '.EXAMPLE.ORG/res/' || CAST(doc_id % 50 AS VARCHAR) || '/'
END
"""


@_register(
    "url_canonical_dedup",
    f"""
WITH raw AS (
  SELECT doc_id, {_URL_VARIANT_SQL.strip()} AS url FROM documents
)
SELECT {tx.canonicalize_url_sql("url")} AS canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM raw
GROUP BY 1
""",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup after canonicalization: per canonical resource,
    how many docs and raw variants collapse onto it, and the
    deterministic keeper (min doc_id)."""
    d = fx._read(spark, sf_dir, "documents")
    n = (F.col("doc_id") % 50).cast("string")
    variant = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://Docs"), n, F.lit(".Example.org/res/"), n),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("https://docs"), n, F.lit(".example.org/res/"), n,
                F.lit("?utm_source=feed"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("https://docs"), n, F.lit(".example.org/res/"), n,
                F.lit("#section2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("HTTPS://DOCS"), n, F.lit(".EXAMPLE.ORG/res/"), n,
                F.lit("/"),
            )
        )
    )
    raw = d.select("doc_id", variant.alias("url"))
    return raw.groupBy(
        tx.canonicalize_url(F.col("url")).alias("canonical_url")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("url").alias("n_variants"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


# ---------------------------------------------------------------------------
# Iterative graph analytics (operators/graph.py): fixed-point PageRank
# over the part co-purchase graph — bounded unrolled loop of equi-joins,
# exact integer arithmetic so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------



def _copurchase_edges_shared(
    spark: SparkSession, sf_dir: str, supported: bool = False
) -> DataFrame:
    """The co-purchase edge relation the graph queries derive from.

    r10 measurement-honesty fix: this used to return a PERSISTED
    parquet materialization keyed on sf_dir (graph.materialized_edges),
    so every bench run after the first consumed a precomputed
    intermediate instead of computing from the parquet inputs — exactly
    the cross-run caching this round's rules prohibit. Each query now
    builds the edge relation inline (the r10 grouped-pass edge build is
    join-free, and pagerank's in-run persist still covers its own
    iterations); graph.materialized_edges remains a library operator
    for real pipelines, where a durable edge table IS the right
    pattern."""
    li = fx._read(spark, sf_dir, "lineitem")
    if supported:
        return gph.copurchase_edges_supported(li)
    return gph.copurchase_edges(li)


@_register("part_copurchase_pagerank", gph.pagerank_oracle_sql(iterations=5, k=20))
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the co-purchase graph (parts that
    appear in the same order). 5 iterations of the exact fixed-point
    recurrence (operators/graph.py) — the iterative-DataFrame-loop
    pattern: one persisted adjacency relation, one shuffle per
    iteration, TakeOrdered final top-k. Extends the reference's join
    surface (SURVEY.md §2.4) to iterative graph algorithms."""
    edges = _copurchase_edges_shared(spark, sf_dir)
    return gph.pagerank_topk(edges, iterations=5, k=20)


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (operators/sampling.py): priority
# sampling — the sample is a pure projection + bounded per-group top-k,
# reproducible on any engine/partitioning.
# ---------------------------------------------------------------------------



@_register(
    "documents_weighted_sample",
    f"""
WITH staged AS (
  SELECT source, doc_id, n_chars,
         {sp.priority_sql("doc_id", "n_chars")} AS priority
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars, CAST(priority AS BIGINT) AS priority,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY priority DESC, doc_id ASC
         ) AS INTEGER) AS sample_rank
  FROM staged
)
SELECT * FROM ranked WHERE sample_rank <= 3
""",
)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted 3-per-source document sample via deterministic
    priority sampling (Duffield-Lund-Thorup): integer priorities from a
    multiplicative hash, per-group rank window (WindowGroupLimit pushes
    the top-k below the shuffle). Complements the uniform
    documents_stratified_sample with the weighted variant every
    training-mix builder needs."""
    d = fx._read(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return sp.sample_per_group(d, "source", "doc_id", "n_chars", k=3)


# ---------------------------------------------------------------------------
# Exact heavy hitters with Misra-Gries pruning (operators/frequent.py):
# two-pass plan that never shuffles the full vocabulary; the oracle is
# the plain exact GROUP BY because pass 2 recounts exactly.
# ---------------------------------------------------------------------------



@_register(
    "heavy_hitter_tokens",
    """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT tok,
       CAST(COUNT(*) AS BIGINT) AS term_freq,
       CAST((COUNT(*) * 1000000) // MAX(tot.n) AS BIGINT) AS freq_ppm
FROM toks, tot
GROUP BY tok
HAVING COUNT(*) * 1000 >= MAX(tot.n)
""",
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with corpus frequency >= 0.1%, exact, via the two-pass
    Misra-Gries plan: bounded per-partition MG candidates (pass 1,
    mapInPandas, <= k keys shuffled per task), exact broadcast-semi-join
    recount of candidates only (pass 2). The oracle is the naive exact
    GROUP BY — identical results, different shuffle volume."""
    d = fx._read(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
    return fq.exact_heavy_hitters(toks, "tok", denom=1000, k=2000)
