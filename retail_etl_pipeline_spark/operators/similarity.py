"""Similarity search over embedding columns (SURVEY.md §2.10).

- brute-force cosine top-k (the exactness baseline)
- LSH-bucketed ANN top-k (random-hyperplane signs; the scale path — the
  candidate scan shrinks from N to N/2^bits per bucket)
- embedding-cosine near-duplicate pairs (brute force + LSH-bucketed form)

All vector math is JVM-side via array higher-order functions
(``zip_with`` products + ``aggregate`` summation over double arrays) — no
Python UDFs. Cosines are rounded at 6 decimals via DECIMAL (see
functions.metrics) before ranking/thresholding so results are
engine-stable; ties break on vec_id.

At 100 TB: brute-force top-k against ONE query is a single scan (fine);
pairwise brute force is quadratic and exists only as the correctness
baseline — the LSH-bucketed variants are the production path (equi-join on
bucket id). An IVF variant would replace the hyperplane bucket with a
k-means cell id; the join shape is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: number of random-hyperplane bits for the LSH bucket id
LSH_PLANES = 4
#: vec_ids whose embeddings serve as deterministic hyperplanes
PLANE_IDS = tuple(range(1, 1 + LSH_PLANES))
#: cosine threshold for near-duplicate pairs
COSINE_NEARDUP_THRESHOLD = 0.45
#: top-k size
TOP_K = 10


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot product over double arrays — matches
    DuckDB's list_dot_product accumulation closely enough that the 6-decimal
    rounding downstream absorbs any pairwise-vs-sequential difference."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b))


def _round6(c: Column) -> Column:
    return F.round(c.cast("decimal(20,9)"), 6).cast("double")


_DOT_SQL = "list_dot_product({a}, {b})"
_COS_SQL = (
    "list_dot_product({a}, {b}) / sqrt(list_dot_product({a}, {a}))"
    " / sqrt(list_dot_product({b}, {b}))"
)
_ROUND6_SQL = "CAST(round(CAST({x} AS DECIMAL(20,9)), 6) AS DOUBLE)"
_VEC_SQL = "list_transform({e}, x -> CAST(x AS DOUBLE))"


def _vectors(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )


def cosine_topk(emb: DataFrame, query_id: int = 0, k: int = TOP_K) -> DataFrame:
    """Brute-force cosine top-k against one query vector: broadcast the
    query, one scan, TakeOrderedAndProject for the global top-k (no full
    sort)."""
    vecs = _vectors(emb)
    q = vecs.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv")
    )
    scored = (
        vecs.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            _round6(cosine(F.col("v"), F.col("qv"))).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def cosine_topk_sql(query_id: int = 0, k: int = TOP_K) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label, {_VEC_SQL.format(e='embedding')} AS v FROM embeddings
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})
SELECT vec_id,
       label,
       {_ROUND6_SQL.format(x=_COS_SQL.format(a='v', b='qv'))} AS cosine
FROM e, q
WHERE vec_id != {query_id}
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def ann_lsh_topk(emb: DataFrame, query_id: int = 0, k: int = TOP_K) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket, then exact cosine
    within the query's bucket only.

    The LSH_PLANES hyperplanes are the embeddings of PLANE_IDS —
    deterministic and data-independent of the query. bucket(v) =
    sum_i [dot(v, p_i) > 0] << i. At scale this turns the scan into an
    equi-lookup of one bucket (~N/2^bits vectors)."""
    vecs = _vectors(emb)
    planes = (
        vecs.where(F.col("vec_id").isin(*PLANE_IDS))
        .select(F.col("vec_id").alias("plane_id"), F.col("v").alias("pv"))
    )
    with_bits = (
        vecs.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "label",
            "v",
            F.when(dot(F.col("v"), F.col("pv")) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("bit"),
            (F.col("plane_id") - min(PLANE_IDS)).cast("int").alias("i"),
        )
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.expr("shiftleft(CAST(bit AS BIGINT), i)")).alias("bucket"),
            F.first("v").alias("v"),
        )
    )
    qb = with_bits.where(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("qbucket"), F.col("v").alias("qv")
    )
    return (
        with_bits.where(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(qb))
        .where(F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            "label",
            _round6(cosine(F.col("v"), F.col("qv"))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ann_lsh_topk_sql(query_id: int = 0, k: int = TOP_K) -> str:
    plane_list = ", ".join(str(p) for p in PLANE_IDS)
    return f"""
WITH e AS (
  SELECT vec_id, label, {_VEC_SQL.format(e='embedding')} AS v FROM embeddings
),
planes AS (
  SELECT vec_id AS plane_id, v AS pv FROM e WHERE vec_id IN ({plane_list})
),
buckets AS (
  SELECT e.vec_id,
         e.label,
         ANY_VALUE(e.v) AS v,
         CAST(SUM(
           (CASE WHEN {_DOT_SQL.format(a='e.v', b='pv')} > 0 THEN 1 ELSE 0 END)
           << (plane_id - {min(PLANE_IDS)})
         ) AS BIGINT) AS bucket
  FROM e, planes
  GROUP BY e.vec_id, e.label
),
q AS (
  SELECT bucket AS qbucket, v AS qv FROM buckets WHERE vec_id = {query_id}
)
SELECT vec_id,
       label,
       {_ROUND6_SQL.format(x=_COS_SQL.format(a='v', b='qv'))} AS cosine
FROM buckets, q
WHERE vec_id != {query_id} AND bucket = qbucket
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def embedding_neardup(emb: DataFrame) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force): all pairs with
    cosine >= COSINE_NEARDUP_THRESHOLD. Quadratic — the correctness
    baseline for :func:`embedding_neardup_lsh`."""
    vecs = _vectors(emb)
    a = vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return pairs.select(
        "vec_a",
        "vec_b",
        _round6(cosine(F.col("va"), F.col("vb"))).alias("cosine"),
    ).where(F.col("cosine") >= COSINE_NEARDUP_THRESHOLD)


EMBEDDING_NEARDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, {_VEC_SQL.format(e='embedding')} AS v FROM embeddings
)
SELECT a.vec_id AS vec_a,
       b.vec_id AS vec_b,
       {_ROUND6_SQL.format(x=_COS_SQL.format(a='a.v', b='b.v'))} AS cosine
FROM e a
JOIN e b ON a.vec_id < b.vec_id
WHERE {_ROUND6_SQL.format(x=_COS_SQL.format(a='a.v', b='b.v'))}
      >= {COSINE_NEARDUP_THRESHOLD}
"""


def embedding_neardup_lsh(emb: DataFrame) -> DataFrame:
    """Near-dup pairs, LSH-bucketed: only pairs sharing the hyperplane
    bucket are scored — the equi-join on bucket id replaces the quadratic
    cross join at scale (recall < 1 by design; the oracle encodes the same
    bucketing, so the comparison is exact)."""
    vecs = _vectors(emb)
    planes = vecs.where(F.col("vec_id").isin(*PLANE_IDS)).select(
        F.col("vec_id").alias("plane_id"), F.col("v").alias("pv")
    )
    with_bits = (
        vecs.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "v",
            F.when(dot(F.col("v"), F.col("pv")) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("bit"),
            (F.col("plane_id") - min(PLANE_IDS)).cast("int").alias("i"),
        )
        .groupBy("vec_id")
        .agg(
            F.sum(F.expr("shiftleft(CAST(bit AS BIGINT), i)")).alias("bucket"),
            F.first("v").alias("v"),
        )
    )
    a = with_bits.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket"
    )
    b = with_bits.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("bucket").alias("bucket_b"),
    )
    pairs = a.join(
        b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b"))
    )
    return pairs.select(
        "vec_a",
        "vec_b",
        _round6(cosine(F.col("va"), F.col("vb"))).alias("cosine"),
    ).where(F.col("cosine") >= COSINE_NEARDUP_THRESHOLD)


EMBEDDING_NEARDUP_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, {_VEC_SQL.format(e='embedding')} AS v FROM embeddings
),
planes AS (
  SELECT vec_id AS plane_id, v AS pv FROM e
  WHERE vec_id IN ({", ".join(str(p) for p in PLANE_IDS)})
),
buckets AS (
  SELECT e.vec_id,
         ANY_VALUE(e.v) AS v,
         CAST(SUM(
           (CASE WHEN {_DOT_SQL.format(a='e.v', b='pv')} > 0 THEN 1 ELSE 0 END)
           << (plane_id - {min(PLANE_IDS)})
         ) AS BIGINT) AS bucket
  FROM e, planes
  GROUP BY e.vec_id
)
SELECT a.vec_id AS vec_a,
       b.vec_id AS vec_b,
       {_ROUND6_SQL.format(x=_COS_SQL.format(a='a.v', b='b.v'))} AS cosine
FROM buckets a
JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_ROUND6_SQL.format(x=_COS_SQL.format(a='a.v', b='b.v'))}
      >= {COSINE_NEARDUP_THRESHOLD}
"""
