"""Count-min sketch as a relational construction.

Heavy-hitter *candidates* come from Misra-Gries (operators/frequent.py);
the count-min sketch (Cormode & Muthukrishnan 2005) answers the dual
question — "give me an upper-bounded frequency estimate for ANY key" —
from O(d*w) state instead of the full key space. Here the sketch is
built relationally: hashing each key into its d cells is a projection,
the counter table is a groupBy over at most d*w cells, and a point
query is a broadcast equi-join + min over the d rows. Everything is
integer arithmetic on both engines, so estimates are bit-exact
cross-engine and the defining invariant (estimate >= true frequency)
is oracle-checkable row by row.

Why this shape scales: the sketch relation is bounded at d*w rows no
matter the corpus size (the groupBy partial-aggregates map-side, so the
shuffle moves at most d*w cells per task); merging sketches of two
corpora is a union + re-sum of the same bounded relation — the same
mergeable-partials algebra as incremental_weekly_rollup and the
linear-counting rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint64, fingerprint64_sql

#: sketch geometry: d independent rows of w counters.
CMS_DEPTH = 4
CMS_WIDTH = 1024
#: one odd mixing constant per row (xxhash/Knuth-style primes).
CMS_MIX = (2654435761, 2246822519, 3266489917, 668265263)
_MOD = 2**32


def _cell(fp: Column, j: int) -> Column:
    """Row-j cell index for a 60-bit key fingerprint.

    r11: pure BIGINT modular arithmetic instead of DECIMAL(38,0) — the
    decimal multiply+mod routes through BigInteger.divideAndRemainder
    (thread dumps showed 17 s of Knuth division for one bench run of
    cms_token_estimates). A 60-bit fp times a 32-bit constant overflows
    BIGINT under ANSI, but the result is only needed mod 2^32, so split
    the reduced fp into 16-bit halves: with a = fp mod 2^32,
    a*mix ≡ (a_hi*mix mod 2^32)*2^16 + a_lo*mix  (mod 2^32); every
    intermediate is < 2^49. Bit-identical to the decimal form (modular
    multiplication) — the DuckDB twin (_cell_sql, HUGEINT) is unchanged."""
    mix = CMS_MIX[j]
    a = fp % F.lit(_MOD)
    a_lo = a % F.lit(1 << 16)
    a_hi = F.shiftright(a, 16)  # a < 2^32 and non-negative
    hi_part = ((a_hi * mix) % _MOD * (1 << 16)) % _MOD
    return ((hi_part + a_lo * mix) % _MOD % CMS_WIDTH).cast("integer")


def _cell_sql(fp: str, j: int) -> str:
    return (
        f"CAST((CAST({fp} AS HUGEINT) * {CMS_MIX[j]}) % {_MOD}"
        f" % {CMS_WIDTH} AS INTEGER)"
    )


def cms_build(df: DataFrame, col: str) -> DataFrame:
    """Counter table (j, cell, cnt) — at most CMS_DEPTH*CMS_WIDTH rows."""
    fp = fingerprint64(F.col(col))
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cell(fp, j).alias("cell")
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("jc")
    ).select("jc.j", "jc.cell")
    return cells.groupBy("j", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, col: str) -> DataFrame:
    """Point-query estimates for a (small) probe relation: join each
    probe key's d cells against the broadcast sketch, min over rows.
    The sketch is bounded (d*w) — broadcasting it is always safe."""
    fp = fingerprint64(F.col(col))
    probe_cells = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cell(fp, j).alias("cell")
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("jc"),
    ).select(col, "jc.j", "jc.cell")
    # LEFT join with coalesce(cnt, 0): a probe key absent from the corpus
    # hashes to unmaterialized (zero-count) cells — an inner join would
    # drop it from the output instead of returning the true CMS estimate
    # of 0 (and a partially-absent key's min could never reach 0)
    return (
        probe_cells.join(F.broadcast(sketch), ["j", "cell"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate")
        )
    )


def cms_cells_sql(expr_col: str, src: str, keep: tuple[str, ...] = ()) -> str:
    """CTE body producing (*keep, j, cell) for every row of ``src`` — one
    UNION ALL arm per sketch row (the oracle optimizes for portability,
    not scan count); keep in sync with :func:`cms_build`."""
    fp = fingerprint64_sql(expr_col)
    prefix = "".join(f"{k}, " for k in keep)
    return "\n  UNION ALL\n".join(
        f"  SELECT {prefix}{j} AS j, {_cell_sql(fp, j)} AS cell FROM {src}"
        for j in range(CMS_DEPTH)
    )


# ---------------------------------------------------------------------------
# HLL (Apache DataSketches) distinct-count rollups via Spark's built-in
# hll_sketch_agg / hll_union_agg (SPARK-16484, Spark 3.5+)
# ---------------------------------------------------------------------------

#: lgConfigK for the HLL rollup queries. The DataSketches HLL sketch
#: stays in its exact coupon (LIST/SET) mode until ~0.75 * 2^(lgK-3)
#: distinct values — 6144 at lgK=16 — so every group in the fixture
#: correctness scales (max ~640 customers/nation, ~3000/region at
#: sf0.1) reads back the distinct count EXACTLY FOR THIS FIXTURE'S KEY
#: SET, which is what lets these queries keep a plain COUNT(DISTINCT)
#: DuckDB oracle instead of a weaker rows-only check. Caveat: coupons
#: are finite-width hash fragments, so two distinct keys CAN collide
#: (probability ~n^2/2^26 — a few percent at ~3k distinct); the
#: fixture's keys happen not to, verified by the green oracle rows.
#: A new fixture or scale may produce an off-by-one red row — widen the
#: oracle to a ±tolerance compare then, not the plan. Above the coupon
#: regime the estimate is approximate (±~1.6% at lgK=16).
HLL_LGK = 16


def hll_distinct(df: DataFrame, group: str, col: str) -> DataFrame:
    """(group, approx_distinct) via one HLL sketch per group."""
    return df.groupBy(group).agg(
        F.expr(
            f"hll_sketch_estimate(hll_sketch_agg({col}, {HLL_LGK}))"
        ).alias("approx_distinct")
    )


def hll_sketch_per_group(df: DataFrame, group: str, col: str) -> DataFrame:
    """(group, sk binary) — the mergeable partial. This is the layer a
    100 TB rollup stores: per-partition/per-day sketches are bytes, and
    any coarser grain is hll_union_agg over them with NO re-scan of the
    raw data (same mergeable-partials algebra as the linear-counting
    and CMS rollups above)."""
    return df.groupBy(group).agg(
        F.expr(f"hll_sketch_agg({col}, {HLL_LGK})").alias("sk")
    )


def hll_merge_estimate(
    sketches: DataFrame, group: str
) -> DataFrame:
    """(group, approx_distinct) by merging previously-built sketches —
    allowDifferentLgConfigK=false: partials are all HLL_LGK."""
    return sketches.groupBy(group).agg(
        F.expr(
            "hll_sketch_estimate(hll_union_agg(sk, false))"
        ).alias("approx_distinct")
    )
