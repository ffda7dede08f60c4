"""Round-10 operator tests: the trained-state memo, the IVF-PQ16
index lifecycle (train -> add -> search), SemDeDup cell-count
parameterization, and the CCNet staged-mix composition — each checked
against an independent reference (the one-shot twins, a brute-force
recompute, or composing the constituent operators separately), never
against its own oracle SQL."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_spark.operators import fixtures_adapter as fx
from retail_etl_pipeline_spark.operators import similarity as sim

SF0001 = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------------------
# trained-state memo
# ---------------------------------------------------------------------------


def test_trained_memo_hits_and_is_keyed_by_corpus(spark):
    """Two reads of the same path share one trained-books object; a
    different corpus (or params) trains its own — the memo can never
    serve one corpus's codebooks to another."""
    emb1 = fx._read(spark, SF0001, "embeddings")
    emb2 = fx._read(spark, SF0001, "embeddings")
    v1, v2 = sim._vectors(emb1), sim._vectors(emb2)
    b1 = sim._pq8_family_books(v1, 1, sim.PQ16_M, sim.PQ16_DIMS)
    b2 = sim._pq8_family_books(v2, 1, sim.PQ16_M, sim.PQ16_DIMS)
    assert b1 is b2, "same corpus+params must hit the memo"
    # different params -> different trained object
    b0 = sim._pq8_family_books(v1, 0, sim.PQ16_M, sim.PQ16_DIMS)
    assert b0 is not b1
    # a projection that changes the relation is a different corpus key
    # (slice keeps all 256 PQ seed vectors so training stays defined)
    half = v1.where(F.col("vec_id") < 400)
    bh = sim._pq8_family_books(half, 1, sim.PQ16_M, sim.PQ16_DIMS)
    assert bh is not b1
    assert bh != b1, "half-corpus training must differ from full"


def test_trained_memo_kill_switch(spark, monkeypatch):
    """SPARK_GRAFT_TRAIN_CACHE=0 bypasses the memo but returns equal
    values (training is deterministic)."""
    emb = fx._read(spark, SF0001, "embeddings")
    vecs = sim._vectors(emb)
    cached = sim._seed_centroids(vecs)
    monkeypatch.setenv("SPARK_GRAFT_TRAIN_CACHE", "0")
    fresh = sim._seed_centroids(vecs)
    assert fresh is not cached
    assert fresh == cached


# ---------------------------------------------------------------------------
# IVF-PQ16 index lifecycle
# ---------------------------------------------------------------------------


def test_index_serve_matches_one_shot_queries(spark):
    """The serve path over a built index returns row-for-row what the
    one-shot (train-inside-the-query) twins return — the lifecycle
    changes WHEN training happens, never the result."""
    emb = fx._read(spark, SF0001, "embeddings")
    idx = sim.ivfpq16_index_for(emb)
    assert _rows(sim.ann_ivfpq16_serve_topk(idx)) == _rows(
        sim.ann_ivfpq16_topk(emb)
    )
    assert _rows(sim.ann_ivfpq16_serve_rerank_topk(idx)) == _rows(
        sim.ann_ivfpq16_rerank_topk(emb)
    )


def test_index_build_is_cached_and_serve_plan_is_pure(spark):
    """ivfpq16_index_for memoizes per (session, corpus, params); the
    ADC serve plan has no join and no global sort (the cells x codes
    join happened once at build), and the rerank plan's only join is
    the broadcast shortlist fetch."""
    emb = fx._read(spark, SF0001, "embeddings")
    idx1 = sim.ivfpq16_index_for(emb)
    idx2 = sim.ivfpq16_index_for(emb)
    assert idx1 is idx2
    plan = (
        sim.ann_ivfpq16_serve_topk(idx1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
    rplan = (
        sim.ann_ivfpq16_serve_rerank_topk(idx1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert rplan.count("Join") == 1
    assert "Broadcast" in rplan
    assert "TakeOrderedAndProject" in rplan


def test_index_write_read_roundtrip_partition_pruning(spark, tmp_path):
    """write_ivfpq16_index persists the serving table partitioned by
    cell; reloading and filtering on probe cells turns the filter into
    PartitionFilters (directory pruning — the 100 TB serving shape),
    and the reloaded table serves identical ADC results."""
    emb = fx._read(spark, SF0001, "embeddings")
    idx = sim.ivfpq16_index_for(emb)
    path = str(tmp_path / "ivfpq16_index")
    sim.write_ivfpq16_index(idx, path)
    reloaded = sim.read_ivfpq16_index_table(spark, path)
    assert set(reloaded.columns) == {
        "vec_id", "label", "cell", "pq_lo", "pq_hi",
    }
    assert reloaded.count() == idx.coded.count()
    qv = sim._query_vec(idx.vecs, 0)
    probe = sim._probe_cells(qv, idx.cents, sim.IVF_NPROBE)
    pruned = reloaded.where(F.col("cell").isin(*probe))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the cell predicate must be a partition filter, not a data filter
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in seg
    # served results off the reloaded table == in-session index
    disk_idx = sim.IvfPq16Index(
        coded=reloaded, vecs=idx.vecs, cents=idx.cents, books=idx.books
    )
    assert _rows(sim.ann_ivfpq16_serve_topk(disk_idx)) == _rows(
        sim.ann_ivfpq16_serve_topk(idx)
    )


# ---------------------------------------------------------------------------
# SemDeDup cell-count parameterization
# ---------------------------------------------------------------------------


def test_semdedup_cell_count_rule():
    """k ~= ceil(n/target), floored at 2 — the paper's constant-
    expected-cell-population regime: 10x the corpus -> 10x the cells."""
    assert sim.semdedup_cell_count(500) == 8  # the fixture default
    assert sim.semdedup_cell_count(5_000) == 79
    assert sim.semdedup_cell_count(5_000_000) == 78_125
    # proportional within ceiling slack: 10x corpus -> ~10x cells
    assert (
        abs(
            sim.semdedup_cell_count(5_000_000)
            - 10 * sim.semdedup_cell_count(500_000)
        )
        <= 10
    )
    assert sim.semdedup_cell_count(1) == 2
    assert sim.semdedup_cell_count(100, target_cell_size=10) == 10


def test_semdedup_k32_plan_stays_cell_bucketed(spark):
    """At k=32 (4x the default) the pair relation must still be an
    equi-join keyed on the cell id — never a cartesian/broadcast-
    nested-loop — and more cells must not drop MORE rows than fewer
    cells (pairs only vanish when a cell boundary splits them)."""
    emb = fx._read(spark, SF0001, "embeddings")
    k32 = sim.semdedup_keep(emb, k=32)
    plan = k32._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan
    n_default = sim.semdedup_keep(emb).count()
    n_k32 = k32.count()
    total = emb.count()
    assert n_default <= n_k32 <= total
    # independent brute-force check of the k=32 drop rule on a sample:
    # every dropped row must have a lower-id epsilon-neighbor in its
    # own cell, every kept row must not
    cells = sim._semdedup_cells(emb, 32)
    rows = cells.select("vec_id", "cell", "v").collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    import math

    def cos(a, b):
        s = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return s / na / nb

    kept_ids = {r["vec_id"] for r in k32.collect()}
    for cell, members in by_cell.items():
        members.sort(key=lambda r: r["vec_id"])
        for i, r in enumerate(members):
            has_lower_dup = any(
                round(cos(list(q["v"]), list(r["v"])), 6)
                >= sim.COSINE_NEARDUP_THRESHOLD
                for q in members[:i]
            )
            assert (r["vec_id"] not in kept_ids) == has_lower_dup, (
                f"vec {r['vec_id']} cell {cell}"
            )


# ---------------------------------------------------------------------------
# CCNet staged mix
# ---------------------------------------------------------------------------


def test_ccnet_staged_mix_equals_stage_then_mix(spark):
    """The composed pipeline == running the stage and the mix recipe
    separately: take the head+middle band by explicit NTILE-equivalent
    bucketing, recompute uniform-target weights/budgets over the band
    in plain Python (exact integer arithmetic), apply the greedy
    fluent-first cut — per-source keep counts and token totals must
    match the one-pipeline operator."""
    from retail_etl_pipeline_spark.operators import selection as sel

    docs = fx._read(spark, SF0001, "documents")
    got = {
        r["source"]: (
            r["weight_ppm"], r["budget_tokens"], r["n_kept"],
            r["tokens_kept"], r["n_head"], r["n_middle"],
        )
        for r in sel.ccnet_staged_mix(docs).collect()
    }

    # independent staging: rank by (xent, doc_id), exact NTILE(3)
    xr = [
        (r["doc_id"], r["n_tokens"], r["xent"])
        for r in sel.unigram_logprob_quality(docs).collect()
    ]
    src = {
        r["doc_id"]: r["source"]
        for r in docs.select("doc_id", "source").collect()
    }
    xr.sort(key=lambda t: (t[2], t[0]))
    n = len(xr)
    q, rem = divmod(n, 3)
    sizes = [q + 1 if i < rem else q for i in range(3)]
    band = []  # head+middle
    pos = 0
    for b, size in enumerate(sizes, start=1):
        chunk = xr[pos : pos + size]
        pos += size
        if b <= 2:
            band.extend((d, tk, xe, b) for d, tk, xe in chunk)

    # independent mix: exact integer ppm arithmetic over the band
    per: dict[str, int] = {}
    for d, tk, _, _ in band:
        per[src[d]] = per.get(src[d], 0) + tk
    tot = sum(per.values())
    nsrc = len(per)
    wts = {
        s: ((1_000_000 // nsrc) * 1_000_000)
        // ((per[s] * 1_000_000) // tot)
        for s in per
    }
    mass = {s: per[s] * wts[s] for s in per}
    mt = sum(mass.values())
    budgets = {
        s: (sel.CCNET_MIX_POOL_TOKENS * mass[s]) // mt for s in per
    }

    # independent greedy cut: bucket asc, xent asc, doc_id asc
    want: dict[str, tuple] = {}
    by_src: dict[str, list] = {}
    for d, tk, xe, b in band:
        by_src.setdefault(src[d], []).append((b, xe, d, tk))
    for s, items in by_src.items():
        items.sort()
        cum = kept = toks = heads = mids = 0
        for b, xe, d, tk in items:
            cum += tk
            if cum > budgets[s]:
                break
            kept += 1
            toks += tk
            heads += b == 1
            mids += b == 2
        want[s] = (wts[s], budgets[s], kept, toks, heads, mids)

    assert got == want


def test_ccnet_staged_mix_budget_scales_with_pool(spark):
    """Doubling the token pool must not shrink any source's budget or
    keep count (monotonicity of the budget recipe)."""
    from retail_etl_pipeline_spark.operators import selection as sel

    docs = fx._read(spark, SF0001, "documents")
    small = {
        r["source"]: (r["budget_tokens"], r["n_kept"])
        for r in sel.ccnet_staged_mix(docs, pool_tokens=30000).collect()
    }
    big = {
        r["source"]: (r["budget_tokens"], r["n_kept"])
        for r in sel.ccnet_staged_mix(docs, pool_tokens=60000).collect()
    }
    assert set(small) == set(big)
    for s in small:
        assert big[s][0] >= small[s][0]
        assert big[s][1] >= small[s][1]


def test_pq_seed_band_incomplete_is_loud(spark):
    """Training PQ codebooks on a corpus that lost part of the
    256-vector seed band raises a named contract error up front instead
    of a downstream KeyError mid-train (the r10 DEVNOTES known edge)."""
    emb = fx._read(spark, SF0001, "embeddings")
    sliced = sim._vectors(emb).where(F.col("vec_id") < 100)
    with pytest.raises(ValueError, match="PQ seed band incomplete"):
        sim._pq8_books(sliced)


def test_ivfpq16_index_stats_census_invariants(spark):
    """The census must partition the corpus: per-cell populations sum
    to |corpus|, every cell has >= 1 vector, code diversity is bounded
    by population, and the numbers agree with counting the coded table
    directly."""
    emb = fx._read(spark, SF0001, "embeddings")
    idx = sim.ivfpq16_index_for(emb)
    stats = {
        r["cell"]: (r["n_vectors"], r["n_codes"])
        for r in sim.ivfpq16_index_stats(idx).collect()
    }
    total = emb.count()
    assert sum(n for n, _ in stats.values()) == total
    assert all(n >= 1 and 1 <= c <= n for n, c in stats.values())
    direct = {
        r["cell"]: r["cnt"]
        for r in idx.coded.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert {c: n for c, (n, _) in stats.items()} == direct


# ---------------------------------------------------------------------------
# round-10 second-session kernels: Cochran-Armitage, stratified sample,
# bigram-LM quality — independent references, never their own oracles
# ---------------------------------------------------------------------------


def _ca(spark, rows):
    """rows: list of (flag, w)."""
    from retail_etl_pipeline_spark.functions.stats import cochran_armitage

    df = spark.createDataFrame(rows, "flag boolean, w long")
    return cochran_armitage(df, "flag", "w").collect()[0]


def test_cochran_armitage_matches_float_brute_force(spark):
    """z must match the textbook float formula computed independently in
    Python on a small asymmetric table."""
    import math

    # group w -> (n, r): rate clearly rising with w
    table = {0: (40, 4), 1: (35, 9), 2: (30, 14), 3: (25, 17)}
    rows = []
    for w, (n, r) in table.items():
        rows += [(True, w)] * r + [(False, w)] * (n - r)
    got = _ca(spark, rows)
    n_tot = sum(n for n, _ in table.values())
    r_tot = sum(r for _, r in table.values())
    p = r_tot / n_tot
    t = sum(w * (r - n * p) for w, (n, r) in table.items())
    var = (
        p
        * (1 - p)
        * (
            sum(w * w * n for w, (n, _) in table.items())
            - sum(w * n for w, (n, _) in table.items()) ** 2 / n_tot
        )
    )
    z_ref = t / math.sqrt(var)
    assert got["n_groups"] == 4
    assert got["n_total"] == n_tot and got["n_events"] == r_tot
    assert got["z"] == pytest.approx(z_ref, abs=1e-6)
    assert got["z"] > 3  # the planted trend is strong


def test_cochran_armitage_shift_invariant_and_sign(spark):
    """Shifting every score by a constant leaves z unchanged (the
    centered statistic); reversing the score order flips the sign."""
    table = {5: (30, 3), 6: (30, 10), 7: (30, 18)}
    rows = []
    for w, (n, r) in table.items():
        rows += [(True, w)] * r + [(False, w)] * (n - r)
    base = _ca(spark, rows)["z"]
    shifted = _ca(spark, [(f, w + 1000) for f, w in rows])["z"]
    flipped = _ca(spark, [(f, -w) for f, w in rows])["z"]
    assert shifted == base
    assert flipped == pytest.approx(-base, abs=1e-6)


def test_cochran_armitage_degenerate_cases(spark):
    """z is NULL when every row is an event, no row is, there is one
    group, or the input is empty — never a divide-by-zero."""
    one_group = [(True, 3), (False, 3), (False, 3)]
    assert _ca(spark, one_group)["z"] is None
    all_events = [(True, 0), (True, 1), (True, 2)]
    assert _ca(spark, all_events)["z"] is None
    no_events = [(False, 0), (False, 1)]
    assert _ca(spark, no_events)["z"] is None
    empty = spark.createDataFrame([], "flag boolean, w long")
    from retail_etl_pipeline_spark.functions.stats import cochran_armitage

    row = cochran_armitage(empty, "flag", "w").collect()[0]
    assert row["z"] is None and row["n_total"] == 0


def test_stratified_sample_quota_and_determinism(spark):
    """Each source yields min(quota, |source|) rows, ranks are 1..k
    dense, a small source keeps everything, and the sample is identical
    across runs (pure hash priority)."""
    from retail_etl_pipeline_spark.operators import selection as sel

    rows = [(i, f"t{i}", "big") for i in range(30)] + [
        (100 + i, f"t{i}", "tiny") for i in range(3)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = sel.stratified_sample_by_source(docs, per_source=5).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["big"]) == 5
    assert sorted(r["sample_rank"] for r in by_src["big"]) == [1, 2, 3, 4, 5]
    assert len(by_src["tiny"]) == 3  # under quota: keep all
    again = sel.stratified_sample_by_source(docs, per_source=5).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_bigram_quality_sees_token_order(spark):
    """A document whose words are common but whose ORDER is novel must
    score strictly worse (higher xent2) than a same-vocabulary document
    in the dominant order — the signal unigram xent cannot produce."""
    from retail_etl_pipeline_spark.operators import selection as sel

    corpus = [(i, "alpha beta gamma delta", "s") for i in range(9)]
    corpus.append((9, "delta gamma beta alpha", "s"))
    docs = spark.createDataFrame(
        corpus, "doc_id long, text string, source string"
    )
    out = {
        r["doc_id"]: r["xent2"]
        for r in sel.bigram_logprob_quality(docs).collect()
    }
    assert len(out) == 10
    assert out[9] > out[0] + 0.5
    # unigram xent is blind to the reordering: identical scores
    uni = {
        r["doc_id"]: r["xent"]
        for r in sel.unigram_logprob_quality(docs).collect()
    }
    assert uni[9] == uni[0]


def test_bigram_quality_hand_computed(spark):
    """Tiny corpus checked against the add-1 conditional model computed
    by hand in Python floats."""
    import math

    from retail_etl_pipeline_spark.operators import selection as sel

    docs = spark.createDataFrame(
        [(0, "a b a b", "s"), (1, "a b c", "s")],
        "doc_id long, text string, source string",
    )
    # corpus bigrams: doc0: (a,b)x2 (b,a)x1; doc1: (a,b) (b,c)
    cab = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    ca = {"a": 3, "b": 2}
    v = 3  # tokens a, b, c
    def xent(bigrams):
        n = len(bigrams)
        s = sum(
            math.log(ca[a] + v) - math.log(cab[(a, b)] + 1)
            for a, b in bigrams
        )
        return s / n

    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent2"])
        for r in sel.bigram_logprob_quality(docs).collect()
    }
    assert got[0][0] == 3 and got[1][0] == 2
    assert got[0][1] == pytest.approx(
        xent([("a", "b"), ("b", "a"), ("a", "b")]), abs=1e-6
    )
    assert got[1][1] == pytest.approx(
        xent([("a", "b"), ("b", "c")]), abs=1e-6
    )


def test_ivf_recall_census_monotone_and_bounded(spark):
    """Candidates at nprobe p are a subset of p+1's, so recall must be
    non-decreasing in nprobe and bounded by 1.0; hits never exceed
    |Q| x k."""
    emb = fx._read(spark, SF0001, "embeddings")
    rows = sorted(
        (r["nprobe"], r["hits"], r["recall_ppm"])
        for r in sim.ivf_recall_census(emb).collect()
    )
    assert [p for p, _, _ in rows] == [1, 2, 4]
    cap = len(sim.RECALL_QIDS) * sim.TOP_K
    last = -1
    for _, h, ppm in rows:
        assert 0 <= h <= cap
        assert ppm >= last
        last = ppm
        assert ppm <= 1_000_000


def test_residual_ivfpq_shares_scan_shape_with_plain(spark):
    """The residual variant's output schema and probe-filter shape match
    ann_ivfpq16_topk (same serving cost); the rankings may differ (the
    point of residual encoding)."""
    emb = fx._read(spark, SF0001, "embeddings")
    plain = sim.ann_ivfpq16_topk(emb)
    resid = sim.ann_ivfpq16_residual_topk(emb)
    assert plain.columns == resid.columns
    assert resid.count() == sim.TOP_K


# ---------------------------------------------------------------------------
# r10 optimization round: the vectorized quantization kernels
# (similarity._js_np_udf / _cell_np_udf) replaced the interpreted
# higher-order-function argmin/argmax in every PQ/IVF assignment path.
# The expression forms are KEPT as the reference spec (_cell_expr,
# _sub_code_idx via _pq8_sliced/_pq8_with_dists/_pq8_idx); these tests
# lock FULL-CORPUS equality of the two forms — code indexes and cell
# ids for every vector, both distance families, both (m, d) layouts.
# ---------------------------------------------------------------------------


def _js_expr_rows(vecs, books, m, d, form):
    """Per-vector code indexes via the REFERENCE expression forms."""
    if form == "3term":
        cols = [
            sim._sub_code_idx(s, books).alias(f"j{s}") for s in range(m)
        ]
        return {
            r["vec_id"]: [r[f"j{s}"] for s in range(m)]
            for r in vecs.select("vec_id", *cols).collect()
        }
    sliced = sim._pq8_sliced(vecs, m=m, d=d)
    with_d = sim._pq8_with_dists(sliced, books)
    cols = [sim._pq8_idx(s).alias(f"j{s}") for s in range(m)]
    return {
        r["vec_id"]: [r[f"j{s}"] for s in range(m)]
        for r in with_d.select("vec_id", *cols).collect()
    }


@pytest.mark.parametrize(
    "m,d,form",
    [
        (sim.PQ16_M, sim.PQ16_DIMS, "2term"),
        (sim.PQ_M, sim.PQ_DIMS, "2term"),
        (sim.PQ_M, sim.PQ_DIMS, "3term"),
    ],
)
def test_np_code_assignment_equals_expression_form(spark, m, d, form):
    emb = fx._read(spark, SF0001, "embeddings")
    vecs = sim._vectors(emb)
    if form == "3term":
        books = sim._pq_codebooks(vecs)
    else:
        books = sim._pq8_books(vecs, m=m, d=d)
    ref = _js_expr_rows(vecs, books, m, d, form)
    got = {
        r["vec_id"]: list(r["js"])
        for r in vecs.select(
            "vec_id", sim._js_np_udf(books, m, d, form).alias("js")
        ).collect()
    }
    assert got == ref


def test_np_cell_assignment_equals_expression_form(spark):
    emb = fx._read(spark, SF0001, "embeddings")
    vecs = sim._vectors(emb)
    for cents in (
        sim._seed_centroids(vecs),
        sim._lloyd_cents_impl(vecs, 1),
    ):
        ref = {
            r["vec_id"]: r["cell"]
            for r in vecs.select(
                "vec_id", sim._cell_expr(cents).alias("cell")
            ).collect()
        }
        got = {
            r["vec_id"]: r["cell"]
            for r in vecs.select(
                "vec_id", sim._cell_np_udf(cents).alias("cell")
            ).collect()
        }
        assert got == ref


def test_np_pack_words_match_expression_shift_sum(spark):
    """The packed bigint words (incl. the signed-overflow wrap of the
    high PQ16 shifts) equal the expression packers' output."""
    emb = fx._read(spark, SF0001, "embeddings")
    vecs = sim._vectors(emb)
    books = sim._pq8_books(vecs, m=sim.PQ16_M, d=sim.PQ16_DIMS)
    got = {
        r["vec_id"]: (r["pq_lo"], r["pq_hi"])
        for r in sim._pq16_pack(vecs, books).collect()
    }
    js = _js_expr_rows(vecs, books, sim.PQ16_M, sim.PQ16_DIMS, "2term")

    def wrap(x):
        x &= (1 << 64) - 1
        return x - (1 << 64) if x >= 1 << 63 else x

    for vid, codes in js.items():
        lo = wrap(sum(codes[s] << (8 * s) for s in range(8)))
        hi = wrap(sum(codes[s] << (8 * (s - 8)) for s in range(8, 16)))
        assert got[vid] == (lo, hi), vid
