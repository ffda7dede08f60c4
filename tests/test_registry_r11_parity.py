"""Differential tests for the round-11 STAGED queries (registry_r11.py)
vs their DuckDB oracles at sf0.001, plus independent-reference unit
tests for the aligned-span machinery — same harness as
test_registry_next_parity.py, so the staged surface stays continuously
green until round 11 registers it with the driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_spark.operators import dedup as dd
from retail_etl_pipeline_spark.registry_r11 import ORACLES, QUERIES

from .oracle_utils import compare

PARAMS = sorted(ORACLES.keys())


def test_staged_registry_is_consistent():
    assert set(QUERIES) == set(ORACLES)


def test_staged_names_not_registered_yet():
    """The staging contract: none of these names is in the driver-facing
    registry this round (the round-10 window budget is spent on stale
    rotation — DEVNOTES). Round 11 merges and DELETES this test's
    premise; its twin in test_registry_next_parity asserts the merged
    state."""
    from retail_etl_pipeline_spark.registry import QUERIES as REG

    overlap = set(QUERIES) & set(REG)
    assert not overlap, f"staged names already registered: {overlap}"


@pytest.mark.slow  # staged-surface oracle sweep — opt-in (verify-window fit)
@pytest.mark.parametrize("name", PARAMS)
def test_staged_query_matches_oracle(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, duck, ORACLES[name])
    spark.catalog.clearCache()
    assert not problems, f"{name}: " + " | ".join(problems)


# ---------------------------------------------------------------------------
# independent references for the aligned-span kernel
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(rows)],
        "doc_id long, text string, source string",
    )


def test_aligned_span_finds_planted_overlap(spark):
    """Two documents built to share exactly one 24-token run (unique
    filler elsewhere) must report longest_span == 24; a third document
    with no 3-gram overlap must not pair at all."""
    shared = " ".join(f"s{i}" for i in range(24))
    d0 = "a0 a1 a2 " + shared + " z0 z1 z2"
    d1 = "b0 b1 b2 b3 " + shared + " y0 y1"
    d2 = " ".join(f"q{i}" for i in range(30))
    out = {
        (r["doc_a"], r["doc_b"]): r["longest_span"]
        for r in dd.aligned_span_pairs(_docs(spark, [d0, d1, d2])).collect()
    }
    assert out == {(0, 1): 24}


def test_aligned_span_interrupted_run_splits(spark):
    """A one-token edit in the middle of a copied run splits it into
    two shorter diagonal islands — the reported longest_span is the
    longer half, not the sum (span semantics, not match-count
    semantics)."""
    left = " ".join(f"s{i}" for i in range(12))     # 12 tokens
    right = " ".join(f"t{i}" for i in range(8))     # 8 tokens
    d0 = left + " MID " + right
    d1 = left + " EDIT " + right
    out = dd.aligned_span_pairs(_docs(spark, [d0, d1])).collect()
    assert len(out) == 1
    # the two halves align on the SAME diagonal (equal lengths either
    # side) but the run breaks at the edited token: longest = 12
    assert out[0]["longest_span"] == 12


def test_substring_keep_drops_higher_id_only(spark):
    """The greedy rule keeps the lowest doc_id of an over-threshold
    pair and never drops a document that only appears as doc_a."""
    shared = " ".join(f"s{i}" for i in range(dd.MIN_SPAN_TOKENS))
    d0 = shared + " u0 u1 u2"
    d1 = shared + " w0 w1 w2"
    d2 = " ".join(f"q{i}" for i in range(30))
    kept = sorted(
        r["doc_id"]
        for r in dd.substring_dedup_keep(_docs(spark, [d0, d1, d2])).collect()
    )
    assert kept == [0, 2]


def test_rare_cap_is_conservative(spark):
    """Shingles over the df_cap are dropped from the index: a run made
    of corpus-wide boilerplate disappears (shorter or no span), it is
    never inflated — df_cap errs toward missing overlap, not inventing
    it."""
    common = " ".join(f"c{i}" for i in range(24))
    docs = _docs(spark, [common + f" pad{j}" for j in range(6)])
    # every 3-gram of `common` occurs 6 times; with df_cap=4 the index
    # drops them all -> no pairs at all
    assert dd.aligned_span_pairs(docs, df_cap=4).collect() == []
    # with a permissive cap the planted 24-token run is found for every
    # one of the 15 pairs
    out = dd.aligned_span_pairs(docs, df_cap=100).collect()
    assert len(out) == 15
    assert all(r["longest_span"] == 24 for r in out)


def test_ivf_cell_quality_brute_force(spark, sf_dir):
    """mean_dist2 per cell must match a numpy recomputation of the
    member-to-centroid squared L2 under the same per-member rounding."""
    import numpy as np

    from retail_etl_pipeline_spark.operators import fixtures_adapter as fx
    from retail_etl_pipeline_spark.operators import similarity as sim

    emb = fx._read(spark, sf_dir, "embeddings")
    vecs = sim._vectors(emb)
    cells, cents = sim._lloyd_refined_cells(vecs, 1)
    got = {
        r["cell"]: (r["n_vectors"], r["mean_dist2"])
        for r in sim.ivf_cell_quality(emb).collect()
    }
    rows = cells.select("vec_id", "v", "cell").collect()
    by_cell: dict[int, list[float]] = {}
    for r in rows:
        c = np.array(cents[r["cell"]])
        v = np.array(r["v"])
        d2 = float(v @ v) - 2 * float(v @ c) + float(c @ c)
        by_cell.setdefault(r["cell"], []).append(round(d2, 6))
    assert set(got) == set(by_cell)
    for cell, ds in by_cell.items():
        n, mean = got[cell]
        assert n == len(ds)
        assert mean == pytest.approx(sum(ds) / len(ds), abs=2e-6)


def test_span_removal_cuts_only_higher_doc(spark):
    """Keep-one-copy: the lower doc of a duplicated span reports zero
    removal; the higher doc loses exactly the span's token count; a
    disjoint doc is untouched."""
    span = " ".join(f"s{i}" for i in range(dd.MIN_SPAN_TOKENS))
    d0 = span + " u0 u1 u2"
    d1 = "w0 w1 " + span + " w2"
    d2 = " ".join(f"q{i}" for i in range(30))
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"])
        for r in dd.exact_span_removal_stats(
            _docs(spark, [d0, d1, d2])
        ).collect()
    }
    assert out[0] == (dd.MIN_SPAN_TOKENS + 3, 0)
    assert out[1] == (dd.MIN_SPAN_TOKENS + 3, dd.MIN_SPAN_TOKENS)
    assert out[2] == (30, 0)


def test_span_removal_overlapping_runs_dedup_positions(spark):
    """Two runs against two different lower docs overlapping in the
    same higher doc must not double-count the shared positions."""
    left = " ".join(f"a{i}" for i in range(dd.MIN_SPAN_TOKENS))
    right = " ".join(f"b{i}" for i in range(dd.MIN_SPAN_TOKENS))
    mid = " ".join(f"m{i}" for i in range(4))
    # doc2 contains left+mid+right; doc0 shares left+mid, doc1 mid+right
    d0 = left + " " + mid + " x0 x1"
    d1 = "y0 y1 " + mid + " " + right
    d2 = left + " " + mid + " " + right
    out = {
        r["doc_id"]: r["n_removed"]
        for r in dd.exact_span_removal_stats(
            _docs(spark, [d0, d1, d2])
        ).collect()
    }
    total = 2 * dd.MIN_SPAN_TOKENS + 4
    assert out[0] == 0 and out[1] == 0
    # both runs cover doc2; the 4 mid tokens overlap and count once
    assert out[2] == total


def test_split_span_contamination_planted_leak(spark):
    """A >= MIN_SPAN_TOKENS run planted across a train doc and a test
    doc must surface as exactly one cross-split row with the right
    sides; a same-split duplicate pair must NOT appear (that is
    dedup's business, not leakage)."""
    from retail_etl_pipeline_spark.operators import corpus as cp

    def split_of(doc_id: int) -> str:
        h = (doc_id * cp.SPLIT_MIX) % cp.SPLIT_MOD
        if h < cp.SPLIT_TRAIN_LT:
            return "train"
        if h < cp.SPLIT_VAL_LT:
            return "val"
        return "test"

    train_ids = [i for i in range(200) if split_of(i) == "train"]
    test_ids = [i for i in range(200) if split_of(i) == "test"]
    a, a2 = train_ids[0], train_ids[1]
    b = test_ids[0]
    span = " ".join(f"s{i}" for i in range(dd.MIN_SPAN_TOKENS))
    filler1 = " ".join(f"u{i}" for i in range(5))
    filler2 = " ".join(f"w{i}" for i in range(5))
    dup = " ".join(f"d{i}" for i in range(dd.MIN_SPAN_TOKENS))
    rows = [
        (a, span + " " + filler1, "src"),       # train, leaks to test
        (b, filler2 + " " + span, "src"),       # test side of the leak
        (a2, dup + " x0", "src"),               # train/train duplicate
        (train_ids[2], dup + " y0", "src"),     # (excluded from output)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = dd.split_span_contamination(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["split_lo"], r["split_hi"]) == ("test", "train")
    assert r["n_pairs"] == 1 and r["max_span"] == dd.MIN_SPAN_TOKENS
    assert r["n_docs_lo"] == 1 and r["n_docs_hi"] == 1
