"""In-suite bench regression gate (VERDICT r6 item 3): run the real
bench CLI at the recorded scale factor and fail on STRUCTURAL per-query
regressions against the committed BENCH_LOCAL.json record — so a plan
regression (like the pre-r6 KS kernel re-computing its subtree 3x)
fails the suite instead of waiting for a judge round.

Gate design (tools/bench_compare.regressions): a query fails only when
new > max(3.0 * old, old + 4.0 s). The additive slack absorbs this
VM's documented scheduler-stall noise class (1-3 s inflations on
sub-second queries, BENCH_DIFF_r06.md); the ratio term catches real
blowups on multi-second queries. A total-time backstop (2x + 30 s)
catches diffuse regressions no single query trips. Queries added since
the record pass unconditionally (no baseline); removed ones are the
rotation's business, not this gate's.

Set SPARK_GRAFT_SKIP_BENCH_CI=1 to skip during tight iteration loops
(the round-close suite run must NOT set it). The subprocess runs a
single-pass sweep (SPARK_GRAFT_BENCH_RUNS=1) — min-of-3 would triple
the suite cost. Because this VM's scheduler stalls reach ~7 s on a
single pass (past any sane additive slack), first-pass flags are not
failures yet: the flagged queries are RE-MEASURED in isolation
(SPARK_GRAFT_BENCH_ONLY, min-of-3 — the same triage loop
BENCH_DIFF_r{N}.md documents) and only a reproduced regression fails.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "BENCH_LOCAL.json")


@pytest.mark.slow  # full bench subprocess — opt-in (r11 VERDICT item 2)
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_BENCH_CI") == "1",
    reason="bench CI skipped by env (iteration loop)",
)
def test_bench_no_structural_regressions():
    sys.path.insert(0, REPO)
    from tools.bench_compare import regressions

    if not os.path.exists(RECORD):
        pytest.skip("no committed BENCH_LOCAL.json record")
    with open(RECORD) as f:
        record = json.load(f)
    old = record.get("queries", {})
    assert old, "record has no per-query timings"

    # the record must be the committed full-scale reference, not a
    # stray ad-hoc overwrite (bench.py only writes it under
    # SPARK_GRAFT_BENCH_RECORD=1 now, but belt-and-braces)
    assert record.get("sf") == 0.1 and len(old) > 200, (
        "BENCH_LOCAL.json is not the committed sf0.1 full-registry "
        "record — restore it (git checkout BENCH_LOCAL.json)"
    )

    def run_bench(extra_env):
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        env.update(extra_env)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            cwd=REPO,
            env=env,
            timeout=3600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [
            ln
            for ln in proc.stdout.splitlines()
            if ln.strip().startswith("{")
        ][-1]
        return json.loads(line)["queries"]

    nq = run_bench({"SPARK_GRAFT_BENCH_RUNS": "1"})

    iso: dict[str, float] = {}
    bad = regressions(old, nq)
    if bad:
        # isolated min-of-3 re-measure of ONLY the flagged queries —
        # single-pass scheduler stalls on this VM reach ~7 s and must
        # not fail the suite; a structural regression reproduces here
        iso = run_bench(
            {
                "SPARK_GRAFT_BENCH_RUNS": "3",
                "SPARK_GRAFT_BENCH_ONLY": ",".join(n for n, _, _ in bad),
            }
        )
        bad = regressions(
            {n: old[n] for n, _, _ in bad}, iso
        )
    assert not bad, "structural bench regressions vs BENCH_LOCAL.json: " + (
        ", ".join(f"{n}: {a:.2f}s -> {b:.2f}s" for n, a, b in bad)
    )
    # diffuse backstop: catches an across-the-board slowdown no single
    # query trips (e.g. everything uniformly 1.9x). Substitute the
    # isolation re-measures for the flagged queries FIRST — in a
    # stall-heavy window (r9: 28 flags, worst 2.9s -> 238.8s in-sweep
    # vs 3.8s isolated) the raw single-pass total is dominated by the
    # same environmental mass the per-query triage just cleared, and a
    # backstop without the substitution fails on weather, not plans. A
    # REAL diffuse regression still fails: isolation re-measures
    # reproduce genuine slowdowns.
    shared = set(old) & set(nq)
    old_total = sum(old[n] for n in shared)
    new_total = sum(iso.get(n, nq[n]) for n in shared)
    assert new_total <= 2.0 * old_total + 30.0, (
        f"diffuse regression: shared-query total {old_total:.0f}s -> "
        f"{new_total:.0f}s (after isolation substitution)"
    )
    # ...but the substitution could also MASK a real slowdown that only
    # manifests under full-sweep conditions (cross-query memory/cache
    # contention) — clean isolated runs would launder it (r9 ADVICE).
    # So the RAW sweep total gets its own much looser ceiling that the
    # documented stall-noise class (a handful of multi-second
    # inflations) cannot reach, but a uniform sweep-only 4x can.
    raw_total = sum(nq[n] for n in shared)
    assert raw_total <= 4.0 * old_total + 60.0, (
        f"raw-sweep diffuse regression: shared-query total "
        f"{old_total:.0f}s -> {raw_total:.0f}s before isolation — "
        "a slowdown this large is not stall noise even if isolated "
        "re-measures look clean"
    )
