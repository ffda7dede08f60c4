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
the suite cost; the generous gate is sized for single-run noise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "BENCH_LOCAL.json")


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

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = os.environ.get(
        "SPARK_GRAFT_SF_DIR", f"/root/testdata/sf{record.get('sf', 0.1)}"
    )
    env["SPARK_GRAFT_BENCH_RUNS"] = "1"
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
        ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")
    ][-1]
    new = json.loads(line)
    nq = new["queries"]

    bad = regressions(old, nq)
    assert not bad, "structural bench regressions vs BENCH_LOCAL.json: " + (
        ", ".join(f"{n}: {a:.2f}s -> {b:.2f}s" for n, a, b in bad)
    )
    shared = set(old) & set(nq)
    old_total = sum(old[n] for n in shared)
    new_total = sum(nq[n] for n in shared)
    assert new_total <= 2.0 * old_total + 30.0, (
        f"diffuse regression: shared-query total {old_total:.0f}s -> "
        f"{new_total:.0f}s"
    )
