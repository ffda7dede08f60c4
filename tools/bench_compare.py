"""Diff two bench.py JSON outputs: per-query deltas, new/removed queries.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 2.0]

Prints queries whose time changed by more than the threshold ratio (in
either direction), plus additions/removals and the total delta. Built
for the round-over-round BENCH_r{N}.json comparison this repo's
DEVNOTES does by hand each round — and because this VM shows
multi-second scheduler stalls, anything under ~2x should be treated as
noise and re-measured in isolation before acting (DEVNOTES: bench
variance).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    """Accept either bench.py's own one-line JSON or the driver's
    BENCH_r{N}.json wrapper, whose 'tail' field embeds a (possibly
    truncated) suffix of the bench line — recover what per-query pairs
    survive with a regex."""
    import re

    with open(path) as f:
        text = f.read().strip()
    try:
        doc = json.loads(text)
    except ValueError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc:
        return doc
    if isinstance(doc, dict) and "tail" in doc:
        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', doc["tail"])
        queries = {
            k: float(v)
            for k, v in pairs
            if k not in ("metric", "value", "sf", "n", "rc", "cpus")
        }
        # the wrapper has no headline total; reconstruct it from the
        # recovered per-query times (marked truncated — the tail may
        # have been cut, so this is a lower bound)
        return {
            "value": round(sum(queries.values()), 1),
            "queries": queries,
            "truncated": True,
        }
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError(f"no JSON object found in {path}")


#: queries whose timing is known-noisy on this VM beyond what the
#: additive slack absorbs (documented in BENCH_DIFF_r{N}.md triage);
#: empty today — add a name ONLY with an isolated re-measure on record
NOISE_ALLOWLIST: frozenset[str] = frozenset()


def regressions(
    old: dict[str, float],
    new: dict[str, float],
    ratio: float = 3.0,
    slack_sec: float = 4.0,
) -> list[tuple[str, float, float]]:
    """Structural per-query regressions between two bench runs: queries
    where new > max(ratio*old, old + slack_sec). The two-sided gate is
    deliberately generous — this VM shows multi-second scheduler stalls
    (BENCH_DIFF_r06.md: 1-3 s additive inflations on sub-second
    queries), so the additive slack absorbs stalls while the ratio term
    still catches real plan blowups on multi-second queries (e.g. the
    pre-r6 KS kernel recomputing its subtree 3x). Used by
    tests/test_bench_regression.py as the in-suite CI gate."""
    out = []
    for name in sorted(set(old) & set(new) - NOISE_ALLOWLIST):
        a, b = old[name], new[name]
        if b > max(ratio * a, a + slack_sec):
            out.append((name, a, b))
    return sorted(out, key=lambda t: -(t[2] / max(t[1], 1e-9)))


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold",
        type=float,
        default=2.0,
        help="report ratio beyond which a per-query change is shown",
    )
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.5,
        help="ignore queries faster than this in BOTH runs (noise floor)",
    )
    args = ap.parse_args(argv)

    old, new = _load(args.old), _load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    print(
        f"total: {old.get('value')}s ({len(oq)} queries) -> "
        f"{new.get('value')}s ({len(nq)} queries)"
    )
    if added:
        t = sum(nq[n] for n in added)
        print(f"added ({len(added)}, {t:.1f}s): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    flagged = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if max(a, b) < args.min_sec:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio >= args.threshold or ratio <= 1 / args.threshold:
            flagged.append((ratio, name, a, b))
    if flagged:
        print(f"\nchanged beyond {args.threshold}x (re-measure in isolation "
              "before optimizing — scheduler stalls mimic regressions):")
        for ratio, name, a, b in sorted(flagged, reverse=True):
            print(f"  {ratio:6.2f}x  {name}: {a:.2f}s -> {b:.2f}s")
    else:
        print(f"\nno per-query change beyond {args.threshold}x "
              f"(noise floor {args.min_sec}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
