"""Element-wise-min merge of two bench.py records into the committed
reference (BENCH_LOCAL.json).

Usage: python tools/bench_merge.py OLD.json NEW.json OUT.json

Formalizes the merge DEVNOTES r9 did by hand: the committed record is
the per-query MIN across full sweeps (a slow-VM day can only tighten
it, never regress it), new queries take their first measured time, and
the summary fields (value/n/max/top10/summary_tail) are recomputed so
the output stays shape-identical to bench.py's own record. The merge
is only honest for a CI floor — round-over-round movement must be read
from the raw per-round records (BENCH_r{N}.json), not from deltas of
mins-of-mins (DEVNOTES r9).
"""

from __future__ import annotations

import json
import sys

from bench_compare import _load  # noqa: E402 (sibling module)


def merge(old: dict, new: dict) -> dict:
    oq, nq = old.get("queries", {}), new.get("queries", {})
    if old.get("sf") != new.get("sf"):
        raise SystemExit(
            f"refusing to merge different scale factors: "
            f"{old.get('sf')} vs {new.get('sf')}"
        )
    merged = {
        name: min(t for t in (oq.get(name), nq.get(name)) if t is not None)
        for name in sorted(oq.keys() | nq.keys())
    }
    total = round(sum(merged.values()), 3)
    top10 = dict(
        sorted(merged.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    summary = {
        "n": len(merged),
        "total_s": total,
        "max": max(merged.values()),
        "top10": top10,
    }
    return {
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "sf": old.get("sf"),
        **summary,
        "queries": merged,
        "summary_tail": summary,
    }


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    old, new = _load(argv[0]), _load(argv[1])
    rec = merge(old, new)
    with open(argv[2], "w") as f:
        json.dump(rec, f, indent=1, sort_keys=False)
        f.write("\n")
    oq = old.get("queries", {})
    improved = sum(
        1 for n, t in rec["queries"].items() if n in oq and t < oq[n]
    )
    added = sum(1 for n in rec["queries"] if n not in oq)
    print(
        f"merged {len(rec['queries'])} queries -> {argv[2]}: "
        f"total {old.get('value')} -> {rec['value']} s "
        f"({improved} improved, {added} new)"
    )
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    raise SystemExit(main(sys.argv[1:]))
