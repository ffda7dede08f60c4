"""Benchmark runner (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end: plan build -> execution -> a noop-format
write as the action. count() is NOT usable here: Catalyst prunes
deterministic projections under count, so projection-only queries
(text_profile, language_id, ...) would time a scan-count instead of their
actual expressions. The noop sink consumes every row and column of the
result with no serialization/IO cost of its own, so the measured time is
the real query work (VERDICT r1 finding #3).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from retail_etl_pipeline_spark.registry import QUERIES
    from retail_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench", shuffle_partitions=int(cpus))

    # warm up the JVM/codegen path once (not counted)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # min-of-3: this VM shows multi-second scheduler stalls on single
    # runs (a sub-second TakeOrdered query occasionally reads 7s+); three
    # runs per query bounds the noise while keeping the full sweep within
    # the driver's budget
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # SPARK_GRAFT_BENCH_ONLY=q1,q2 re-measures a suspect subset in
    # isolation (the stall-noise triage loop) without an ad-hoc script;
    # the driver never sets it, so the recorded runs stay full-registry.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    selected = sorted(QUERIES.items())
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        if not names:
            raise SystemExit(
                "SPARK_GRAFT_BENCH_ONLY is set but names no queries"
            )
        unknown = names - QUERIES.keys()
        if unknown:
            raise SystemExit(f"unknown bench queries: {sorted(unknown)}")
        selected = [(n, f) for n, f in selected if n in names]
    timings: dict[str, float] = {}
    for name, fn in selected:
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # queries are timed independently: drop any relations the
            # previous run persisted so storage memory doesn't squeeze
            # execution memory
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    # summary fields FIRST: the driver records only a bounded tail of
    # stdout, so totals/top-10 must survive even if the full per-query
    # map is truncated; the complete record is also committed to
    # BENCH_LOCAL.json in the repo
    record = {
        "metric": "total_query_time",
        # subset triage lines must never be mistaken for a full-registry
        # record in scrollback or by bench_compare.py
        **({"subset": True} if only else {}),
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n": len(timings),
        "total_s": total,
        "max": max(timings.values()) if timings else 0.0,
        "top10": top10,
        "queries": timings,
        # duplicated at the END of the line too: the driver's record is a
        # bounded TAIL of stdout, so a trailing summary survives even when
        # the full per-query map overflows the window
        "summary_tail": {
            "n": len(timings),
            "total_s": total,
            "max": max(timings.values()) if timings else 0.0,
            "top10": top10,
        },
    }
    print(json.dumps(record))
    if only:
        # subset runs are triage only — never overwrite the committed
        # full-registry record
        spark.stop()
        return
    # the committed record (BENCH_LOCAL.json) is the sf0.1 min-of-3
    # reference the in-suite regression gate compares against; update it
    # ONLY when explicitly recording (SPARK_GRAFT_BENCH_RECORD=1) — the
    # driver's per-round run and ad-hoc sf0.01/single-run sweeps used to
    # clobber it every time (the recurring r5/r6 dirty-tree nit). All
    # other full runs write BENCH_LAST.json (gitignored scratch).
    recording = os.environ.get("SPARK_GRAFT_BENCH_RECORD") == "1"
    out_name = "BENCH_LOCAL.json" if recording else "BENCH_LAST.json"
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         out_name),
            "w",
        ) as f:
            json.dump(record, f, indent=1, sort_keys=False)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout line is still the record
    spark.stop()


if __name__ == "__main__":
    main()
