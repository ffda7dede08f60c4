"""Dump .explain("formatted") for registered queries into plans/<tag>/.

Usage: python tools/dump_plans.py --tag r10 --suffix before q1 q2 ...
       python tools/dump_plans.py --tag r10 --suffix after --all-touched f

Writes plans/<tag>/<query>_<suffix>.txt — the judge-checkable plan
evidence for every query touched in an optimization round.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from retail_etl_pipeline_spark.registry import QUERIES
    from retail_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="dump_plans",
        shuffle_partitions=int(os.environ["SPARK_GRAFT_CPUS"]),
    )
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in args.names:
        df = QUERIES[name](spark, args.sf)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
