"""Driver-replica sweep: run every queries() entry against its oracle at
sf0.01 with a PLAIN SparkSession (the driver's setup), timing both sides.

Usage: python tests/driver_replica.py [names...]
Env: REPLICA_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = os.environ.get("REPLICA_SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e
    from tests.oracle_utils import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    from retail_etl_pipeline_spark.schemas import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = e.queries()
    oracles = e.oracle_sql()
    wanted = sys.argv[1:] or list(queries)
    n_bad = 0
    for i, name in enumerate(wanted):
        fn = queries[name]
        sql = oracles.get(name)
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            if sql is None:
                n = df.count()
                dt = time.perf_counter() - t0
                print(f"[{i + 1}/{len(wanted)}] {name}: rows-only {n} ({dt:.1f}s)", flush=True)
                continue
            problems = compare(df, con, sql)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {exc!r}"[:500]]
        dt = time.perf_counter() - t0
        status = "OK" if not problems else f"FAIL {problems}"
        if problems:
            n_bad += 1
        print(f"[{i + 1}/{len(wanted)}] {name}: {status} ({dt:.1f}s)", flush=True)
        # release relations queries persist (ordered.py two-level ops,
        # shared shingle relations): leaked cache entries both squeeze
        # memory over a 130-query sweep and get substituted into later
        # queries' plans by the CacheManager
        spark.catalog.clearCache()
    print(f"DONE bad={n_bad}", flush=True)
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
