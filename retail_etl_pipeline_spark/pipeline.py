"""Orchestration layer (SURVEY.md §2.8) — the reference's Lambda/Airflow/SES
machinery re-expressed as plain functions around the engine.

- C2/S9/F5: readiness gate — required file set present for the run date
  (``Lambda Function.py:8-23``), table name extracted from
  ``{table}_{YYYYMMDD}.csv`` (``:23``).
- C3/C4: one ``run_pipeline(run_date, inputs)`` entry point replacing the
  parse -> EMR-step -> sensor DAG (``Airflow Dag.py:61-83``); parameters are
  function arguments, not XCom/argv strings (the reference's arg contract
  was internally inconsistent — SURVEY.md §2.8 C4).
- C6/S7/S8: idempotent date-partitioned publish + catalog registration so
  the output is immediately queryable via ``spark.sql``.
- S10: alert callback seam instead of a hard-wired SES email
  (``AWS SES.py``, called at ``Lambda Function.py:47``).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import io as eio
from .operators.retail import WEEK_GRAIN
from .plans.weekly_summary import merged_from, weekly_summary_from_merged
from .schemas import RETAIL_SCHEMAS, RETAIL_TABLES

_FILE_RE = re.compile(r"^(?P<table>[a-z_]+)_(?P<date>\d{8})\.csv$")


def required_files(run_date: str, tables: tuple[str, ...] = RETAIL_TABLES) -> list[str]:
    """``{table}_{YYYYMMDD}.csv`` for each input table
    (``Lambda Function.py:17``). ``run_date`` is ``YYYY-MM-DD``."""
    datestr = run_date.replace("-", "")
    return [f"{t}_{datestr}.csv" for t in tables]


def readiness_check(
    input_dir: str,
    run_date: str,
    tables: tuple[str, ...] = RETAIL_TABLES,
) -> tuple[bool, list[str]]:
    """S9/F5: required ⊆ present (``Lambda Function.py:20``).

    Returns (ready, missing_files)."""
    present = set(os.listdir(input_dir)) if os.path.isdir(input_dir) else set()
    missing = [f for f in required_files(run_date, tables) if f not in present]
    return (not missing, missing)


def table_paths(input_dir: str, run_date: str) -> dict[str, str]:
    """C2: build the table -> path map the trigger passes downstream
    (``Lambda Function.py:23-26``: table name = filename minus the 13-char
    ``_YYYYMMDD.csv`` suffix)."""
    datestr = run_date.replace("-", "")
    out: dict[str, str] = {}
    for fname in sorted(os.listdir(input_dir)):
        m = _FILE_RE.match(fname)
        if m and m.group("date") == datestr:
            out[m.group("table")] = os.path.join(input_dir, fname)
    return out


@dataclass
class PipelineResult:
    ran: bool
    run_date: str
    missing: list[str] = field(default_factory=list)
    output_path: str | None = None
    output_rows: int | None = None
    #: data-quality counters observed DURING the write (no extra scan):
    #: rows_written, null_grain_rows, negative_sales_rows
    metrics: dict | None = None
    #: rule -> violation count for expectations that failed (publish was
    #: rolled back when non-empty)
    expectation_failures: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    run_date: str,
    input_dir: str,
    output_path: str,
    on_missing: Callable[[list[str]], None] | None = None,
    register_as: str | None = "weekly_summary",
    measure_type: str = "double",
    expectations: dict | None = None,
    on_expectation_failure: Callable[[dict], None] | None = None,
) -> PipelineResult:
    """C3: the single entry point — readiness gate, CSV loads with explicit
    schemas, the single-pass weekly summary, idempotent date-partitioned
    publish, catalog registration.

    ``on_missing`` is the S10 alert seam (the reference emails via SES);
    it receives the missing-file list and the pipeline returns without
    running.

    ``expectations`` (name -> boolean Column over the summary, the
    operators/expectations.py contract: NULL counts as a violation)
    ride the SAME ``observe()`` as the built-in DQ counters — zero
    extra scans. Violations trigger a COMPENSATING rollback: the
    just-written run partition is overwritten with the prior content
    model (deleted), ``on_expectation_failure`` gets the rule ->
    violation-count map, and the result reports ran=False — a gate
    evaluated pre-publish would cost a second full pass of the summary
    at 100 TB; observe-then-compensate pays only on failure."""
    ready, missing = readiness_check(input_dir, run_date)
    if not ready:
        if on_missing is not None:
            on_missing(missing)
        return PipelineResult(ran=False, run_date=run_date, missing=missing)

    paths = table_paths(input_dir, run_date)
    frames = {
        t: eio.read_csv(spark, paths[t], RETAIL_SCHEMAS[t](measure_type))
        for t in RETAIL_TABLES
    }
    m = merged_from(frames["sales"], frames["inventory"], frames["calendar"])
    summary = weekly_summary_from_merged(m).orderBy(*WEEK_GRAIN)

    # Observation rides the write job itself — data-quality counters for
    # free, where the reference (and a naive port) would re-scan the
    # output to validate it. At 100 TB a validation re-scan is a second
    # full pass; observe() is zero extra I/O.
    obs = Observation("dq")
    grain_null = None
    for k in WEEK_GRAIN:
        cond = F.col(k).isNull()
        grain_null = cond if grain_null is None else (grain_null | cond)
    exp_aggs = []
    for name, cond in (expectations or {}).items():
        if not name.replace("_", "").isalnum():
            raise ValueError(f"expectation name must be identifier-safe: {name!r}")
        exp_aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"exp_{name}")
        )
    summary = summary.observe(
        obs,
        F.count(F.lit(1)).alias("rows_written"),
        F.count(F.when(grain_null, 1)).alias("null_grain_rows"),
        F.count(F.when(F.col("total_sales_amt") < 0, 1)).alias(
            "negative_sales_rows"
        ),
        *exp_aggs,
    )
    eio.write_run_partition(summary, output_path, run_date)
    metrics = dict(obs.get)
    failures = {
        k[len("exp_"):]: v
        for k, v in metrics.items()
        if k.startswith("exp_") and (v or 0) > 0
    }
    if failures:
        # compensate: the run partition just written is withdrawn (an
        # empty overwrite of exactly that partition — same idempotent
        # dynamic-overwrite path the publish used)
        import shutil

        shutil.rmtree(
            os.path.join(output_path, f"date={run_date}"), ignore_errors=True
        )
        if on_expectation_failure is not None:
            on_expectation_failure(failures)
        return PipelineResult(
            ran=False,
            run_date=run_date,
            output_path=output_path,
            metrics=metrics,
            expectation_failures=failures,
        )

    published = spark.read.parquet(output_path)
    if register_as:
        published.createOrReplaceTempView(register_as)
    n = published.where(published["date"] == run_date).count()
    return PipelineResult(
        ran=True,
        run_date=run_date,
        output_path=output_path,
        output_rows=n,
        metrics=metrics,
    )
