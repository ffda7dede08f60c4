"""Custom batch connector via the Python DataSource API (Spark 4).

The reference's only "sources" are CSV files staged by external systems
(SURVEY.md §2.1); a real engine also needs an extension point for sources
Spark doesn't ship. This is that extension point, exercised end-to-end: a
deterministic synthetic event generator exposed as
``spark.read.format("synthetic_events")``.

Scale notes:
- ``partitions()`` splits the keyspace into ``numPartitions`` independent
  row ranges — each executor generates its slice; no driver materialization
  and no skew (equal-width ranges).
- The generator is a pure function of the row index (multiplicative
  hashing), so the output is reproducible across runs, partitionings, and
  engines — which is what makes the DuckDB oracle able to replay it with
  ``generate_series`` (see ``SYNTHETIC_ORACLE_CTE``).
- Rows stream out of the reader in batches (the API Arrow-batches them);
  nothing holds the full partition in memory.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Knuth's multiplicative hash constant — spreads the value sequence.
_MIX = 2654435761
_MOD = 2**32


def _row(i: int) -> tuple[int, int, str, float]:
    """The deterministic generator: row i -> (event_id, user_id, kind, value).

    Pure integer math (no floats until the final exact /100 scaling) so any
    engine that replays it gets bit-identical values.
    """
    h = (i * _MIX) % _MOD
    return (i, i % 50, "even" if i % 2 == 0 else "odd", (h % 10_000) / 100.0)


#: DuckDB replay of :func:`_row` over ``generate_series`` — keep in sync.
SYNTHETIC_ORACLE_CTE = """
synthetic AS (
  SELECT i AS event_id,
         i % 50 AS user_id,
         CASE WHEN i % 2 = 0 THEN 'even' ELSE 'odd' END AS kind,
         CAST(((CAST(i AS HUGEINT) * 2654435761) % 4294967296) % 10000
              AS DOUBLE) / 100.0
           AS value
  FROM generate_series(0, {last}) t(i)
)"""


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("numRows", 1000))
        self.n_parts = int(options.get("numPartitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("numRows", n)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, kind string, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# streaming variant: the same generator as an offset-tracked micro-batch
# source (SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-based replayable stream over the deterministic generator.

    The offset is just the next row index, so `readBetweenOffsets` can
    replay any committed range exactly — which is what gives the source
    end-to-end exactly-once with a checkpointed sink (a failed batch is
    re-read bit-identically)."""

    def __init__(self, options: dict) -> None:
        self.batch_rows = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        s = int(start["i"])
        e = s + self.batch_rows
        return iter([_row(i) for i in range(s, e)]), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["i"]), int(end["i"]))])
