"""Arbitrary stateful processing on the MODERN API:
``transformWithStateInPandas`` (Spark 4).

The engine's original sessionizer/totals use ``applyInPandasWithState``
(see ``rollup.py``) — the Spark 3.4 API where the whole per-key state is
one tuple. ``transformWithState`` replaces it with a composable
processor object owning typed state handles (value/list/map state,
timers, TTL), backed by the RocksDB state store. Both forms are kept:
the old API still runs everywhere, and the side-by-side pair documents
the migration path.

Scale notes: state lives in the RocksDB store per partition — keys never
concentrate on the driver; per-key state here is a single (count, sum)
row, so store size tracks distinct users, not events. TTL (not used
here) is the knob that bounds state for unbounded key spaces.

Runtime dependency: transformWithState's Python state server speaks
protobuf (``google.protobuf``), which pyspark lists only as an optional
extra. Environments without it (like this container) fall back to the
``applyInPandasWithState`` form in ``rollup.py``; the matching test
skips itself when the import is unavailable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

#: the state-store provider transformWithState requires
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class UserTotalsProcessor(StatefulProcessor):
    """Per-user running (count, sum) in a typed ValueState handle —
    the transformWithState twin of ``rollup.stateful_user_totals``."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events bigint, total_value double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        n = 0
        tot = 0.0
        for pdf in rows:
            n += len(pdf)
            tot += float(pdf["value"].sum())
        if self._totals.exists():
            prev = self._totals.get()
            n += int(prev[0])
            tot += float(prev[1])
        self._totals.update((n, tot))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "total_value": [tot],
            }
        )

    def close(self) -> None:
        pass


def stateful_user_totals_v2(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas. The
    session must run with the RocksDB state-store provider
    (:data:`ROCKSDB_PROVIDER`)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )
