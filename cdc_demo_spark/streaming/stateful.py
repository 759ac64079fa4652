"""Custom stateful streaming operator (B45 alternative path):
``applyInPandasWithState`` for per-key state that ``foreachBatch`` +
table rewrite can't express incrementally.

The built-in route (windows, dropDuplicates, the merge) covers the
reference pipeline; this operator exists for the genuinely custom
shapes — running per-entity aggregates, session carts, feature
accumulators — where the state is small per key, lives in the state
store (checkpointed, B47), and updates incrementally every micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, total double"
OUTPUT_SCHEMA = "user_id long, n long, total double"


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame([{"user_id": key[0], "n": n, "total": total}])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in the state
    store across micro-batches. Input: a STREAMING DataFrame with
    user_id/value columns."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas variant (Spark 4's arbitrary-state API)
# --------------------------------------------------------------------------


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """`running_user_totals` on ``transformWithStateInPandas``.

    Needs (a) the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — transformWithState is
    implemented only there — and (b) the ``protobuf`` package: the TWS
    python worker speaks protobuf to the JVM state server and crashes
    at init without it (this container ships no protobuf, so the test
    gate skips; the applyInPandasWithState path above is the tested
    default here)."""
    import pandas as pd  # noqa: F811 (worker-side import)

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame([{"user_id": key[0], "n": n, "total": total}])

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
