"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference is strictly stateless-recompute (every window rebuilds
its tables, ``/root/reference/sql/squeryer.go:261-276``); cross-window
state is inexpressible there. This module adds the Spark-native
stateful path as a strict extension: per-key state maintained across
micro-batches with Arrow-batched pandas UDFs.

Scale notes: state lives in the state store partitioned by key (RocksDB
provider on a real cluster — set
``spark.sql.streaming.stateStore.providerClass``); throughput is one
shuffle on the grouping key per micro-batch, and state size is bounded
by keys × state row, independent of stream length.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime event count + value sum, updated every batch.

    The canonical custom stateful operator: state = (count, sum) per
    key; each micro-batch folds its rows into the state and emits the
    updated row. Unlike a windowed agg, totals never reset.
    """

    def fold(key, pdfs, state: GroupState):
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
