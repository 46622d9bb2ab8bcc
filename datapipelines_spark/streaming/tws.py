"""Stateful streaming on the transformWithStateInPandas API (Spark 4.x).

The successor to ``applyInPandasWithState`` (streaming/stateful.py keeps
that variant): a ``StatefulProcessor`` with TYPED, composable state
primitives — here a per-user MapState keyed by event type — instead of one
opaque tuple. Richer state (map/list/value), timers, and TTL are the reason
this API exists; per-event-type counters with per-key isolation are exactly
the shape a 100 TB clickstream profile job needs.

State is partitioned by the grouping key across the cluster and Arrow moves
rows to Python in batches, same as the older API.

Environment note: the transformWithState Python driver worker speaks a
protobuf protocol — it needs a working ``google.protobuf`` at runtime.
tests/test_streaming.py skips the bounded-replay equivalence test when the
package is absent (as in this build container); on any standard Spark 4
cluster image it runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_event_types", T.LongType()),
        T.StructField("top_event_type", T.StringType()),
    ]
)


class UserEventTypeProfile(StatefulProcessor):
    """Running per-user event-type histogram.

    Emits one row per user per microbatch: total events, distinct event
    types, and the modal type (ties broken lexicographically — deterministic
    across retries and partitionings).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("counts", "event_type string", "cnt bigint")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        for pdf in rows:
            for etype, n in pdf.groupby("event_type").size().items():
                prev = (
                    self._counts.getValue((etype,))[0]
                    if self._counts.containsKey((etype,))
                    else 0
                )
                self._counts.updateValue((etype,), (prev + int(n),))
        hist = {k[0]: v[0] for k, v in self._counts.iterator()}
        top = min((t for t, c in hist.items() if c == max(hist.values())))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": sum(hist.values()),
                    "n_event_types": len(hist),
                    "top_event_type": top,
                }
            ]
        )

    def close(self) -> None:
        pass


def user_event_type_profile(events: DataFrame) -> DataFrame:
    """Running (n_events, n_event_types, modal type) per user."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserEventTypeProfile(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
