"""Custom stateful streaming on the transformWithStateInPandas API
(Spark 4.x's successor to applyInPandasWithState): typed per-key
state handles, Arrow-batched input, explicit timers.

Operator: per-user running profile — event count, max value, and
exact distinct event-type count. All three accumulators are
COMMUTATIVE, so the final emission per user equals the batch
aggregate regardless of micro-batch arrival order (that equivalence
is the pytest contract; order-sensitive state would need event-time
timers + watermark reordering instead).

State per key is one fixed-width row + a small set of seen types —
bounded, store-backed, partitioned by the grouping key across
executors exactly like the applyInPandasWithState twin in
events.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, max_value double, n_types bigint"
)


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Apply the stateful processor to a (possibly streaming) frame
    grouped by user_id."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class UserProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("mx", DoubleType()),
                    ]
                ),
            )
            self._types = handle.getListState(
                "types", StructType([StructField("t", StringType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n, mx = 0, None
            batch_types = set()
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    m = float(pdf["value"].max())
                    mx = m if mx is None else max(mx, m)
                    batch_types.update(pdf["event_type"].tolist())
            if self._agg.exists():
                pn, pmx = self._agg.get()
                n += pn
                mx = pmx if mx is None else max(mx, pmx)
            seen = {t for (t,) in self._types.get()}
            new_types = batch_types - seen
            if new_types:
                self._types.appendList([(t,) for t in sorted(new_types)])
            self._agg.update((n, float(mx)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "max_value": [float(mx)],
                    "n_types": [len(seen | new_types)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfile(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
