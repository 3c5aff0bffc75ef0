"""Streaming analytics over the events stream.

Each operator is written as a pure DataFrame transform so the SAME
function applies to a batch DataFrame (correctness gate vs DuckDB)
and a streaming DataFrame from readStream (exercised in tests with
watermarks). That transform-sharing is the Structured Streaming
model: a streaming query IS a batch query planned incrementally.

Scale notes: windowed aggregations shuffle on (window, key) with
map-side partial aggregation; watermarks bound state; session
windows use native session_window (state-store backed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window_len: str = "1 hour") -> DataFrame:
    """Per (tumbling window, event_type): count + sum(value)."""
    return (
        events.groupBy(
            F.window("ts", window_len).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, window_len: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Per (sliding window, event_type): count."""
    return (
        events.groupBy(F.window("ts", window_len, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def daily_distinct_users(events: DataFrame) -> DataFrame:
    """Per day: exact distinct users + event count + value sum.

    COUNT(DISTINCT) plans as two-phase aggregation: partial dedup of
    (day, user_id) map-side, then a single shuffle on day. Exact is
    the correctness baseline; at 100 TB the drop-in scale path is
    ``F.approx_count_distinct`` (HLL++ sketch — mergeable, fixed
    memory per group, no second dedup pass).
    """
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def daily_distinct_users_approx(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """The 100 TB drop-in for daily_distinct_users: HLL++
    ``approx_count_distinct`` replaces the exact two-phase distinct.

    Why it wins at scale: the exact plan shuffles every distinct
    (day, user_id) pair; the sketch is fixed-size per group (~kilobytes
    at rsd=0.05), merges associatively map-side, and turns the
    aggregation into a single standard shuffle of tiny sketch states.
    Accuracy is within rsd (relative standard deviation) — pytest
    asserts the bound against the exact twin.
    """
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessions per user (batch formulation).

    A new session starts when the time since the previous event of
    the same user exceeds gap_seconds. Output per session:
    (user_id, session_start, session_end, n_events).

    The streaming-native equivalent is
    ``groupBy(session_window("ts", gap), user_id)`` — see
    streaming_sessionize; the batch form below is its exact
    deterministic counterpart used by the correctness oracle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    with_gap = events.select(
        "user_id",
        "ts",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            > gap_seconds * 1_000_000
        )
        .cast("int")
        .alias("is_new"),
    ).fillna({"is_new": 1})
    with_session = with_gap.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    ).select("user_id", "session_start", "session_end", "n_events")


def streaming_sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native streaming sessionization (state-store backed)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def json_props_agg(events: DataFrame) -> DataFrame:
    """Extract props JSON field k, aggregate per event_type.

    JSON extraction runs JVM-side (get_json_object) — no UDF.
    """
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def stream_from_batch(spark, batch_df: DataFrame, partitions: int = 4) -> DataFrame:
    """Replay a batch events frame as a bounded stream (file source)
    for tests: writes to a temp parquet dir and reads with
    maxFilesPerTrigger to force multiple micro-batches."""
    import tempfile

    d = tempfile.mkdtemp(prefix="onionnet_stream_")
    batch_df.repartition(partitions).write.mode("overwrite").parquet(d)
    return spark.readStream.schema(batch_df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count and running value sum, emitted on
    every update.

    This is the escape hatch for stateful semantics the built-in
    windowed aggregations can't express (per-key state machines,
    custom eviction). State is one (count, sum) pair per user_id,
    stored in the state store and merged with each micro-batch's
    Arrow batches; output mode 'update' emits the new running totals
    for keys touched by the batch. At scale, state is partitioned by
    the grouping key across executors and checkpointed
    incrementally.
    """
    import pandas as pd  # noqa: F401 (imported for the worker closure)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitters(
    events: DataFrame, capacity: int = 256, emit_k: int = 5
) -> DataFrame:
    """Streaming heavy hitters per event_type with BOUNDED state:
    the space-saving algorithm (Metwally et al. 2005) keeps at most
    `capacity` (user, count) slots per key; when a new user arrives
    at full capacity it inherits the minimum slot's count + 1 —
    counts are overestimates by at most min-slot, and any user with
    true frequency > n/capacity is guaranteed present. This is the
    custom-eviction shape the built-in windowed aggregations cannot
    express, and the state size is O(capacity) per key forever —
    stream-safe at any volume.

    Emits the current top `emit_k` (event_type, user_id, est_count,
    rank) per key on every micro-batch (update mode); when the
    distinct-user count per key stays under capacity the counts are
    exact, which is what the equivalence test asserts.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("user_id", LongType()),
            StructField("est_count", LongType()),
            StructField("rank", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("users", ArrayType(LongType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            users, counts = state.get
            slots = dict(zip(users, counts))
        else:
            slots = {}
        for pdf in pdfs:
            for uid, c in pdf.groupby("user_id").size().items():
                uid = int(uid)
                if uid in slots:
                    slots[uid] += int(c)
                elif len(slots) < capacity:
                    slots[uid] = int(c)
                else:
                    # space-saving eviction: the newcomer takes over
                    # the minimum slot, inheriting its count
                    m = min(slots, key=lambda u: (slots[u], -u))
                    mc = slots.pop(m)
                    slots[uid] = mc + int(c)
        state.update((list(slots.keys()), list(slots.values())))
        top = sorted(slots.items(), key=lambda kv: (-kv[1], kv[0]))[:emit_k]
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(top),
                "user_id": [u for u, _ in top],
                "est_count": [c for _, c in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def time_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: day → hour →
    event_type with ROLLUP, so one pass produces daily totals,
    hourly totals, and hourly-per-type cells (grouping level
    disambiguated by grouping_id). Catalyst expands ROLLUP into a
    single Expand + one aggregation — no per-level re-scan.
    """
    day = F.date_trunc("day", F.col("ts"))
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        events.select(day.alias("day"), hour.alias("hour"), "event_type", "value")
        .rollup("day", "hour", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


def session_paths(
    events: DataFrame,
    gap_s: int = 1800,
    k: int = 20,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top-k session journey paths: events sessionize on the
    ``gap_s`` inactivity rule (same recurrence as ``sessionize``),
    each session becomes the '>'-joined sequence of its event types
    ordered by (epoch, event_id) — deterministic under same-second
    ties — and the k most frequent journeys are ranked. The
    funnel-mining staple ("what do users actually do?").

    Two key-partitioned windows (lag + running sum) share one
    exchange; the in-order path build is
    array_sort(collect_list(struct)) with no extra window; the
    global top-k is orderBy+limit (TakeOrdered), then a rank window
    bounded by k rows. Returns (rank, path, n_sessions).
    """
    from pyspark.sql import Window

    e = events.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("eid"),
        F.col(ts_col).cast("timestamp").cast("long").alias("epoch"),
        F.col(type_col).alias("etype"),
    )
    w = Window.partitionBy("key").orderBy("epoch", "eid")
    marked = e.withColumn(
        "is_new",
        F.when(
            F.lag("epoch").over(w).isNull()
            | (F.col("epoch") - F.lag("epoch").over(w) > gap_s),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = marked.groupBy("key", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("epoch", "eid", "etype"))
                ),
                lambda s: s.getField("etype"),
            ),
            ">",
        ).alias("path")
    )
    top = (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )
    # bounded window: <= k rows survive the limit above
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.select(
        F.row_number().over(wr).cast("int").alias("rank"), "path", "n_sessions"
    )
