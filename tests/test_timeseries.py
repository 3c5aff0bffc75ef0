"""Unit tests for the time-series operators (gapfill/locf, anomaly
days) on hand-built frames with known gaps and outliers."""

import datetime

import pyspark.sql.functions as F

from onionnet_spark.operators import timeseries


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_gapfill_fills_missing_days_and_carries_forward(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(1), 10, "view", 2.0, "{}"),
            (2, _ts(1, 5), 10, "view", 4.0, "{}"),
            # day 2 and 3 missing for "view"
            (3, _ts(4), 11, "view", 1.0, "{}"),
            (4, _ts(2), 12, "click", 8.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = timeseries.gapfill_daily_locf(events)
    rows = {
        (r["day"].day, r["event_type"]): r for r in out.collect()
    }
    # dense calendar: 4 days x 2 types
    assert len(rows) == 8
    gap = rows[(2, "view")]
    assert gap["n_events"] == 0 and gap["is_gap"] == 1
    # locf: day-2/3 "view" carries day-1's sum (6.0)
    assert rows[(2, "view")]["sum_value_locf"] == 6.0
    assert rows[(3, "view")]["sum_value_locf"] == 6.0
    assert rows[(4, "view")]["sum_value_locf"] == 1.0
    # before first observation: NULL (click has nothing on day 1)
    assert rows[(1, "click")]["sum_value_locf"] is None
    assert rows[(2, "click")]["sum_value_locf"] == 8.0


def test_anomaly_days_flags_known_outlier(spark):
    # 9 quiet days of 10 events + one day of 100: z >> 1.5 on the
    # spike, small |z| elsewhere
    rows = []
    eid = 0
    for d in range(1, 10):
        for _ in range(10):
            rows.append((eid, _ts(d), 1, "view", 1.0, "{}"))
            eid += 1
    for _ in range(100):
        rows.append((eid, _ts(10), 1, "view", 1.0, "{}"))
        eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = timeseries.anomaly_days(events, z_threshold=1.5).collect()
    assert len(out) == 1
    assert out[0]["day"].day == 10 and out[0]["n_events"] == 100
    assert out[0]["z"] > 2.0


def test_anomaly_constant_series_yields_nothing(spark):
    events = spark.createDataFrame(
        [(i, _ts(1 + i % 3), 1, "view", 1.0, "{}") for i in range(9)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    # zero variance -> z is NULL/undefined -> no rows survive
    assert timeseries.anomaly_days(events).count() == 0


def test_ema_matches_recursive_definition(spark):
    # closed form must equal the textbook recurrence exactly
    events = spark.createDataFrame(
        [(i, _ts(1 + i), 1, "view", 1.0, "{}") for i in range(6)]
        + [(100 + i, _ts(1 + i), 1, "view", 1.0, "{}") for i in range(0, 12, 2)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = sorted(
        (r["day"].day, r["n_events"], r["ema"])
        for r in timeseries.ema_daily(events, alpha=0.3).collect()
    )
    xs = [n for _, n, _ in out]
    ema = xs[0]
    want = [ema]
    for x in xs[1:]:
        ema = 0.3 * x + 0.7 * ema
        want.append(ema)
    got = [e for _, _, e in out]
    assert got == [round(w, 6) for w in want] or all(
        abs(g - w) < 2e-6 for g, w in zip(got, want)
    )


def test_changepoint_detects_level_shift(spark):
    # 6 days at 5/day then 6 days at 20/day: the boundary days carry
    # the max shift score
    rows, eid = [], 0
    for d in range(1, 7):
        for _ in range(5):
            rows.append((eid, _ts(d), 1, "view", 1.0, "{}")); eid += 1
    for d in range(7, 13):
        for _ in range(20):
            rows.append((eid, _ts(d), 1, "view", 1.0, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = timeseries.changepoint_days(events, window_days=3, threshold=3.0)
    got = {r["day"].day: r["shift"] for r in out.collect()}
    assert got, "level shift not detected"
    # day 6 or 7 (the boundary) must carry the maximum score of 15
    assert max(got.values()) == 15.0
    assert max(got, key=got.get) in (6, 7)
