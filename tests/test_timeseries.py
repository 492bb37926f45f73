"""Gap-fill + linear interpolation: hand-computed expectations on a tiny
series, multi-key independence, and the no-gap fast path."""

from __future__ import annotations

import datetime as dt

from imposm3_spark.datapipe.timeseries import gapfill_hourly


def _ev(user, hour, value, eid=0):
    return (
        eid,
        dt.datetime(2024, 1, 1) + dt.timedelta(hours=hour),
        user,
        "t",
        value,
        "{}",
    )


SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"


def test_linear_interpolation_exact(spark):
    # user 1: hours 0, 3 observed (10.00, 40.00) -> hours 1,2 filled with
    # 20.00 and 30.00; hour 4+ out of range.
    rows = [_ev(1, 0, 10.0, 1), _ev(1, 3, 40.0, 2)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.hour_ts.hour: (r.value, r.filled)
        for r in gapfill_hourly(df).collect()
    }
    assert got == {
        0: (10.0, False),
        1: (20.0, True),
        2: (30.0, True),
        3: (40.0, False),
    }


def test_bucket_sums_and_multi_key(spark):
    # user 1 has two events in hour 0 (summed); user 2 an independent range.
    rows = [
        _ev(1, 0, 1.25, 1),
        _ev(1, 0, 2.25, 2),
        _ev(1, 2, 7.5, 3),
        _ev(2, 5, 5.0, 4),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = gapfill_hourly(df).collect()
    u1 = {r.hour_ts.hour: r.value for r in out if r.user_id == 1}
    u2 = {r.hour_ts.hour: r.value for r in out if r.user_id == 2}
    assert u1 == {0: 3.5, 1: 5.5, 2: 7.5}  # 3.5 -> 7.5 interpolated at h1
    assert u2 == {5: 5.0}  # single-bucket key: no gaps generated


def test_no_gaps_passthrough(spark):
    rows = [_ev(1, h, float(h), h) for h in range(4)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = gapfill_hourly(df).collect()
    assert all(not r.filled for r in out) and len(out) == 4


def test_ewma_recursion_exact(spark):
    from imposm3_spark.datapipe.timeseries import ewma_fixed_point

    # user 1: cents 400, 800, 100 -> e = 400, (1200+800)//4=500, (1500+100)//4=400
    rows = [_ev(1, 0, 4.0, 1), _ev(1, 1, 8.0, 2), _ev(1, 2, 1.0, 3), _ev(2, 0, 2.0, 4)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.id: r.ewma for r in ewma_fixed_point(df).collect()}
    assert got == {1: 4.0, 2: 5.0, 3: 4.0, 4: 2.0}


def test_ewma_order_is_ts_then_id(spark):
    from imposm3_spark.datapipe.timeseries import ewma_fixed_point

    t = dt.datetime(2024, 1, 1)
    # same ts: event_id breaks the tie (2 before 3)
    rows = [(2, t, 1, "t", 8.0, "{}"), (3, t, 1, "t", 0.0, "{}"), (1, t - dt.timedelta(hours=1), 1, "t", 4.0, "{}")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.id: r.ewma for r in ewma_fixed_point(df).collect()}
    # e1=400, e2=(1200+800)//4=500, e3=(1500+0)//4=375
    assert got == {1: 4.0, 2: 5.0, 3: 3.75}


def test_scd2_intervals(spark):
    from imposm3_spark.datapipe.timeseries import scd2_intervals

    t = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: A A B A -> intervals A[0,2) B[2,3) A[3,current)
        (1, t + dt.timedelta(hours=0), 1, "A", 0.0, "{}"),
        (2, t + dt.timedelta(hours=1), 1, "A", 0.0, "{}"),
        (3, t + dt.timedelta(hours=2), 1, "B", 0.0, "{}"),
        (4, t + dt.timedelta(hours=3), 1, "A", 0.0, "{}"),
        # user 2: single value -> one open interval
        (5, t, 2, "X", 0.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sorted(
        scd2_intervals(df).collect(), key=lambda r: (r.user_id, r.valid_from)
    )
    u1 = [(r.value, r.valid_from.hour, r.valid_to.hour if r.valid_to else None, r.is_current) for r in out if r.user_id == 1]
    assert u1 == [("A", 0, 2, False), ("B", 2, 3, False), ("A", 3, None, True)]
    u2 = [(r.value, r.is_current) for r in out if r.user_id == 2]
    assert u2 == [("X", True)]


def test_gapfill_exact_form_consistency(spark):
    """exact=True returns the same grid with value_num/value_den such that
    round(num/den, 6) equals the float path's value on BOTH observed and
    interpolated rows, keeps hour_ts, and keeps `filled` boolean."""
    rows = [
        _ev(1, 0, 10.0, 1),
        _ev(1, 3, 40.17, 2),
        _ev(2, 5, 5.0, 3),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    flo = {
        (r.user_id, r.hour_ts): (r.value, r.filled)
        for r in gapfill_hourly(df).collect()
    }
    exact = {
        (r.user_id, r.hour_ts): (r.value_num, r.value_den, r.filled)
        for r in gapfill_hourly(df, exact=True).collect()
    }
    assert set(flo) == set(exact)
    for key, (num, den, filled) in exact.items():
        value, f_filled = flo[key]
        assert isinstance(filled, bool) and filled == f_filled
        assert value == round(num / den, 6)
        if not filled:
            assert den == 100


def test_ewma_rejects_negative_and_null_values(spark):
    """The step-major scan floors (numpy //) while the EWMA oracle's
    DuckDB // truncates toward zero — they only agree on non-negative
    cents, so a negative value must raise loudly, not silently diverge
    (round-6 ADVICE). NULL cents likewise: NaN.astype(int64) is garbage."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from imposm3_spark.datapipe.timeseries import ewma_fixed_point

    neg = spark.createDataFrame([_ev(1, 0, -4.0, 1)], SCHEMA)
    with pytest.raises(PythonException, match="require_nonneg"):
        ewma_fixed_point(neg).collect()

    nul = spark.createDataFrame([_ev(1, 0, None, 1)], SCHEMA)
    with pytest.raises(PythonException, match="NULL value"):
        ewma_fixed_point(nul).collect()
