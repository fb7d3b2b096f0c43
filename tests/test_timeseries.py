"""Round-5 session-4 time-series batch (operators/timeseries.py):
CUSUM changepoint, daily autocorrelation, Theil-Sen robust slope,
seasonal strength. Exact local references; registry twins q288-q291
re-check against DuckDB at sf0.01."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

_BASE = dt.datetime(2025, 1, 5)


def _day_events(spark, counts_by_type):
    """counts_by_type: {type: [c_day0, c_day1, ...]} → events rows, c_d
    events on day d (second offsets keep timestamps distinct)."""
    rows = []
    for et, counts in counts_by_type.items():
        for d, c in enumerate(counts):
            for i in range(c):
                rows.append(
                    (len(rows), _BASE + dt.timedelta(days=d, seconds=i), et, 1.0)
                )
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )


def test_cusum_changepoint_planted_shift(spark):
    from bran_spark.operators.timeseries import cusum_changepoint

    ev = _day_events(spark, {"a": [5] * 5 + [9] * 5})
    out = cusum_changepoint(ev).collect()[0]
    day0 = ev.select(
        F.min(F.expr("unix_timestamp(ts) DIV 86400"))
    ).first()[0]
    # D=10, S=70: terms 10x-70 = -20 (x=5) / +20 (x=9); cusum bottoms
    # at -100 on the last low day (index 4)
    assert out.event_type == "a" and out.n_days == 10
    assert out.cp_day == day0 + 4
    assert out.cusum_at_cp == -10.0
    # q=530, var=(530-490)/10=4, sigma=2: stat = 100/(10*2*sqrt(10))
    assert out.stat == round(100 / (10 * 2 * math.sqrt(10)), 6)


def test_cusum_zero_fills_gap_days(spark):
    """A type with events only on days 0 and 4 must see days 1-3 as
    zeros (n_days = span, not rows-with-events)."""
    from bran_spark.operators.timeseries import cusum_changepoint

    ev = _day_events(spark, {"a": [3, 0, 0, 0, 3]})
    out = cusum_changepoint(ev).collect()[0]
    assert out.n_days == 5
    # S=6, terms 5x-6: [9,-6,-6,-6,9] → cusum [9,3,-3,-9,0] → cp at
    # day0 (|9| ties day3's |-9|? no: |9|=9 twice, earliest wins)
    day0 = ev.select(F.min(F.expr("unix_timestamp(ts) DIV 86400"))).first()[0]
    assert out.cp_day == day0 and out.cusum_at_cp == round(9 / 5, 6)


def test_cusum_flat_series_null_stat(spark):
    from bran_spark.operators.timeseries import cusum_changepoint

    ev = _day_events(spark, {"a": [4, 4, 4]})
    out = cusum_changepoint(ev).collect()[0]
    assert out.stat is None and out.cusum_at_cp == 0.0


def test_acf_alternating_series(spark):
    from bran_spark.operators.timeseries import acf_daily

    ev = _day_events(spark, {"a": [1, 3, 1, 3, 1, 3]})
    out = {r.lag: r for r in acf_daily(ev, max_lag=3).collect()}
    # D=6, S=12, a=[-6,6,-6,6,-6,6]; den=216
    assert out[1].n_pairs == 5 and out[1].r == round(-180 / 216, 6)
    assert out[2].n_pairs == 4 and out[2].r == round(144 / 216, 6)
    assert out[3].n_pairs == 3 and out[3].r == round(-108 / 216, 6)


def test_acf_flat_series_null(spark):
    from bran_spark.operators.timeseries import acf_daily

    ev = _day_events(spark, {"a": [2, 2, 2, 2]})
    out = acf_daily(ev, max_lag=1).collect()
    assert len(out) == 1 and out[0].r is None


def test_theil_sen_hand_median_and_outlier_robustness(spark):
    from bran_spark.operators.timeseries import theil_sen_slope

    rows = [
        (1, _BASE + dt.timedelta(hours=h), "purchase", y)
        for h, y in [(0, 0.0), (1, 1.0), (2, 4.0)]
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    out = theil_sen_slope(ev).collect()[0]
    # slopes 1, 2, 3 units/h → median 2
    assert out.n_points == 3 and out.n_pairs == 3
    assert out.slope_per_h == 2.0
    # an extreme outlier at the end moves OLS wildly but Theil-Sen only
    # to the next pairwise slope
    rows2 = rows + [(1, _BASE + dt.timedelta(hours=3), "purchase", 1000.0)]
    ev2 = spark.createDataFrame(
        rows2, "user_id bigint, ts timestamp, event_type string, value double"
    )
    out2 = theil_sen_slope(ev2).collect()[0]
    # slopes: 1,2,3 plus (1000-0)/3, (1000-1)/2, (1000-4)/1 → sorted
    # [1,2,3,333.33,499.5,996] → median (3+333.333333)/2 in exact
    # micro-units, emitted unrounded (see docstring)
    exp = (3_000_000 + 333_333_333) / 2 / 1e6
    assert out2.n_pairs == 6 and out2.slope_per_h == exp


def test_theil_sen_caps_hub_entities(spark):
    from bran_spark.operators.timeseries import theil_sen_slope

    rows = [
        (7, _BASE + dt.timedelta(hours=h), "purchase", float(h))
        for h in range(10)
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    assert theil_sen_slope(ev, max_points=5).count() == 0
    assert theil_sen_slope(ev, max_points=20).count() == 1


def test_seasonal_strength_pure_weekly_signal(spark):
    from bran_spark.operators.timeseries import seasonal_strength

    pattern = [2, 5, 9, 5, 2, 1, 1]
    ev = _day_events(spark, {"a": pattern * 5})
    out = seasonal_strength(ev, period=7).collect()[0]
    # perfectly periodic → remainder exactly 0 → strength 1; full
    # MA windows trim 3 days each side
    assert out.n_days == 35 - 6
    assert out.var_remainder == 0.0 and out.strength == 1.0
    assert out.var_detrended > 0
    # peak day-of-period carries the max detrended mean (the 9-count
    # day); verify it maps to the planted offset
    day0 = ev.select(F.min(F.expr("unix_timestamp(ts) DIV 86400"))).first()[0]
    assert out.peak_dop == (day0 + 2) % 7


def test_seasonal_strength_constant_series_null(spark):
    from bran_spark.operators.timeseries import seasonal_strength

    ev = _day_events(spark, {"a": [3] * 14})
    out = seasonal_strength(ev, period=7).collect()[0]
    assert out.var_detrended == 0.0 and out.strength is None
