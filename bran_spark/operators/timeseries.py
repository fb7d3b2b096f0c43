"""Time-series diagnostics over event streams — changepoint detection,
autocorrelation, robust trend, and seasonality strength.

All four operators share one construction: the DENSE daily-count series
(one row per day in the observed span, zero-filled — a ragged series
computed only over days-with-events silently biases every statistic
below). The day spine is a dimension (span in days, not corpus-sized),
so everything after the first corpus aggregate runs on bounded data.

Exactness idioms (see ab_effect / fs_weights): means are multiplied out
(term = D·x_t − ΣX is an exact BIGINT; the 1/D factors cancel in every
ratio), products accumulate as DECIMAL(38,0) (associative,
overflow-proof where BIGINT² would wrap), and any term that must round
does so at 10⁻⁶ micro-units BEFORE the dimension sum, so both engines
reduce bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DAY_S = 86400


def _daily_counts(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str | None = None,
) -> DataFrame:
    """Dense per-day event counts: one row per (group, day) for EVERY
    day between the corpus min and max day, zero-filled. One corpus
    aggregate; the spine explode runs on the group dimension."""
    g = (
        F.col(type_col)
        if type_col is not None
        else F.lit("_all").alias("_g")
    )
    per_day = (
        events.select(
            g.alias("_g"),
            F.expr(f"unix_timestamp({ts_col}) DIV {_DAY_S}").alias("day"),
        )
        .groupBy("_g", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    span = per_day.groupBy().agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = (
        per_day.select("_g")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "_g",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    return spine.join(per_day, ["_g", "day"], "left").select(
        "_g", "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Mean-shift changepoint detection per event type via the CUSUM
    statistic: C_j = Σ_{t ≤ j}(x_t − x̄) over the dense daily series;
    the changepoint estimate is the day maximizing |C_j| and the
    normalized statistic max|C_j| / (σ̂√D) is the scan value a
    permutation threshold would gate on (σ̂ = population std).

    Multiplied-out exactness: term_t = D·x_t − ΣX is an exact BIGINT,
    its running sum is exact, and the argmax day is decided on integers
    (row_number by |cusum| desc, day asc — earliest day wins ties on
    both engines). Only the final normalization is float, one fixed
    scalar tree per type. Bound: D·x_max·D_span < 2⁶³ (≈10⁵ days of
    10⁹ events/day before DECIMAL promotion is needed).

    Scale shape: corpus → (type, day) aggregate; windows partition by
    type over the bounded day dimension. Output: one row per type
    (event_type, n_days, cp_day, cusum_at_cp, stat), 6 dp; a flat
    series (σ = 0) yields NULL stat."""
    dc = _daily_counts(events, ts_col, type_col)
    per_g = dc.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("dn"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    w_run = (
        Window.partitionBy("_g")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = dc.join(per_g, "_g").select(
        "_g",
        "day",
        "dn",
        "s",
        "q",
        (F.col("dn") * F.col("x") - F.col("s")).alias("term"),
    )
    run = terms.withColumn("cusum_m", F.sum("term").over(w_run))
    w_pick = Window.partitionBy("_g").orderBy(
        F.abs(F.col("cusum_m")).desc(), F.col("day").asc()
    )
    picked = run.withColumn("rn", F.row_number().over(w_pick)).where(
        F.col("rn") == 1
    )
    dn = F.col("dn").cast("double")
    # population variance of x from exact moments; cusum_m carries a
    # factor D relative to C_j, so stat = |cusum_m| / (D · σ · √D)
    var = F.greatest(
        (F.col("q") - F.col("s").cast("double") * F.col("s") / dn) / dn,
        F.lit(0.0),
    )
    return picked.select(
        F.col("_g").alias("event_type"),
        F.col("dn").alias("n_days"),
        F.col("day").alias("cp_day"),
        F.round(F.col("cusum_m") / dn, 6).alias("cusum_at_cp"),
        F.round(
            F.when(
                var > 0,
                F.abs(F.col("cusum_m")) / (dn * F.sqrt(var) * F.sqrt(dn)),
            ),
            6,
        ).alias("stat"),
    )


def acf_daily(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_lag: int = 7,
) -> DataFrame:
    """Lag-k autocorrelation of the dense daily count series per event
    type, k = 1..max_lag: r_k = Σ a_t·a_{t+k} / Σ a_t² with
    a_t = D·x_t − ΣX (the multiplied-out centered value — the D²
    factors cancel, so r_k is a ratio of EXACT integer sums; products
    accumulate as DECIMAL(38,0) where a² would overflow BIGINT).
    The standard weekly-rhythm / burst-memory diagnostic next to
    q197's burst detection and q233's burstiness.

    Scale shape: corpus → (type, day) aggregate; the lag join is a
    self-equi-join of the bounded day dimension on (type, day + k)
    fanned out by the max_lag-row lag spine. Output: (event_type, lag,
    n_pairs, r), 6 dp; flat series (Σa² = 0) yield NULL r."""
    dc = _daily_counts(events, ts_col, type_col)
    per_g = dc.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("dn"),
        F.sum("x").cast("long").alias("s"),
    )
    a = dc.join(per_g, "_g").select(
        "_g",
        "day",
        (F.col("dn") * F.col("x") - F.col("s")).alias("a"),
    )
    den = a.groupBy("_g").agg(
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("a")).alias("den")
    )
    lags = a.select(
        "_g",
        "day",
        "a",
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias("lag"),
    )
    b = a.select(
        F.col("_g"), F.col("day").alias("day_b"), F.col("a").alias("a_b")
    )
    pairs = lags.join(
        b,
        (lags["_g"] == b["_g"]) & (F.col("day") + F.col("lag") == F.col("day_b")),
    ).select(lags["_g"].alias("_g"), "lag", "a", "a_b")
    num = pairs.groupBy("_g", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("a").cast("decimal(38,0)") * F.col("a_b")).alias("num"),
    )
    return (
        num.join(den, "_g")
        .select(
            F.col("_g").alias("event_type"),
            "lag",
            "n_pairs",
            F.round(
                F.when(
                    F.col("den") > 0,
                    F.col("num").cast("double") / F.col("den").cast("double"),
                ),
                6,
            ).alias("r"),
        )
    )


def theil_sen_slope(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    y_col: str = "value",
    y_scale: int = 100,
    min_points: int = 2,
    max_points: int = 200,
) -> DataFrame:
    """Theil-Sen robust trend per entity: the MEDIAN of all pairwise
    slopes (y_j − y_i)/(h_j − h_i) over the entity's event sequence —
    the 29%-breakdown estimator that q84's least-squares slope is not
    (one spend outlier drags OLS arbitrarily; it moves one pairwise
    slope here). y integerizes to ``y_scale`` units; x is exact epoch
    seconds rendered in hours, so every slope is one fixed float
    expression over exact integers — then rounds to 10⁻⁶ micro-units
    BEFORE the median, so the even-count interpolation is the exact
    midpoint of two integers on both engines (a float median's
    lower + (upper−lower)·frac is engine-kernel territory; an
    integer one is not). The output stays UNROUNDED: the midpoint's
    7th decimal is often an exact '…5', where Spark's decimal-repr
    HALF_UP and DuckDB's binary round disagree — while the raw
    division of identical integers is bit-identical by construction.

    Scale shape: the pair join is a within-group self-join — quadratic
    in the ENTITY's event count, not the corpus — and ``max_points``
    drops degenerate hub entities upstream (documented cap; the
    filtered count is reported so the drop is never silent). Output:
    (entity, n_points, n_pairs, slope_per_h), 6 dp."""
    base = events.select(
        F.col(id_col).alias("ent"),
        F.unix_timestamp(ts_col).alias("ep"),
        F.round(F.col(y_col) * y_scale, 0).cast("long").alias("yu"),
    )
    counted = base.groupBy("ent").agg(F.count(F.lit(1)).alias("n_points"))
    kept = base.join(
        counted.where(
            (F.col("n_points") >= min_points)
            & (F.col("n_points") <= max_points)
        ),
        "ent",
    )
    right = kept.select(
        F.col("ent"), F.col("ep").alias("ep2"), F.col("yu").alias("yu2")
    )
    pairs = kept.join(right, "ent").where(F.col("ep") < F.col("ep2"))
    slope = (
        (F.col("yu2") - F.col("yu")).cast("double")
        / float(y_scale)
        / ((F.col("ep2") - F.col("ep")).cast("double") / 3600.0)
    )
    return (
        pairs.select(
            "ent",
            F.col("n_points"),
            F.round(slope * 1e6, 0).cast("long").alias("sl_u"),
        )
        .groupBy("ent", "n_points")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (F.expr("percentile(sl_u, 0.5)") / 1e6).alias("slope_per_h"),
        )
        .select(
            F.col("ent").alias(id_col), "n_points", "n_pairs", "slope_per_h"
        )
    )


def seasonal_strength(
    events: DataFrame,
    ts_col: str = "ts",
    period: int = 7,
) -> DataFrame:
    """Seasonality-strength readout (Hyndman's STL-based F_s, in the
    moving-average variant) for the GLOBAL dense daily series:
    detrend by the centered ``period``-day moving average (full
    windows only), average the detrended values per day-of-period
    (seasonal component), and report
    F_s = max(0, 1 − Var(remainder)/Var(detrended)) plus the peak
    day-of-period — how much of the series' non-trend variation is
    weekly rhythm.

    Exactness: detrended multiplies out to p·x_t − Σ_window x (exact
    BIGINT), rounds ONCE to 10⁻⁶ micro-units, per-day-of-period means
    re-round to micro-units, so remainders are exact integer
    differences and both variances come from DECIMAL(38,0) moment
    sums — associative everywhere. One corpus aggregate, then windows
    on the bounded day dimension. Output: 1 row (n_days, var_detrended,
    var_remainder, strength, peak_dop), 6 dp."""
    dc = _daily_counts(events, ts_col, None)
    half = int(period) // 2
    w_ma = (
        Window.orderBy("day").rowsBetween(-half, half)
    )
    p = int(2 * half + 1)
    ma = dc.select(
        "day",
        "x",
        F.count(F.lit(1)).over(w_ma).alias("wn"),
        F.sum("x").over(w_ma).cast("long").alias("ws"),
    ).where(F.col("wn") == p)
    det = ma.select(
        "day",
        (F.col("day") % p).alias("dop"),
        F.round(
            (F.lit(p) * F.col("x") - F.col("ws")).cast("double")
            / p
            * 1e6,
            0,
        )
        .cast("long")
        .alias("d_u"),
    )
    per_dop = det.groupBy("dop").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("d_u").cast("long").alias("sd"),
    )
    seas = per_dop.select(
        "dop",
        F.round(F.col("sd").cast("double") / F.col("c"), 0)
        .cast("long")
        .alias("m_u"),
    )
    r = det.join(F.broadcast(seas), "dop").select(
        "day", "d_u", (F.col("d_u") - F.col("m_u")).alias("r_u")
    )
    g = r.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("dn"),
        F.sum(F.col("d_u").cast("decimal(38,0)")).alias("sd_u"),
        F.sum(
            F.col("d_u").cast("decimal(38,0)") * F.col("d_u")
        ).alias("qd_u"),
        F.sum(F.col("r_u").cast("decimal(38,0)")).alias("sr_u"),
        F.sum(
            F.col("r_u").cast("decimal(38,0)") * F.col("r_u")
        ).alias("qr_u"),
    )
    dn = F.col("dn").cast("double")

    def _var(qc, sc):
        return F.greatest(
            (
                F.col(qc).cast("double")
                - F.col(sc).cast("double") * F.col(sc).cast("double") / dn
            )
            / dn
            / 1e12,
            F.lit(0.0),
        )

    vd = _var("qd_u", "sd_u")
    vr = _var("qr_u", "sr_u")
    peak = seas.orderBy(F.col("m_u").desc(), F.col("dop").asc()).limit(1)
    return g.crossJoin(F.broadcast(peak.select(F.col("dop").alias("peak_dop")))).select(
        F.col("dn").alias("n_days"),
        F.round(vd, 6).alias("var_detrended"),
        F.round(vr, 6).alias("var_remainder"),
        F.round(
            F.when(vd > 0, F.greatest(F.lit(1.0) - vr / vd, F.lit(0.0))),
            6,
        ).alias("strength"),
        "peak_dop",
    )
