"""Grid-bucketed spatial joins — the geohash-family pattern that turns
"all pairs within R km" (a cartesian range join, dead at scale) into an
equi-join on coarse grid cells + an exact verify, the same
bucket-then-verify shape as the hour-bucket interval join
(sessions.bucketed_interval_join) and the banded LSH candidates
(similarity.banded_sign_keys). Training corpora carry geo columns more
often than people expect (sensor provenance, datacenter routing, photo
EXIF) and 'near-duplicate by location' is a real curation signal.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
KM_PER_LAT_DEG = 111.32


def haversine_km(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in km — one fixed scalar tree (identical in
    the DuckDB twins), rounded by callers."""
    dphi = F.radians(lat_b - lat_a) / 2.0
    dlmb = F.radians(lon_b - lon_a) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat_a))
        * F.cos(F.radians(lat_b))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def geo_near_pairs(
    points: DataFrame,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius_km: float = 50.0,
    cell_deg: float = 0.5,
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """All point pairs within ``radius_km`` — as a grid-cell EQUI-join.

    One side explodes into its (2·rx+1)×(2·ry+1) neighbor cells (rx/ry
    computed from the radius, the cell size, and the worst-case
    longitude shrink at ``max_abs_lat`` — completeness is GUARANTEED
    only for |lat| ≤ max_abs_lat, stated rather than silently wrong at
    the poles); the other side keys by its own cell; candidates verify
    with the exact haversine. Longitude cells WRAP modulo the
    360/cell_deg ring, so pairs straddling the ±180° antimeridian share
    neighbor keys like any others (360/cell_deg must divide evenly;
    asserted). The explode fan-out is a small constant
    (15 cells at the defaults), so the join stays linear in points ×
    local density — never |P|² — and at scale the table is written
    partitioned by cell so probes prune.

    Output: (id_a, id_b, dist_km) with id_a < id_b, dist rounded 6 dp,
    ordered."""
    ry = math.ceil(radius_km / (KM_PER_LAT_DEG * cell_deg))
    km_per_lon_deg = KM_PER_LAT_DEG * math.cos(math.radians(max_abs_lat))
    rx = math.ceil(radius_km / (km_per_lon_deg * cell_deg))
    n_lon = round(360.0 / cell_deg)
    if abs(n_lon * cell_deg - 360.0) > 1e-9:
        raise ValueError("cell_deg must divide 360 (lon cells form a ring)")
    if 2 * rx + 1 > n_lon:
        # A probe neighborhood wider than the longitude ring would make
        # pmod map distinct dj offsets onto the same (ci, cj) key, so a
        # pair could meet at MORE than one key and the no-dedup argument
        # below breaks (duplicate output rows). Reject loudly instead —
        # pick a finer cell_deg or a smaller radius/max_abs_lat.
        raise ValueError(
            f"probe neighborhood (2*{rx}+1 cells) exceeds the longitude "
            f"ring ({n_lon} cells): increase cell resolution or reduce "
            "radius_km/max_abs_lat"
        )
    base = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
        F.floor(F.col(lat_col) / cell_deg).cast("long").alias("ci"),
        F.pmod(
            F.floor(F.col(lon_col) / cell_deg).cast("long"), F.lit(n_lon)
        ).alias("cj"),
    )
    offsets = [
        (di, dj)
        for di in range(-ry, ry + 1)
        for dj in range(-rx, rx + 1)
    ]
    probes = base.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("ci") + di).alias("ci"),
                        F.pmod(F.col("cj") + dj, F.lit(n_lon)).alias("cj"),
                    )
                    for di, dj in offsets
                ]
            )
        ).alias("c"),
    ).select("id_a", "lat_a", "lon_a", F.col("c.ci").alias("ci"), F.col("c.cj").alias("cj"))
    cand = probes.join(
        base.select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            "ci",
            "cj",
        ),
        ["ci", "cj"],
    ).where(F.col("id_a") < F.col("id_b"))
    d = F.round(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ),
        6,
    )
    # no dedup needed: the probe side fans out over 15 cells but the
    # build side is keyed by its OWN single cell, so each (a, b) pair
    # can meet at exactly one key — a distinct here would be a wasted
    # corpus-scale shuffle
    return (
        cand.select("id_a", "id_b", d.alias("dist_km"))
        .where(F.col("dist_km") <= radius_km)
        .orderBy("id_a", "id_b")
    )
