"""Tolerance contracts for the sketch operators (q71): HLL++ cardinality
within its configured rsd, approx percentiles within rank tolerance of
exact. These are the only operators whose outputs are estimates — their
correctness statement is a bound, not equality, so it lives here instead of
the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, testdata_dir):
    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet")
    got = (
        docs.groupBy("lang")
        .agg(
            F.approx_count_distinct("doc_id", rsd=0.02).alias("approx"),
            F.countDistinct("doc_id").alias("exact"),
        )
        .collect()
    )
    assert got
    for r in got:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.05 * r["exact"]), r


def test_approx_percentile_within_rank_tolerance(spark, testdata_dir):
    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet")
    r = docs.agg(
        F.percentile_approx("n_chars", 0.5, 10000).alias("approx"),
        F.expr("percentile(n_chars, 0.5)").alias("exact"),
    ).head()
    # at accuracy 10000 on a small table the estimate is rank-exact
    assert abs(r["approx"] - r["exact"]) <= 0.01 * max(1.0, r["exact"])
