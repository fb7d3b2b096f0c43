"""Data-contract validation — the dbt-test / Deequ-style quality gate a
pipeline runs before promoting a snapshot: uniqueness, not-null, range and
referential-integrity rules, each reduced to a (rule, n_checked,
n_violations) row. The reference has no equivalent (its corpus is a fixed
benchmark); any 10^12-row ingest needs this in front of every commit.

Scale shape: every rule is a single aggregate with map-side partial combine
(not-null/range are one scan; uniqueness is one groupBy-free
count vs count-distinct pass; FK is a broadcast-or-SMJ left-anti count).
The report is a union of 1-row frames — negligible. Violating ROWS (not
counts) are a `.where()` away with the same predicates; the report form is
what gets persisted next to the snapshot manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _report_row(name: str, checked, violations) -> DataFrame:
    return checked.crossJoin(violations).select(
        F.lit(name).alias("rule"),
        F.col("n_checked").cast("long"),
        F.col("n_violations").cast("long"),
    )


def rule_not_null(df: DataFrame, col: str) -> DataFrame:
    c = df.agg(F.count(F.lit(1)).alias("n_checked"))
    v = df.agg(
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_violations")
    )
    return _report_row(f"not_null:{col}", c, v)


def rule_unique(df: DataFrame, col: str) -> DataFrame:
    a = df.agg(
        F.count(col).alias("n_checked"),
        (F.count(col) - F.countDistinct(col)).alias("n_violations"),
    )
    return a.select(
        F.lit(f"unique:{col}").alias("rule"),
        F.col("n_checked").cast("long"),
        F.col("n_violations").cast("long"),
    )


def rule_in_range(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    c = df.agg(F.count(F.lit(1)).alias("n_checked"))
    v = df.agg(
        F.sum(
            F.when(
                F.col(col).isNull()
                | (F.col(col) < lo)
                | (F.col(col) > hi),
                1,
            ).otherwise(0)
        ).alias("n_violations")
    )
    return _report_row(f"range:{col}", c, v)


def rule_foreign_key(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    c = child.agg(F.count(F.lit(1)).alias("n_checked"))
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    v = orphans.agg(F.count(F.lit(1)).alias("n_violations"))
    return _report_row(f"fk:{child_key}", c, v)


def contract_report(rules: list[DataFrame]) -> DataFrame:
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out
