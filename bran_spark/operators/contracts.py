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

from pyspark.sql import DataFrame, Window
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


def key_skew_profile(
    df: DataFrame, key_cols: list[str], top_k: int = 20
) -> DataFrame:
    """Join/partition-key skew audit — the measurement BEHIND every
    salting decision this engine makes (P3, A5's salted dedup, the
    df-cut in ngram_jaccard): before shuffling 100 TB on a key, ask how
    hot its hottest values are. A key whose top value owns 30% of the
    rows will straggle one reducer regardless of partition count; this
    report is the evidence for salting it (or broadcasting the other
    side).

    One count aggregate on the key (the same shuffle the join would
    do — at a fraction of the width), one 1-row total broadcast, one
    TakeOrdered for the top-k. Output: top_k rows (key string-joined
    for schema stability, n, share 6 dp, cum_share 6 dp, rank) ordered
    hottest-first; share·n_keys ≫ 1 ⇒ skew."""
    counts = df.groupBy(
        *[F.col(c) for c in key_cols]
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(
        F.sum("n").cast("double").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = (
        counts.orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
        .limit(top_k)
        .crossJoin(F.broadcast(tot))
    )
    w = Window.orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
    return top.select(
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]).alias(
            "key"
        ),
        "n",
        "n_keys",
        F.round(F.col("n") / F.col("n_rows"), 6).alias("share"),
        F.round(
            F.sum("n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            / F.col("n_rows"),
            6,
        ).alias("cum_share"),
        F.row_number().over(w).cast("int").alias("rank"),
    )
