"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bran_spark`` (see SURVEY.md §2 for the
operator inventory; bran_spark/plans/oracle_queries.py for the
registry). Entries without an oracle are the non-SQL-expressible
stages (transformer forward pass, xxhash64-based simhash) — they get
the rows-only check and are fully verified in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full KG-construction DAG (interleave → BPE →
    mention detection → linking → transformer+bi-affine scoring → LSE
    pooling → thresholded canonical triples) over the driver's sf0.001
    plain documents corpus."""
    from bran_spark.plans.pipeline import flagship_plain

    return flagship_plain(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bran_spark.plans.oracle_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible entry in ``queries()``."""
    from bran_spark.plans.oracle_queries import ORACLE

    return dict(ORACLE)
