"""Spot-check a representative subset of the DuckDB oracle pairs inside
pytest (the full 37-pair sweep runs via tools/oracle_check.py and the
driver's own gate)."""

from __future__ import annotations

import duckdb
import pytest

from tools.oracle_check import TABLES, frame_hash

SUBSET = [
    "q01_pricing_summary",
    "q06_topk_per_group",
    "q18_lse_pooling",
    "q22_hypernym_anti_join",
    "q23_triple_dedup_support",
    "q27_dedup_exact",
    "q30_sim_topk_cosine",
    "q32_quality_score",
    "q37_salted_distinct",
]


@pytest.fixture(scope="module")
def duck(testdata_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{testdata_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_pair(spark, testdata_dir, duck, name):
    from bran_spark.plans.oracle_queries import ORACLE, QUERIES

    sdf = QUERIES[name](spark, testdata_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    o = duck.execute(ORACLE[name])
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()
    assert sorted(sdf.columns) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert frame_hash(sdf.columns, s_rows) == frame_hash(o_cols, o_rows)


def test_index_md_is_fresh():
    """INDEX.md (the auto-generated operator index) must match the
    registry — regenerate with: python tools/gen_index.py"""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/gen_index.py", "--check"],
        capture_output=True,
        text=True,
        cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(__import__("os").path.abspath(__file__))
        ),
    )
    assert r.returncode == 0, r.stdout + r.stderr
