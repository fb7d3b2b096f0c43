"""Unit tests for KG lifecycle operators (sameAs rewrite, temporal
coalescing, schema induction, snapshot diff) on hand-enumerable graphs;
corpus-scale evidence is the DuckDB twins q294–q297."""
from __future__ import annotations

import datetime as dt

from bran_spark.operators.kglifecycle import (
    coalesce_intervals,
    induce_schema,
    kg_diff,
    sameas_rewrite,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestSameasRewrite:
    def test_merge_with_chain_and_provenance(self, spark):
        triples = spark.createDataFrame(
            [
                ("A:1", "p", "B:1"),
                ("A:2", "p", "B:1"),  # A:2 sameAs A:1 -> collapses with ^
                ("A:3", "p", "B:1"),  # A:3 sameAs A:2 (2-hop chain to A:1)
                ("A:9", "p", "B:2"),  # untouched: no sameAs statement
            ],
            ["subj", "pred", "obj"],
        )
        sameas = spark.createDataFrame(
            [("A:1", "A:2"), ("A:2", "A:3")], ["a", "b"]
        )
        got = _rows(sameas_rewrite(triples, sameas))
        # canonical id = min of {A:1, A:2, A:3} = A:1; three distinct
        # source triples collapse into one canonical row
        assert got == {("A:1", "p", "B:1", 3), ("A:9", "p", "B:2", 1)}

    def test_object_side_rewrite_and_dup_sources(self, spark):
        triples = spark.createDataFrame(
            [
                ("X", "q", "C:2"),
                ("X", "q", "C:2"),  # duplicate row: ONE distinct source
                ("X", "q", "C:1"),
            ],
            ["subj", "pred", "obj"],
        )
        sameas = spark.createDataFrame([("C:1", "C:2")], ["a", "b"])
        assert _rows(sameas_rewrite(triples, sameas)) == {
            ("X", "q", "C:1", 2)
        }


class TestCoalesceIntervals:
    def test_overlap_adjacent_and_gap(self, spark):
        d = dt.date
        df = spark.createDataFrame(
            [
                # [1,5) overlaps [3,8); [8,10) is adjacent (start == max
                # end) so all three merge; [12,13) is an island
                ("s", "p", "o", d(2020, 1, 1), d(2020, 1, 5)),
                ("s", "p", "o", d(2020, 1, 3), d(2020, 1, 8)),
                ("s", "p", "o", d(2020, 1, 8), d(2020, 1, 10)),
                ("s", "p", "o", d(2020, 1, 12), d(2020, 1, 13)),
            ],
            ["subj", "pred", "obj", "valid_from", "valid_to"],
        )
        got = _rows(coalesce_intervals(df))
        assert got == {
            ("s", "p", "o", d(2020, 1, 1), d(2020, 1, 10), 3),
            ("s", "p", "o", d(2020, 1, 12), d(2020, 1, 13), 1),
        }

    def test_contained_interval_merges(self, spark):
        # a long interval swallowing a short one, followed by a row that
        # only overlaps the LONG one: prev-row-end comparison would
        # split; running-max must merge all three
        d = dt.date
        df = spark.createDataFrame(
            [
                ("s", "p", "o", d(2020, 1, 1), d(2020, 1, 20)),
                ("s", "p", "o", d(2020, 1, 2), d(2020, 1, 3)),
                ("s", "p", "o", d(2020, 1, 15), d(2020, 1, 25)),
            ],
            ["subj", "pred", "obj", "valid_from", "valid_to"],
        )
        got = _rows(coalesce_intervals(df))
        assert got == {("s", "p", "o", d(2020, 1, 1), d(2020, 1, 25), 3)}

    def test_exact_duplicate_intervals_total_order(self, spark):
        # two IDENTICAL intervals tie in the window ordering; the
        # pre-aggregation must keep them in ONE island with n_merged=2
        # regardless of engine tie order (regression: the DuckDB twin
        # misassigned the tied row to the previous island once in a
        # while before duplicates were pre-aggregated)
        d = dt.date
        df = spark.createDataFrame(
            [
                ("s", "p", "o", d(2020, 1, 1), d(2020, 2, 1)),
                ("s", "p", "o", d(2020, 6, 1), d(2020, 6, 10)),
                ("s", "p", "o", d(2020, 6, 1), d(2020, 6, 10)),
            ],
            ["subj", "pred", "obj", "valid_from", "valid_to"],
        )
        got = _rows(coalesce_intervals(df))
        assert got == {
            ("s", "p", "o", d(2020, 1, 1), d(2020, 2, 1), 1),
            ("s", "p", "o", d(2020, 6, 1), d(2020, 6, 10), 2),
        }

    def test_groups_independent(self, spark):
        d = dt.date
        df = spark.createDataFrame(
            [
                ("s1", "p", "o", d(2020, 1, 1), d(2020, 1, 2)),
                ("s2", "p", "o", d(2020, 1, 1), d(2020, 1, 2)),
            ],
            ["subj", "pred", "obj", "valid_from", "valid_to"],
        )
        assert coalesce_intervals(df).count() == 2


class TestInduceSchema:
    def test_profile(self, spark):
        triples = spark.createDataFrame(
            [
                ("C:1", "in", "N:1"),
                ("C:2", "in", "N:1"),
                ("S:7", "in", "N:2"),
                ("C:1", "in", "N:2"),  # C:1 has two objects
            ],
            ["subj", "pred", "obj"],
        )
        [r] = induce_schema(triples).collect()
        assert r.pred == "in"
        assert (r.n_triples, r.n_subj, r.n_obj) == (4, 3, 2)
        assert (r.fun, r.inv_fun) == (0.75, 0.5)
        assert (r.subj_type, r.subj_type_share) == ("C", 0.75)
        assert (r.obj_type, r.obj_type_share) == ("N", 1.0)

    def test_dominant_tie_breaks_lexicographically(self, spark):
        triples = spark.createDataFrame(
            [("B:1", "p", "X:1"), ("A:1", "p", "X:2")],
            ["subj", "pred", "obj"],
        )
        [r] = induce_schema(triples).collect()
        assert r.subj_type == "A" and r.subj_type_share == 0.5


class TestKgDiff:
    def test_added_removed_common(self, spark):
        old = spark.createDataFrame(
            [("a", "p", "b"), ("a", "p", "c"), ("x", "q", "y"),
             ("a", "p", "b")],  # dup must not double-count
            ["subj", "pred", "obj"],
        )
        new = spark.createDataFrame(
            [("a", "p", "b"), ("a", "p", "d"), ("z", "r", "w")],
            ["subj", "pred", "obj"],
        )
        got = {r.pred: r for r in kg_diff(old, new).collect()}
        p = got["p"]
        assert (p.n_added, p.n_removed, p.n_common) == (1, 1, 1)
        assert abs(p.churn - 2 / 3) < 1e-6
        assert (got["q"].n_added, got["q"].n_removed, got["q"].n_common) == (0, 1, 0)
        assert got["q"].churn == 1.0
        assert (got["r"].n_added, got["r"].n_common) == (1, 0)
