"""Unit semantics for the KG-quality family (operators/kgquality.py,
quality.psi_drift, linking.blocking_pairs) on hand-built frames — the
registry entries (q146-q151) replay each at corpus scale vs DuckDB."""

import math

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------- validate_kg


def _constraints(spark, rows):
    return spark.createDataFrame(
        rows, "pred string, domain string, range string, functional boolean"
    )


def test_validate_kg_domain_range_functional(spark):
    from bran_spark.operators.kgquality import validate_kg

    t = spark.createDataFrame(
        [
            ("C:1", "in_nation", "N:1"),
            ("C:2", "in_nation", "N:1"),
            ("S:9", "in_nation", "N:2"),   # domain violation (S not C)
            ("O:1", "placed_by", "C:1"),
            ("O:1", "placed_by", "C:2"),   # functional violation for O:1
            ("O:2", "placed_by", "X9"),    # malformed obj -> range violation
            ("O:3", "ships_to", "C:1"),    # ungoverned pred: not checked
        ],
        "subj string, pred string, obj string",
    )
    c = _constraints(
        spark,
        [
            ("in_nation", "C", "N", True),
            ("placed_by", "O", "C", True),
        ],
    )
    got = {(r.pred, r.kind): (r.n_checked, r.n_violations)
           for r in validate_kg(t, c).collect()}
    assert got[("in_nation", "domain")] == (3, 1)
    assert got[("in_nation", "range")] == (3, 0)
    assert got[("in_nation", "functional")] == (3, 0)
    assert got[("placed_by", "domain")] == (3, 0)
    # 'X9' has no ':' prefix -> split()[0] = 'X9' != 'C' -> violation
    assert got[("placed_by", "range")] == (3, 1)
    # subjects O:1 (2 objs -> viol), O:2 (1 obj)
    assert got[("placed_by", "functional")] == (2, 1)
    assert ("ships_to", "domain") not in got


def test_validate_kg_null_counts_as_violation(spark):
    from bran_spark.operators.kgquality import validate_kg

    t = spark.createDataFrame(
        [("O:1", "placed_by", None)], "subj string, pred string, obj string"
    )
    c = _constraints(spark, [("placed_by", "O", "C", False)])
    got = {(r.pred, r.kind): r.n_violations for r in validate_kg(t, c).collect()}
    assert got[("placed_by", "range")] == 1
    assert got[("placed_by", "domain")] == 0


# ------------------------------------------------------------- property_table


def test_property_table_pivots_and_prunes(spark):
    from bran_spark.operators.kgquality import property_table

    t = spark.createDataFrame(
        [
            ("O:1", "placed_by", "C:1"),
            ("O:1", "from_nation", "N:3"),
            ("O:2", "placed_by", "C:2"),
            ("O:1", "contains", "P:9"),   # not in preds -> ignored
            ("P:9", "supplied_by", "S:1"),  # subject with no listed pred
        ],
        "subj string, pred string, obj string",
    )
    out = property_table(t, ["placed_by", "from_nation"])
    assert set(out.columns) == {"subj", "placed_by", "from_nation"}
    assert _rows(out) == {("O:1", "C:1", "N:3"), ("O:2", "C:2", None)}


def test_property_table_multivalue_collapses_to_max(spark):
    from bran_spark.operators.kgquality import property_table

    t = spark.createDataFrame(
        [("O:1", "contains", "P:2"), ("O:1", "contains", "P:11")],
        "subj string, pred string, obj string",
    )
    assert _rows(property_table(t, ["contains"])) == {("O:1", "P:2")}  # max str


# --------------------------------------------------------------- star_pattern


def test_star_pattern_arms_and_bindings(spark):
    from bran_spark.operators.kgquality import star_pattern

    t = spark.createDataFrame(
        [
            ("O:1", "contains", "P:1"),
            ("O:1", "contains", "P:2"),
            ("O:1", "from_nation", "N:5"),
            ("O:1", "uses_supplier", "S:1"),
            ("O:1", "uses_supplier", "S:2"),  # fan-out must not dup bindings
            ("O:2", "contains", "P:3"),
            ("O:2", "from_nation", "N:6"),    # fails equality arm
            ("O:2", "uses_supplier", "S:1"),
            ("O:3", "contains", "P:4"),
            ("O:3", "from_nation", "N:5"),    # no uses_supplier -> fails arm
        ],
        "subj string, pred string, obj string",
    )
    out = star_pattern(
        t,
        {"from_nation": "N:5", "uses_supplier": None},
        select_pred="contains",
        binding_name="part",
    )
    assert set(out.columns) == {"subj", "part"}
    assert _rows(out) == {("O:1", "P:1"), ("O:1", "P:2")}


# ------------------------------------------------------------- align_entities


def test_align_entities_hot_keys_cut_and_jaccard(spark):
    from bran_spark.operators.kgquality import align_entities

    # label is near-unique (fanout 1); brand is hot on side a (fanout 3 > 2)
    a = spark.createDataFrame(
        [
            ("P:1", "label", "red widget sz3"),
            ("P:1", "brand", "B1"),
            ("P:2", "label", "blue bolt sz9"),
            ("P:2", "brand", "B1"),
            ("P:3", "brand", "B1"),
        ],
        "subj string, pred string, obj string",
    )
    b = spark.createDataFrame(
        [
            ("X:7", "label", "red widget sz3"),
            ("X:7", "brand", "B1"),
            ("X:8", "label", "green gear sz2"),
        ],
        "subj string, pred string, obj string",
    )
    out = {r.subj_a: r for r in align_entities(a, b, max_key_fanout=2).collect()}
    # P:1 matches X:7 only via label (brand key cut on side a: fanout 3);
    # jaccard over FULL sets: shared=1, |a|=2, |b|=2 -> 1/3
    assert set(out) == {"P:1"}
    r = out["P:1"]
    assert (r.subj_b, r.shared) == ("X:7", 1)
    assert r.jaccard == pytest.approx(round(1 / 3, 6))


def test_align_entities_best_match_deterministic_tie(spark):
    from bran_spark.operators.kgquality import align_entities

    a = spark.createDataFrame(
        [("E:1", "k", "v")], "subj string, pred string, obj string"
    )
    b = spark.createDataFrame(
        [("Z:2", "k", "v"), ("Z:1", "k", "v")],
        "subj string, pred string, obj string",
    )
    out = align_entities(a, b, max_key_fanout=4).collect()
    assert len(out) == 1 and out[0].subj_b == "Z:1"  # tie -> subj_b asc


# ------------------------------------------------------------- blocking_pairs


def test_blocking_pairs_purge_and_wnp(spark):
    from bran_spark.operators.linking import blocking_pairs

    # 'common' appears in all 4 docs -> purged at max_block=3;
    # 'rare'/'gem' shared by d1,d2 (cbs 2); 'odd' shared by d3,d4 (cbs 1)
    recs = spark.createDataFrame(
        [
            (1, "common rare gem"),
            (2, "common rare gem"),
            (3, "common odd"),
            (4, "common odd extra"),
        ],
        "doc_id long, text string",
    )
    out = _rows(blocking_pairs(recs, max_block=3))
    # every pair here reaches its endpoints' mean (each node has 1 pair)
    assert out == {(1, 2, 2), (3, 4, 1)}


def test_blocking_pairs_wnp_prunes_below_both_means(spark):
    from bran_spark.operators.linking import blocking_pairs

    # d1-d2 share 2 tokens; d1-d3 and d2-d3 share 1 token each.
    # means: d1 = d2 = 1.5, d3 = 1.0. WNP keeps d1-d2 (2 >= 1.5) and
    # keeps d1-d3/d2-d3 via d3's own mean (1 >= 1.0) — the OR semantics.
    recs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb dd"), (3, "cc dd")],
        "doc_id long, text string",
    )
    out = _rows(blocking_pairs(recs, max_block=3))
    assert out == {(1, 2, 2), (1, 3, 1), (2, 3, 1)}


# ------------------------------------------------------------------ psi_drift


def test_psi_drift_two_bins_hand_computed(spark):
    from bran_spark.operators.quality import psi_drift

    ref = spark.createDataFrame([(1.0,), (1.0,), (9.0,)], "v double")
    cur = spark.createDataFrame([(1.0,), (9.0,), (9.0,)], "v double")
    out = {r.bin: r for r in psi_drift(
        ref, cur, "v", lo=0.0, hi=10.0, n_bins=2, alpha=0.5
    ).collect()}
    assert set(out) == {0, 1}
    p0 = (2 + 0.5) / (3 + 1.0)
    q0 = (1 + 0.5) / (3 + 1.0)
    assert out[0].p_ref == pytest.approx(round(p0, 6))
    assert out[0].p_cur == pytest.approx(round(q0, 6))
    expect = (p0 - q0) * math.log(p0 / q0)
    assert out[0].psi_term == pytest.approx(round(expect + 1e-9, 6), abs=2e-6)
    assert out[0].bin_lo == 0.0 and out[1].bin_lo == 5.0
    assert (out[0].n_ref, out[0].n_cur) == (2, 1)


def test_psi_drift_clamps_outliers_drops_nulls_keeps_empty_bins(spark):
    from bran_spark.operators.quality import psi_drift

    ref = spark.createDataFrame([(-5.0,), (99.0,), (None,)], "v double")
    cur = spark.createDataFrame([(0.5,)], "v double")
    out = {r.bin: r for r in psi_drift(
        ref, cur, "v", lo=0.0, hi=3.0, n_bins=3
    ).collect()}
    assert set(out) == {0, 1, 2}            # spine keeps empty bins
    assert (out[0].n_ref, out[2].n_ref) == (1, 1)  # clamped into edges
    assert out[1].n_ref == 0                 # NULL dropped, not binned
    assert out[0].n_cur == 1

    with pytest.raises(ValueError):
        psi_drift(ref, cur, "v", lo=1.0, hi=1.0)


# --------------------------------------------------------------- schema_graph


def test_schema_graph_edge_classes(spark):
    from bran_spark.operators.kgquality import schema_graph

    t = spark.createDataFrame(
        [
            ("O:1", "placed_by", "C:1"),
            ("O:2", "placed_by", "C:1"),
            ("O:2", "placed_by", "C:2"),
            ("S:9", "in_nation", "N:1"),
            ("C:1", "in_nation", "N:1"),
        ],
        "subj string, pred string, obj string",
    )
    got = {(r.subj_type, r.pred, r.obj_type): (r.n_triples, r.n_subj, r.n_obj)
           for r in schema_graph(t).collect()}
    assert got[("O", "placed_by", "C")] == (3, 2, 2)
    # same pred from two subject types -> two distinct edge classes
    assert got[("S", "in_nation", "N")] == (1, 1, 1)
    assert got[("C", "in_nation", "N")] == (1, 1, 1)
    assert len(got) == 3


# ----------------------------------------------------------- blocking_quality


def test_blocking_quality_pc_pq_rr(spark):
    import pytest as _pytest

    from bran_spark.operators.evaluate import blocking_quality

    cand = spark.createDataFrame(
        [(1, 2), (3, 1), (4, 5)], "x long, y long"  # (3,1) normalizes to (1,3)
    )
    gold = spark.createDataFrame([(1, 2), (1, 3), (2, 6)], "x long, y long")
    r = blocking_quality(cand, gold, n_records=6).collect()[0]
    assert (r.n_candidates, r.n_gold, r.n_hit) == (3, 3, 2)
    assert r.pc == _pytest.approx(round(2 / 3, 6))
    assert r.pq == _pytest.approx(round(2 / 3, 6))
    assert r.rr == _pytest.approx(round(1 - 3 / 15, 6))


def test_blocking_quality_null_ratios_when_empty(spark):
    import pytest as _pytest

    from bran_spark.operators.evaluate import blocking_quality

    empty = spark.createDataFrame([], "x long, y long")
    gold = spark.createDataFrame([(1, 2)], "x long, y long")
    r = blocking_quality(empty, gold, n_records=4).collect()[0]
    assert r.n_candidates == 0 and r.pq is None and r.pc == 0.0
    assert r.rr == _pytest.approx(1.0)
    with _pytest.raises(ValueError):
        blocking_quality(empty, gold, n_records=1)


# --------------------------------------------------------- infer_entity_types


def test_infer_entity_types_majority_and_agreement(spark):
    from bran_spark.operators.kgquality import infer_entity_types

    t = spark.createDataFrame(
        [
            ("n1", "placed_by", "n2"),   # n1: O-vote, n2: C-vote
            ("n1", "placed_by", "n3"),   # n1: O-vote
            ("n1", "in_nation", "n4"),   # n1: C-vote (conflicting decl)
            ("n5", "unknown_pred", "n1"),  # ungoverned: no votes
        ],
        "subj string, pred string, obj string",
    )
    c = _constraints(
        spark,
        [("placed_by", "O", "C", True), ("in_nation", "C", "N", True)],
    )
    got = {r.node: r for r in infer_entity_types(t, c).collect()}
    assert got["n1"].inferred_type == "O"
    assert (got["n1"].n_votes, got["n1"].n_total) == (2, 3)
    assert got["n1"].agreement == pytest.approx(round(2 / 3, 6))
    assert got["n2"].inferred_type == "C" and got["n2"].agreement == 1.0
    assert got["n4"].inferred_type == "N"
    assert "n5" not in got  # only governed predicates vote


def test_infer_entity_types_tie_breaks_by_type_asc(spark):
    from bran_spark.operators.kgquality import infer_entity_types

    t = spark.createDataFrame(
        [("x", "p1", "y"), ("x", "p2", "y")],
        "subj string, pred string, obj string",
    )
    c = _constraints(spark, [("p1", "Z", "R", False), ("p2", "A", "R", False)])
    got = {r.node: r for r in infer_entity_types(t, c).collect()}
    assert got["x"].inferred_type == "A"  # A < Z on equal votes


# --------------------------------------------------------- temporal_conflicts


def test_temporal_conflicts_overlap_semantics(spark):
    import datetime as dt

    from bran_spark.operators.kgquality import temporal_conflicts

    d = dt.date
    claims = spark.createDataFrame(
        [
            ("O:1", "ships", "S:1", d(2024, 1, 1), d(2024, 1, 10)),
            ("O:1", "ships", "S:2", d(2024, 1, 8), d(2024, 1, 20)),  # overlap
            ("O:1", "ships", "S:3", d(2024, 2, 1), d(2024, 2, 5)),   # disjoint
            ("O:2", "ships", "S:1", d(2024, 1, 1), d(2024, 1, 10)),  # other key
            ("O:3", "ships", "S:9", d(2024, 3, 1), d(2024, 3, 10)),
            ("O:3", "ships", "S:9", d(2024, 3, 5), d(2024, 3, 15)),  # same obj
        ],
        "subj string, pred string, obj string, valid_from date, valid_to date",
    )
    out = temporal_conflicts(claims).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.obj_a, r.obj_b) == ("O:1", "S:1", "S:2")
    assert str(r.overlap_from) == "2024-01-08"
    assert str(r.overlap_to) == "2024-01-10"
    assert r.overlap_days == 3  # closed intervals: 8th, 9th, 10th


def test_temporal_conflicts_hot_key_cut(spark):
    import datetime as dt

    from bran_spark.operators.kgquality import temporal_conflicts

    d = dt.date(2024, 1, 1)
    rows = [("K", "p", f"V:{i}", d, dt.date(2024, 12, 31)) for i in range(5)]
    claims = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, valid_from date, valid_to date",
    )
    assert temporal_conflicts(claims, max_claims_per_key=4).count() == 0
    assert temporal_conflicts(claims, max_claims_per_key=5).count() == 10


# ------------------------------------------------------- path_cardinality_est


def test_path_cardinality_est_exact_on_uniform_graph(spark):
    from bran_spark.operators.kgquality import path_cardinality_est

    # p1: O->C uniform 2-per-obj fanin (4 triples, 2 distinct objs);
    # p2: C->N functional (2 triples, 2 distinct subjs).
    t = spark.createDataFrame(
        [
            ("O:1", "placed_by", "C:1"),
            ("O:2", "placed_by", "C:1"),
            ("O:3", "placed_by", "C:2"),
            ("O:4", "placed_by", "C:2"),
            ("C:1", "in_nation", "N:1"),
            ("C:2", "in_nation", "N:2"),
        ],
        "subj string, pred string, obj string",
    )
    got = {(r.p1, r.p2): r for r in path_cardinality_est(t).collect()}
    r = got[("placed_by", "in_nation")]
    # est = 4*2/max(2,2) = 4.0; actual = 4; uniform graph -> exact
    assert r.est == pytest.approx(4.0)
    assert r.actual == 4
    assert r.err_ratio == pytest.approx(1.0)
    # self-composition rows exist for type-compatible self pairs only
    assert ("in_nation", "placed_by") not in got  # N mids meet no subjects


def test_fs_weights_and_score_hand_values(spark):
    """Fellegi-Sunter m/u estimation and decision rule on a tiny labeled
    candidate set — weights and scores match the closed-form arithmetic."""
    import math

    from bran_spark.operators.linking import fs_field_weights, fs_score

    rows = [
        ("p1", True, True, True),    # match, both agree
        ("p2", True, False, True),   # match, b disagrees
        ("p3", False, True, False),
        ("p4", False, False, False),
        ("p5", True, False, False),
    ]
    cand = spark.createDataFrame(
        rows, "pair string, agree_a boolean, agree_b boolean, is_match boolean"
    )
    w = {
        r.field: r
        for r in fs_field_weights(cand, ["agree_a", "agree_b"]).collect()
    }
    # field a: m=(2+1)/(2+2)=0.75, u=(1+1)/(3+2)=0.4
    assert w["agree_a"].m == 0.75 and w["agree_a"].u == 0.4
    assert w["agree_a"].w_agree_fp == round(math.log(0.75 / 0.4) * 10**6)
    assert w["agree_a"].w_disagree_fp == round(math.log(0.25 / 0.6) * 10**6)
    # field b: m=(1+1)/4=0.5, u=(1+1)/5=0.4
    assert w["agree_b"].m == 0.5 and w["agree_b"].u == 0.4

    wa, wda = w["agree_a"].w_agree_fp, w["agree_a"].w_disagree_fp
    wb, wdb = w["agree_b"].w_agree_fp, w["agree_b"].w_disagree_fp
    scored = {
        r.pair: (r.score_fp, r.decision)
        for r in fs_score(
            cand,
            fs_field_weights(cand, ["agree_a", "agree_b"]),
            id_cols=["pair"],
            agree_cols=["agree_a", "agree_b"],
            upper_fp=wa + wb,   # only the both-agree pair reaches it
            lower_fp=wda + wdb,  # only the both-disagree pair sinks to it
        ).collect()
    }
    assert scored["p1"] == (wa + wb, "match")
    assert scored["p4"] == (wda + wdb, "non_match")
    assert scored["p2"] == (wa + wdb, "possible")
    assert scored["p3"] == (wda + wb, "possible")


def test_mcnemar_compare_hand_counts(spark):
    from bran_spark.operators.evaluate import mcnemar_compare

    gold = spark.createDataFrame(
        [(i,) for i in range(8)], "item int"
    )
    # A hits 0-4 (plus a non-gold FP that must be ignored), B hits 0-2,5
    a = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 4, 99]], "item int")
    b = spark.createDataFrame([(i,) for i in [0, 1, 2, 5]], "item int")
    r = mcnemar_compare(gold, a, b, keys=["item"]).collect()[0]
    # both: {0,1,2}; A-only: {3,4}; B-only: {5}; neither: {6,7}
    assert (r.n_both, r.n_a_only, r.n_b_only, r.n_neither) == (3, 2, 1, 2)
    assert r.chi2 == round((abs(2 - 1) - 1) ** 2 / 3, 6) == 0.0
    assert not r.significant_95

    # identical extractors: no discordant cells, chi2 defined as 0
    r2 = mcnemar_compare(gold, a, a, keys=["item"]).collect()[0]
    assert (r2.n_a_only, r2.n_b_only, r2.chi2) == (0, 0, 0.0)

    # strongly one-sided: b=6, c=0 -> chi2 = 25/6, significant
    a3 = spark.createDataFrame([(i,) for i in range(6)], "item int")
    b3 = spark.createDataFrame([(99,)], "item int")
    r3 = mcnemar_compare(gold, a3, b3, keys=["item"]).collect()[0]
    assert r3.chi2 == round(25 / 6, 6) and r3.significant_95


def test_cohens_kappa_hand_cells(spark):
    from bran_spark.operators.evaluate import cohens_kappa

    uni = spark.createDataFrame([(i,) for i in range(10)], "item int")
    # A says yes on 0-5 (6), B on 4-7 (4): yy={4,5}=2, nn={8,9}=2
    a = spark.createDataFrame([(i,) for i in range(6)], "item int")
    b = spark.createDataFrame([(i,) for i in range(4, 8)], "item int")
    r = cohens_kappa(a, b, uni, keys=["item"]).collect()[0]
    po = 4 / 10
    pe = 0.6 * 0.4 + 0.4 * 0.6
    assert (r.n_items, r.n_both_yes, r.n_both_no) == (10, 2, 2)
    assert r.po == round(po, 6) and r.pe == round(pe, 6)
    assert r.kappa == round((po - pe) / (1 - pe), 6)

    # perfect agreement -> kappa 1; positives outside the universe ignored
    a2 = spark.createDataFrame([(0,), (1,), (99,)], "item int")
    r2 = cohens_kappa(a2, a2, uni, keys=["item"]).collect()[0]
    assert r2.kappa == 1.0 and r2.n_items == 10

    # both raters constant-yes -> pe = 1 -> kappa undefined (NULL)
    r3 = cohens_kappa(uni, uni, uni, keys=["item"]).collect()[0]
    assert r3.kappa is None and r3.po == 1.0


def test_decayed_support_half_life_and_integer_mass(spark):
    import math

    from bran_spark.operators.kgquality import decayed_support

    ev = spark.createDataFrame(
        [
            ("s1", "o1", "2002-01-01 00:00:00"),
            ("s1", "o1", "2001-01-01 00:00:00"),
            ("s2", "o2", "2000-01-02 00:00:00"),
        ],
        "subj string, obj string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.subj, r.obj): r
        for r in decayed_support(ev, ref_time="2002-01-01").collect()
    }

    def micro(days):
        return round(2.0 ** (-days / 365.0) * 1_000_000)

    exp_s1 = round((micro(0) + micro(365)) / 1_000_000.0, 6)
    assert out[("s1", "o1")].n_events == 2
    assert abs(out[("s1", "o1")].support - exp_s1) < 1e-9
    assert str(out[("s1", "o1")].last_seen).startswith("2002-01-01")
    # two half-lives decay to ~1/4
    assert abs(out[("s2", "o2")].support - round(micro(730) / 1e6, 6)) < 1e-9
    assert 0.24 < out[("s2", "o2")].support < 0.26


def test_k_anonymity_audit_counts_small_groups(spark):
    from bran_spark.operators.contracts import k_anonymity_audit

    df = spark.createDataFrame(
        [("us", "a")] * 6 + [("us", "b")] * 2 + [("fr", "a")] * 1,
        "nation string, seg string",
    )
    row = k_anonymity_audit(df, ["nation", "seg"], k=5).head()
    assert row.n_rows == 9 and row.n_groups == 3
    assert row.min_group_size == 1
    assert row.n_violating_rows == 3  # the 2-group and the 1-group
    assert abs(row.violating_share - round(3 / 9, 6)) < 1e-9
    assert row.k_satisfied is False
    ok = k_anonymity_audit(df, ["nation", "seg"], k=1).head()
    assert ok.k_satisfied is True and ok.n_violating_rows == 0


def test_pii_scan_finds_planted_patterns_only(spark):
    from bran_spark.operators.contracts import pii_scan

    docs = spark.createDataFrame(
        [
            ("web", "reach me at jane.doe@corp.io or 555-123-4567 x2"),
            ("web", "server 10.0.0.1 logged card 4111 1111 1111 1111"),
            ("web", "nothing sensitive here at all"),
            ("mail", "two mails: a@b.co and c.d@e.org same doc"),
        ],
        "source string, text string",
    )
    out = {(r.grp, r.pattern): r for r in pii_scan(docs).collect()}
    assert out[("web", "email")].n_docs_hit == 1
    assert out[("web", "phone")].n_matches == 1
    assert out[("web", "ipv4")].n_matches == 1
    assert out[("web", "card16")].n_matches == 1
    assert out[("web", "email")].doc_rate == round(1 / 3, 6)
    assert out[("mail", "email")].n_docs_hit == 1
    assert out[("mail", "email")].n_matches == 2  # per-match count
    assert out[("mail", "phone")].n_matches == 0


def test_fd_audit_reports_only_violators(spark):
    from bran_spark.operators.contracts import fd_audit

    df = spark.createDataFrame(
        [("k1", "a"), ("k1", "a"), ("k2", "a"), ("k2", "b"), ("k2", "c"),
         ("k3", None), ("k3", "x")],
        "k string, v string",
    )
    out = {r.k: r for r in fd_audit(df, ["k"], "v").collect()}
    assert "k1" not in out  # FD holds there
    assert out["k2"].n_distinct_rhs == 3
    assert out["k2"].example_values == ["a", "b", "c"]
    # NULLs don't count as a distinct dependent value (countDistinct)
    assert "k3" not in out


def test_profile_columns_stats_and_tiebreak(spark):
    from bran_spark.operators.contracts import profile_columns

    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", None), (None, 2)],
        "a string, b int",
    )
    out = {r.col: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert out["a"].n_rows == 4 and out["a"].n_nulls == 1
    assert out["a"].null_rate == 0.25
    assert out["a"].n_distinct == 2
    assert out["a"].top_value == "x" and out["a"].top_share == 0.5
    # b: values 1,2,2 -> top 2; ties would break value-ascending
    assert out["b"].top_value == "2" and out["b"].n_nulls == 1


def test_profile_columns_all_null_column_survives(spark):
    from bran_spark.operators.contracts import profile_columns

    df = spark.createDataFrame(
        [(None, 1), (None, 2)], "dead string, live int"
    )
    out = {r.col: r for r in profile_columns(df, ["dead", "live"]).collect()}
    assert "dead" in out  # used to vanish via the empty cross join
    assert out["dead"].n_nulls == 2 and out["dead"].null_rate == 1.0
    assert out["dead"].top_value is None and out["dead"].top_share is None
    assert out["live"].top_value == "1"  # tie 1/2 -> value-asc
