"""Round-5 additions: t_closeness_audit + schema_match (contracts.py),
bh_fdr + mann_whitney (sampling.py), platt_scaling (evaluate.py),
hearst_hypernyms (extraction.py). Local exact-reference checks; the
registry twins re-check each against DuckDB at sf0.01."""

from __future__ import annotations

import math


def test_t_closeness_hand_example(spark):
    from bran_spark.operators.contracts import t_closeness_audit

    # groups: A = 4×x ; B = 1×x, 3×y ; C = 2×x, 2×y
    # global: x 7/12, y 5/12 → TVD(A) = 5/12, TVD(B) = 1/3, TVD(C) = 1/12
    rows = (
        [("A", "x")] * 4
        + [("B", "x")] + [("B", "y")] * 3
        + [("C", "x")] * 2 + [("C", "y")] * 2
    )
    df = spark.createDataFrame(rows, "g string, v string")
    out = t_closeness_audit(df, ["g"], "v", t=0.35).collect()[0].asDict()
    assert out == {
        "n_rows": 12,
        "n_groups": 3,
        "max_tvd": round(5 / 12, 6),
        "n_violating_groups": 1,  # only A exceeds 0.35
        "n_violating_rows": 4,
        "t_satisfied": False,
    }
    ok = t_closeness_audit(df, ["g"], "v", t=0.5).collect()[0]
    assert ok.t_satisfied and ok.n_violating_groups == 0


def test_mann_whitney_hand_example(spark):
    from bran_spark.operators.sampling import mann_whitney

    # ctl {1,2,3}, trt {2,3,4}: mid-ranks 1, 2.5, 2.5, 4.5, 4.5, 6
    # R1 = 2.5+4.5+6 = 13 → U1 = 13 − 3·4/2 = 7
    rows = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (1, 4)]
    df = spark.createDataFrame(rows, "arm int, y long")
    out = mann_whitney(df).collect()[0].asDict()
    assert out["n_ctl"] == 3 and out["n_trt"] == 3
    assert out["u_stat"] == 7.0
    tie = (8 - 2) + (8 - 2)  # two values with c=2
    var = 3 * 3 / 12.0 * ((6 + 1.0) - tie / (6 * 5.0))
    z = (14 - 9.0) / (2.0 * math.sqrt(var))
    assert out["z"] == round(z, 6)
    assert out["p_micro"] == int(
        math.floor(2000000.0 / (1.0 + math.exp(1.702 * abs(round(z, 6)))) + 0.5)
    )


def test_mann_whitney_degenerate(spark):
    from bran_spark.operators.sampling import mann_whitney

    # all units share one value → ndv = 1 → z NULL, p = 1e6
    df = spark.createDataFrame([(0, 5), (1, 5), (0, 5)], "arm int, y long")
    out = mann_whitney(df).collect()[0]
    assert out.z is None and out.p_micro == 1000000


def test_bh_fdr_rejects_only_real_effect(spark):
    from bran_spark.operators.sampling import bh_fdr

    rows = []
    # s1: huge effect, s2/s3: none (same populations in both arms)
    for i in range(40):
        rows.append(("s1", 0, i % 3))
        rows.append(("s1", 1, 1000 + i % 3))
        rows.append(("s2", 0, i % 7))
        rows.append(("s2", 1, i % 7))
        rows.append(("s3", 0, 50 + i % 5))
        rows.append(("s3", 1, 50 + i % 5))
    df = spark.createDataFrame(rows, "segment string, arm int, y long")
    out = {r.segment: r.asDict() for r in bh_fdr(df).collect()}
    assert out["s1"]["rank"] == 1 and out["s1"]["rejected"]
    assert not out["s2"]["rejected"] and not out["s3"]["rejected"]
    assert all(r["m"] == 3 for r in out.values())
    # identical arms → diff 0, z 0 → p_micro = round(2e6/2) = 1e6
    assert out["s2"]["p_micro"] == 1000000 and out["s2"]["diff"] == 0.0


def test_bh_fdr_flat_segment_never_rejected(spark):
    from bran_spark.operators.sampling import bh_fdr

    rows = [("f", a, 7) for a in (0, 1) for _ in range(5)]
    rows += [("e", 0, 0), ("e", 0, 2), ("e", 1, 100), ("e", 1, 102)]
    df = spark.createDataFrame(rows, "segment string, arm int, y long")
    out = {r.segment: r.asDict() for r in bh_fdr(df).collect()}
    assert out["f"]["z"] is None and out["f"]["p_micro"] == 1000000
    assert not out["f"]["rejected"]


def _platt_reference(pairs, iters=3, s_scale=10):
    """Local replay of platt_scaling's exact micro-rounded Newton."""

    def r6(x):
        return math.floor(x * 1e6 + 0.5) if x >= 0 else -math.floor(
            -x * 1e6 + 0.5
        )

    a = b = 0.0
    for _ in range(iters):
        gam = gbm = haam = habm = hbbm = 0
        for s, y in pairs:
            p = 1.0 / (1.0 + math.exp(-(a * s + b)))
            pm = r6(p)
            wm = r6(p * (1.0 - p))
            s10 = int(round(s * s_scale))
            gbm += y * 1000000 - pm
            gam += (y * 1000000 - pm) * s10
            hbbm += wm
            habm += wm * s10
            haam += wm * s10 * s10
        ga, gb = gam / 1e7, gbm / 1e6
        haa, hab, hbb = haam / 1e8, habm / 1e7, hbbm / 1e6
        det = haa * hbb - hab * hab
        if det != 0.0:
            a += (hbb * ga - hab * gb) / det
            b += (haa * gb - hab * ga) / det
    return a, b


def test_platt_scaling_matches_local_newton(spark):
    from bran_spark.operators.evaluate import platt_scaling

    # deterministic logistic-ish data: y rate rises with s
    pairs = []
    for i in range(400):
        s = (i % 41 - 20) / 10.0  # −2.0 … 2.0, exact 1 dp
        thresh = 100.0 / (1.0 + math.exp(-(1.5 * s - 0.5)))
        y = 1 if (i * 37) % 100 < thresh else 0
        pairs.append((s, y))
    df = spark.createDataFrame(pairs, "s double, label int")
    out = platt_scaling(df, "s", "label", iters=3, s_scale=10).collect()[0]
    a_ref, b_ref = _platt_reference(pairs)
    # slope/intercept should recover the planted (1.5, −0.5) direction
    assert 0.8 < out.a < 2.5 and -1.5 < out.b < 0.2
    # and match the local replay of the exact same integer Newton walk
    # (tolerance absorbs exp() ulp differences between JVM and libm)
    assert abs(out.a - a_ref) < 1e-4 and abs(out.b - b_ref) < 1e-4
    assert out.n == 400 and 0.0 < out.avg_p < 1.0 and out.log_loss > 0.0


def test_hearst_patterns_extract_all_forms(spark):
    from bran_spark.operators.extraction import (
        hearst_hypernyms,
        hearst_support,
    )

    docs = [
        (1, "metals such as copper, iron and zinc are heavy"),
        (2, "copper, iron and other metals"),
        (3, "diseases including flu and colds"),
        (4, "fruits especially mangoes"),
        (5, "metals such as copper. gems such as rubies"),
        (6, "nothing to see here"),
        (7, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r.doc_id, r.hyponym, r.hypernym, r.pattern)
        for r in hearst_hypernyms(df).collect()
    }
    assert got == {
        (1, "copper", "metals", "such_as"),
        (1, "iron", "metals", "such_as"),
        (1, "zinc", "metals", "such_as"),
        (2, "copper", "metals", "and_other"),
        (2, "iron", "metals", "and_other"),
        (3, "flu", "diseases", "including"),
        (3, "colds", "diseases", "including"),
        (4, "mangoes", "fruits", "especially"),
        (5, "copper", "metals", "such_as"),
        (5, "rubies", "gems", "such_as"),
    }
    sup = {
        (r.hyponym, r.hypernym): r.asDict()
        for r in hearst_support(hearst_hypernyms(df)).collect()
    }
    cu = sup[("copper", "metals")]
    assert cu["n_docs"] == 3 and cu["n_mentions"] == 3
    assert cu["patterns"] == "and_other,such_as"


def test_schema_match_planted_overlap(spark):
    from bran_spark.operators.contracts import schema_match

    left = spark.createDataFrame(
        [(1, "p"), (2, "q"), (3, "p")], "a int, b string"
    )
    right = spark.createDataFrame(
        [(2, "p"), (3, "r"), (4, "r")], "x int, y string"
    )
    out = {
        (r.left_col, r.right_col): r.asDict()
        for r in schema_match(left, right, ["a", "b"], ["x", "y"]).collect()
    }
    ax = out[("a", "x")]
    assert ax["n_left"] == 3 and ax["n_right"] == 3 and ax["n_common"] == 2
    assert ax["jaccard"] == 0.5 and ax["rank"] == 1
    assert out[("b", "y")]["n_common"] == 1  # {"p"} of {p,q}∪{p,r}
    assert out[("b", "y")]["jaccard"] == round(1 / 3, 6)
    assert out[("a", "y")]["n_common"] == 0 and out[("a", "y")]["jaccard"] == 0.0
    assert out[("a", "y")]["rank"] == 2


def test_butterfly_count_hand_example(spark):
    from bran_spark.operators.graphalgo import butterfly_count

    # L={a,b,c}, R={x,y}: deg(x)=2, deg(y)=3 → wedges 1+3=4;
    # codeg(a,b)=2 → one butterfly; all other pairs codeg ≤ 1
    edges = [("a", "x"), ("b", "x"), ("a", "y"), ("b", "y"), ("c", "y")]
    df = spark.createDataFrame(edges, "u string, v string")
    out = butterfly_count(df).collect()[0].asDict()
    assert out == {
        "n_left": 3,
        "n_right": 2,
        "n_edges": 5,
        "n_wedges": 4,
        "n_butterflies": 1,
    }
    # df-cut: pivot y (deg 3) excluded → only x's wedge remains
    cut = butterfly_count(df, max_pivot_deg=2).collect()[0].asDict()
    assert cut == {
        "n_left": 2,
        "n_right": 1,
        "n_edges": 2,
        "n_wedges": 1,
        "n_butterflies": 0,
    }


def test_wl_refinement_path_graph(spark):
    from bran_spark.operators.graphalgo import symmetric_edges, wl_refinement

    # path a-b-c-d-e: degrees split {ends, middles} at round 0; round 1
    # separates c (both neighbors degree-2) from b/d → 3 stable classes
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "subj string, obj string")
    out = {
        r.round: (r.n_colors, r.max_class)
        for r in wl_refinement(symmetric_edges(df), rounds=2).collect()
    }
    assert out == {0: (2, 3), 1: (3, 2), 2: (3, 2)}


def test_distmult_eval_ranks_are_valid_and_deterministic(spark):
    from bran_spark.operators.kglearn import transe_rank_eval

    trips = [
        (f"a:{i}", "rel", f"a:{(i * 3) % 7 + 1}") for i in range(1, 8)
    ] + [(f"a:{i}", "rel2", f"a:{(i % 3) + 1}") for i in range(1, 6)]
    df = spark.createDataFrame(trips, "subj string, pred string, obj string")
    out = {
        r.pred: r.asDict()
        for r in transe_rank_eval(
            df, test_sample_mod=1, model="distmult"
        ).collect()
    }
    n_per_pred = {"rel": 7, "rel2": 5}
    for pred, row in out.items():
        assert row["n_test"] == n_per_pred[pred]
        assert 0.0 < row["mrr"] <= 1.0
        assert row["mean_rank"] >= 1.0
    again = {
        r.pred: r.asDict()
        for r in transe_rank_eval(
            df, test_sample_mod=1, model="distmult"
        ).collect()
    }
    assert out == again


def test_bgp_match_cyclic_and_constant(spark):
    from bran_spark.operators.kgquality import bgp_match

    trips = [
        ("o1", "placed_by", "c1"),
        ("c1", "in_nation", "n1"),
        ("o1", "uses_supplier", "s1"),
        ("s1", "in_nation", "n1"),
        # o2's supplier sits in a different nation → no binding
        ("o2", "placed_by", "c2"),
        ("c2", "in_nation", "n2"),
        ("o2", "uses_supplier", "s1"),
        ("a", "self", "a"),
        ("a", "self", "b"),
    ]
    df = spark.createDataFrame(trips, "subj string, pred string, obj string")
    got = bgp_match(
        df,
        [
            ("?o", "placed_by", "?c"),
            ("?c", "in_nation", "?n"),
            ("?o", "uses_supplier", "?s"),
            ("?s", "in_nation", "?n"),
        ],
    )
    assert got.columns == ["c", "n", "o", "s"]
    assert [tuple(r) for r in got.collect()] == [("c1", "n1", "o1", "s1")]
    # constant object
    xs = {r.x for r in bgp_match(df, [("?x", "in_nation", "n1")]).collect()}
    assert xs == {"c1", "s1"}
    # variable repeated within one pattern → row-level equality
    same = bgp_match(df, [("?x", "self", "?x")]).collect()
    assert [r.x for r in same] == ["a"]


def test_ccnet_buckets_orders_by_quality(spark):
    from bran_spark.operators.quality import ccnet_buckets

    # lang A: 4 docs — common words score high, rare words low
    docs = [
        (1, "aa aa aa aa", "A"),
        (2, "aa aa aa bb", "A"),
        (3, "aa bb cc dd", "A"),
        (4, "ee ff gg hh", "A"),
        (5, "aa aa", "B"),
        (6, "zz yy", "B"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = [r.asDict() for r in ccnet_buckets(df).collect()]
    a = [r for r in out if r["lang"] == "A"]
    assert [r["bucket"] for r in a] == ["head", "middle", "tail"]
    assert [r["n_docs"] for r in a] == [2, 1, 1]  # ntile(3) over 4 docs
    assert a[0]["avg_logprob"] > a[-1]["avg_logprob"]
    b = [r for r in out if r["lang"] == "B"]
    assert [r["n_docs"] for r in b] == [1, 1]  # 2 docs → tiles 1 and 2
    # the worst OBSERVED tier is tail even when fewer tiles than buckets
    assert [r["bucket"] for r in b] == ["head", "tail"]


def test_cmh_test_hand_example(spark):
    from bran_spark.operators.evaluate import cmh_test

    rows = []
    # two identical-shape strata: exposed 10 (7 pos / 6 pos),
    # unexposed 10 (3 pos / 4 pos)
    for k, pos_e, pos_u in (("k1", 7, 3), ("k2", 6, 4)):
        rows += [(k, 1, 1)] * pos_e + [(k, 1, 0)] * (10 - pos_e)
        rows += [(k, 0, 1)] * pos_u + [(k, 0, 0)] * (10 - pos_u)
    df = spark.createDataFrame(rows, "stratum string, exposure int, outcome int")
    out = cmh_test(df).collect()[0].asDict()
    assert out["n_strata"] == 2 and out["n_units"] == 40
    assert out["sum_a"] == 13
    # per stratum: E = 10·10/20 = 5 (em 5e6), V = 10⁴/(400·19) → vm 1315789
    svm = 2 * 1315789
    z = (13 - 10.0) / math.sqrt(svm / 1e6)
    assert out["z"] == round(z, 6)
    assert 0 < out["p_micro"] < 200000  # |z| ≈ 1.85 → small-ish p


def test_chi_square_counts_empty_cells(spark):
    from bran_spark.operators.evaluate import chi_square_independence

    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square_independence(df, "r", "c").collect()[0].asDict()
    # e(a,x)=7.5, e(a,y)=2.5, e(b,x)=7.5, e(b,y)=2.5 (EMPTY cell counts!)
    # terms: 0.833333, 2.5, 0.833333, 2.5 → micro sum 6666666
    assert out["n"] == 20 and out["df"] == 1
    assert out["chi2"] == 6.666666
    assert out["z"] is not None and out["p_micro"] < 100000


def test_chi_square_independent_table_accepts(spark):
    from bran_spark.operators.evaluate import chi_square_independence

    # perfectly independent 2×2: o = margins product / n exactly
    rows = (
        [("a", "x")] * 6 + [("a", "y")] * 6
        + [("b", "x")] * 4 + [("b", "y")] * 4
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square_independence(df, "r", "c").collect()[0].asDict()
    assert out["chi2"] == 0.0 and out["p_micro"] > 500000


def test_node2vec_walks_match_local_replay(spark):
    import hashlib

    from bran_spark.operators.graphalgo import node2vec_walks, symmetric_edges

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
        ("d", "e"),
    ]
    df = spark.createDataFrame(edges, "subj string, obj string")
    got = {
        (r.start, r.walk_id, r.step): r.node
        for r in node2vec_walks(
            symmetric_edges(df), p=4.0, q=0.25, n_walks=2, walk_len=3
        ).collect()
    }

    adj = {}
    for s, o in edges:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    adj = {k: sorted(v) for k, v in adj.items()}

    def h8(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    import math

    INV_P, INV_Q = 250000, 4000000
    for start in adj:
        for wid in range(2):
            prev, cur = None, start
            assert got[(start, wid, 0)] == start
            nb = adj[cur]
            nxt = nb[h8(f"{cur}:{wid}:1") % len(nb)]
            assert got[(start, wid, 1)] == nxt
            prev, cur = cur, nxt
            for t in (2, 3):
                best = None
                for w in adj[cur]:
                    wt = (
                        INV_P if w == prev
                        else 1000000 if w in adj[prev] else INV_Q
                    )
                    u = (
                        (h8(f"{start}:{cur}:{w}:{wid}:{t}") % 1000000) + 0.5
                    ) / 1000000.0
                    sc = round(math.log(wt) - math.log(-math.log(u)), 6)
                    if best is None or (sc, w) > best:
                        best = (sc, w)
                prev, cur = cur, best[1]
                assert got[(start, wid, t)] == cur, (start, wid, t)


def test_t_closeness_null_sensitive_values(spark):
    from bran_spark.operators.contracts import t_closeness_audit

    # every group's (x, NULL) mix equals the global one → TVD must be 0;
    # an all-NULL group must still be audited (it is maximally skewed)
    rows = [("A", "x"), ("A", None), ("B", "x"), ("B", None)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = t_closeness_audit(df, ["g"], "v", t=0.1).collect()[0]
    assert out.n_rows == 4 and out.n_groups == 2
    assert out.max_tvd == 0.0 and out.t_satisfied

    rows2 = [("A", "x")] * 2 + [("B", None)] * 2
    out2 = t_closeness_audit(
        spark.createDataFrame(rows2, "g string, v string"), ["g"], "v", t=0.1
    ).collect()[0]
    assert out2.n_rows == 4 and out2.n_groups == 2
    assert out2.max_tvd == 0.5 and not out2.t_satisfied


def test_chi_square_null_categories(spark):
    from bran_spark.operators.evaluate import chi_square_independence

    rows = [
        ("a", "en"), ("a", "en"), ("a", None),
        ("b", "en"), ("b", None), ("b", None),
    ]
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square_independence(df, "r", "c").collect()[0].asDict()
    # NULL is a category: o = [[2,1],[1,2]], e = 1.5 everywhere →
    # chi2 = 4·(0.25/1.5) = 0.666668 in micro-rounded terms, df = 1
    assert out["n"] == 6 and out["df"] == 1
    assert abs(out["chi2"] - 2 / 3) < 1e-5


def test_bgp_match_empty_patterns_raises(spark):
    import pytest

    from bran_spark.operators.kgquality import bgp_match

    df = spark.createDataFrame([("a", "p", "b")], "subj string, pred string, obj string")
    with pytest.raises(ValueError):
        bgp_match(df, [])


def test_schema_match_keeps_all_null_column(spark):
    from bran_spark.operators.contracts import schema_match

    left = spark.createDataFrame(
        [(1, None), (2, None)], "a int, dead string"
    )
    right = spark.createDataFrame([(2,), (3,)], "x int")
    out = {
        (r.left_col, r.right_col): r.asDict()
        for r in schema_match(left, right, ["a", "dead"], ["x"]).collect()
    }
    assert ("dead", "x") in out  # dead column still ranked
    d = out[("dead", "x")]
    assert d["n_left"] == 0 and d["n_common"] == 0 and d["jaccard"] == 0.0


def test_fairness_audit_hand_example(spark):
    from bran_spark.operators.contracts import fairness_audit

    rows = (
        # group a: 4 units, 2 pos; pred selects both pos + 1 neg
        [("a", 1, 1), ("a", 1, 1), ("a", 0, 1), ("a", 0, 0)]
        # group b: 4 units, 2 pos; pred selects 1 pos only
        + [("b", 1, 1), ("b", 1, 0), ("b", 0, 0), ("b", 0, 0)]
        # group c: no positives → tpr NULL, skipped by the tpr max
        + [("c", 0, 1), ("c", 0, 0)]
    )
    df = spark.createDataFrame(rows, "grp string, y int, p int")
    out = {r.grp: r.asDict() for r in fairness_audit(df, "grp", "y", "p").collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert a["pred_rate"] == 0.75 and a["tpr"] == 1.0 and a["fpr"] == 0.5
    assert b["pred_rate"] == 0.25 and b["tpr"] == 0.5 and b["fpr"] == 0.0
    assert c["tpr"] is None and c["tpr_gap"] is None
    assert a["dp_gap"] == 0.0  # a is best-off on selection
    assert b["dp_gap"] == 0.5 and b["tpr_gap"] == 0.5
    assert c["dp_gap"] == 0.25


def test_privacy_gate_job_smoke(tmp_path):
    import json
    import subprocess
    import sys

    out = tmp_path / "gate.json"
    r = subprocess.run(
        [
            sys.executable, "jobs/run_privacy_gate.py",
            "--sf-dir", "/root/testdata/sf0.001",
            "--master", "local[4]", "--shuffle-partitions", "8",
            "--out", str(out), "--fail-on-violations",
        ],
        capture_output=True, text=True, timeout=600,
    )
    rep = json.loads(out.read_text())
    # sf0.001 customer QI groups are tiny → k/l/t gates must fail and
    # --fail-on-violations must exit non-zero
    assert not rep["k_anonymity"]["satisfied"]
    assert not rep["all_satisfied"]
    assert rep["pii"]["satisfied"] and rep["fairness"]["n_groups"] == 5
    assert r.returncode == 2


def test_calibration_summary_hand_example(spark):
    from bran_spark.operators.evaluate import calibration_summary

    # two bins: p=0.1 (acc 0) ×2, p=0.9 (acc 0.5) ×2
    rows = [(0.1, 0), (0.1, 0), (0.9, 1), (0.9, 0)]
    df = spark.createDataFrame(rows, "p double, label int")
    out = calibration_summary(df, "p", "label", n_bins=2).collect()[0].asDict()
    assert out["n"] == 4 and out["n_bins_used"] == 2
    assert out["ece"] == 0.25 and out["mce"] == 0.4
    assert out["brier"] == 0.21
    assert out["reliability"] == 0.085
    assert out["resolution"] == 0.0625
    assert out["uncertainty"] == 0.1875
    # within-bin-constant forecasts satisfy the Murphy identity exactly
    assert abs(
        out["uncertainty"] - out["resolution"] + out["reliability"]
        - out["brier"]
    ) < 1e-9


def test_hub_ablation_splits_on_hub_removal(spark):
    from bran_spark.operators.graphalgo import hub_ablation, symmetric_edges

    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("d", "e"), ("e", "f"), ("d", "f")]
    hub = [("h", x) for x in "abcdef"]
    df = spark.createDataFrame(
        tri1 + tri2 + hub, "subj string, obj string"
    )
    out = {r.phase: r.asDict() for r in hub_ablation(symmetric_edges(df), k=1).collect()}
    b, a = out["before"], out["after"]
    assert (b["n_nodes"], b["n_edges"], b["n_components"], b["largest_cc"]) == (7, 12, 1, 7)
    assert (a["n_nodes"], a["n_edges"], a["n_components"], a["largest_cc"]) == (6, 6, 2, 3)


def test_hub_ablation_counts_isolated_survivors(spark):
    from bran_spark.operators.graphalgo import hub_ablation, symmetric_edges

    # star only: removing the hub leaves 3 isolated singletons
    df = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], "subj string, obj string"
    )
    out = {r.phase: r.asDict() for r in hub_ablation(symmetric_edges(df), k=1).collect()}
    a = out["after"]
    assert (a["n_nodes"], a["n_edges"], a["n_components"], a["largest_cc"]) == (3, 0, 3, 1)
