"""Round-5 session-3 additions: inverse_predicates + katz_centrality
(graphalgo.py), entity_summarization + capture_recapture (kgquality.py),
delta_method_ratio + mde_power + diff_in_diff + bayes_ab (sampling.py),
benford_audit (contracts.py). Local exact-reference checks; the registry
twins re-check each against DuckDB at sf0.01."""

from __future__ import annotations

import math


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_inverse_predicates_exact_inverse_and_symmetric(spark):
    from bran_spark.operators.graphalgo import inverse_predicates

    rows = (
        # p: a→b, c→d ; q = exact inverse of p
        [("a", "p", "b"), ("c", "p", "d"), ("b", "q", "a"), ("d", "q", "c")]
        # s: symmetric on {x,y} both directions + one unreciprocated x→z
        + [("x", "s", "y"), ("y", "s", "x"), ("x", "s", "z")]
        # r: shares nothing inverted with anyone
        + [("a", "r", "b")]
    )
    out = {
        (r.p1, r.p2): r
        for r in inverse_predicates(_triples(spark, rows)).collect()
    }
    pq = out[("p", "q")]
    assert pq.n_common == 2 and pq.n1 == 2 and pq.n2 == 2
    assert pq.containment == 1.0 and pq.jaccard == 1.0
    ss = out[("s", "s")]
    # both ordered copies of the reciprocated pair count; n1 = n2 = 3
    assert ss.n_common == 2 and ss.n1 == 3
    assert ss.containment == round(2 / 3, 6)
    # r inverts q's (b→a): ext(r)={(a,b)}, inv(ext(q))={(a,b),(c,d)}
    rq = out[("q", "r")]
    assert rq.n_common == 1 and rq.containment == 1.0
    assert ("r", "r") not in out and ("p", "p") not in out


def test_inverse_predicates_self_loop_excluded_on_diagonal(spark):
    from bran_spark.operators.graphalgo import inverse_predicates

    rows = [("a", "s", "a"), ("a", "s", "b"), ("b", "s", "a")]
    out = inverse_predicates(_triples(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # the (a,a) self-loop matches itself reversed but is NOT reciprocity
    assert (r.p1, r.p2) == ("s", "s") and r.n_common == 2 and r.n1 == 3


def test_katz_centrality_matches_local_recurrence(spark):
    from bran_spark.operators.graphalgo import katz_centrality

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "c")]
    df = spark.createDataFrame(edges, "subj string, obj string")
    out = {
        r.node: r.katz_fp
        for r in katz_centrality(df, iters=3, beta_num=5, beta_den=100).collect()
    }
    # local integer recurrence: x ← 10^6 + (5·Σ_in x) DIV 100
    x = {n: 1_000_000 for n in "abcd"}
    for _ in range(3):
        nxt = {}
        for n in "abcd":
            s = sum(x[u] for (u, v) in edges if v == n)
            nxt[n] = 1_000_000 + (5 * s) // 100
        x = nxt
    assert out == x
    # source node never gains walk mass; sinks with fan-in do
    assert out["a"] == 1_000_000 and out["c"] > out["b"] > out["a"]


def test_entity_summarization_prefers_rare_facts(spark):
    from bran_spark.operators.kgquality import entity_summarization

    rows = (
        # 'common' predicate: 4 triples, obj o1 has fan-in 3
        [("s1", "common", "o1"), ("s2", "common", "o1"),
         ("s3", "common", "o1"), ("s1", "common", "o2")]
        # 'rare' predicate: 1 triple → key 1·1 = 1, always wins
        + [("s1", "rare", "o3")]
    )
    out = entity_summarization(_triples(spark, rows), k=2).collect()
    s1 = sorted(
        ((r.rank, r.pred, r.obj, r.n_pred, r.n_po) for r in out
         if r.subj == "s1")
    )
    # s1's rarest fact is (rare, o3) with key 1; then (common, o2) key 4
    assert s1 == [(1, "rare", "o3", 1, 1), (2, "common", "o2", 4, 1)]
    # every subject emits at most k rows
    from collections import Counter

    counts = Counter(r.subj for r in out)
    assert all(v <= 2 for v in counts.values())


def test_capture_recapture_chapman_hand_example(spark):
    from bran_spark.operators.kgquality import capture_recapture

    a = _triples(
        spark,
        [("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3"),
         ("s1", "q", "o1")],
    )
    b = _triples(
        spark,
        [("s1", "p", "o1"), ("s2", "p", "o2"), ("s4", "p", "o4")],
    )
    out = {r.pred: r for r in capture_recapture(a, b).collect()}
    p = out["p"]
    # Chapman: (3+1)(3+1) DIV (2+1) − 1 = 4
    assert (p.n_a, p.n_b, p.n_both, p.est_total) == (3, 3, 2, 4)
    assert p.completeness_a == 0.75
    assert p.completeness_union == 1.0  # 3+3−2 = 4 of 4
    q = out["q"]
    # one-occasion predicate: honest NULLs
    assert q.n_b is None and q.est_total is None
    assert q.completeness_a is None


def test_delta_method_ratio_matches_local_formula(spark):
    from bran_spark.operators.sampling import delta_method_ratio

    units = [
        (0, 100, 2), (0, 300, 4), (0, 200, 3),
        (1, 400, 4), (1, 100, 1), (1, 500, 6),
    ]
    df = spark.createDataFrame(units, "arm int, num long, den long")
    out = delta_method_ratio(df, num_scale=100, den_scale=1).collect()[0]

    def local(rows):
        n = len(rows)
        ns = [r[0] / 100.0 for r in rows]
        ds = [float(r[1]) for r in rows]
        sn, sd = sum(ns), sum(ds)
        ratio = sn / sd
        vn = sum((v - sn / n) ** 2 for v in ns) / (n - 1)
        vd = sum((v - sd / n) ** 2 for v in ds) / (n - 1)
        cnd = sum(
            (a - sn / n) * (b - sd / n) for a, b in zip(ns, ds)
        ) / (n - 1)
        dbar = sd / n
        var = (vn - 2 * ratio * cnd + ratio * ratio * vd) / (n * dbar * dbar)
        return ratio, max(var, 0.0)

    r0, v0 = local([(u[1], u[2]) for u in units if u[0] == 0])
    r1, v1 = local([(u[1], u[2]) for u in units if u[0] == 1])
    assert out.n_ctl == 3 and out.n_trt == 3
    assert abs(out.ratio_ctl - r0) < 1e-6 and abs(out.ratio_trt - r1) < 1e-6
    se = math.sqrt(v0 + v1)
    assert abs(out.se - se) < 1e-6
    assert abs(out.z_stat - (r1 - r0) / se) < 1e-6


def test_delta_method_ratio_degenerate_arm(spark):
    from bran_spark.operators.sampling import delta_method_ratio

    df = spark.createDataFrame(
        [(0, 100, 2), (1, 100, 1), (1, 200, 2)], "arm int, num long, den long"
    )
    out = delta_method_ratio(df).collect()[0]
    assert out.ratio_ctl is not None  # point estimate still defined
    assert out.se is None and out.z_stat is None  # n_ctl < 2 → no variance


def test_mde_power_matches_local_formula(spark):
    from bran_spark.operators.sampling import mde_power

    units = [(0, 100), (0, 200), (0, 300), (1, 250), (1, 350), (1, 450)]
    df = spark.createDataFrame(units, "arm int, y long")
    out = mde_power(df, scale=100).collect()[0]
    c = [1.0, 2.0, 3.0]
    t = [2.5, 3.5, 4.5]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    se = math.sqrt(var(c) / 3 + var(t) / 3)
    mde = (1.959964 + 0.841621) * se
    assert abs(out.se - se) < 1e-6
    assert abs(out.mde_abs - mde) < 1e-6
    assert abs(out.mde_rel - mde / 2.0) < 1e-6
    diff = 1.5
    zpow = abs(diff) / se - 1.959964
    power = 1000000.0 / (1.0 + math.exp(-1.702 * zpow))
    assert abs(out.power_micro - power) <= 1.0
    assert out.diff == 1.5


def test_diff_in_diff_planted_effect(spark):
    from bran_spark.operators.sampling import diff_in_diff

    # ctl: 10 → 20 (trend +10); trt: 10 → 35 → DiD = +15
    rows = (
        [(0, 0, 900), (0, 0, 1000), (0, 0, 1100)]
        + [(0, 1, 1900), (0, 1, 2000), (0, 1, 2100)]
        + [(1, 0, 950), (1, 0, 1000), (1, 0, 1050)]
        + [(1, 1, 3400), (1, 1, 3500), (1, 1, 3600)]
    )
    df = spark.createDataFrame(rows, "grp int, period int, y long")
    out = diff_in_diff(df).collect()[0]
    assert out.mean_ctl_pre == 10.0 and out.mean_trt_post == 35.0
    assert out.did == 15.0
    w = (1.0 / 3 + 1.0 / 3 + 0.25 / 3 + 1.0 / 3)
    assert abs(out.se - math.sqrt(w)) < 1e-6
    assert abs(out.t_stat - 15.0 / math.sqrt(w)) < 1e-6


def test_diff_in_diff_empty_cell_is_null(spark):
    from bran_spark.operators.sampling import diff_in_diff

    rows = [(0, 0, 100), (0, 0, 200), (0, 1, 100), (0, 1, 200),
            (1, 0, 100), (1, 0, 200)]  # no (1,1) cell
    out = diff_in_diff(spark.createDataFrame(
        rows, "grp int, period int, y long")).collect()[0]
    assert out.n_trt_post == 0 and out.did is None and out.se is None


def test_bayes_ab_posterior_and_p_beats(spark):
    from bran_spark.operators.sampling import bayes_ab

    rows = [(0, 1)] * 3 + [(0, 0)] * 7 + [(1, 1)] * 6 + [(1, 0)] * 4
    df = spark.createDataFrame(rows, "arm int, y long")
    out = bayes_ab(df).collect()[0]
    mu0, mu1 = 4 / 12, 7 / 12
    assert out.conv_ctl == 0.3 and out.conv_trt == 0.6
    assert out.post_mean_ctl == round(mu0, 6)
    assert out.post_mean_trt == round(mu1, 6)
    v0 = mu0 * (1 - mu0) / 13
    v1 = mu1 * (1 - mu1) / 13
    z = (mu1 - mu0) / math.sqrt(v0 + v1)
    assert abs(out.z - z) < 1e-6
    p = 1000000.0 / (1.0 + math.exp(-1.702 * out.z))
    assert abs(out.p_beats_micro - p) <= 1.0
    assert out.p_beats_micro > 500000  # treatment ahead


def test_bayes_ab_null_data_is_half(spark):
    from bran_spark.operators.sampling import bayes_ab

    rows = [(0, 1), (0, 0), (1, 1), (1, 0)]
    out = bayes_ab(spark.createDataFrame(rows, "arm int, y long")).collect()[0]
    assert out.lift == 0.0 and out.p_beats_micro == 500000


def test_benford_audit_planted_digits(spark):
    from bran_spark.operators.contracts import benford_audit

    # 4×1xx, 2×2xx, 1×9xx, plus one zero and one negative (excluded);
    # digit values chosen so substr math crosses magnitudes: 1, 10, 199...
    cents = [1, 10, 199, 1500, 2, 25, 900, 0, -3]
    df = spark.createDataFrame([(c,) for c in cents], "cents long")
    rows = {r.digit: r for r in benford_audit(df, "cents").collect()}
    assert len(rows) == 9
    assert rows[1].n == 4 and rows[2].n == 2 and rows[9].n == 1
    assert rows[3].n == 0 and rows[3].obs_frac == 0.0
    r1 = rows[1]
    assert r1.n_total == 7 and r1.n_excluded == 2
    assert r1.exp_frac == round(math.log10(2.0), 6)
    assert r1.obs_frac == round(4 / 7, 6)
    # chi2 identical on every row and equals the micro-summed statistic
    chi = {r.chi2 for r in rows.values()}
    assert len(chi) == 1
    expected = sum(
        round(
            (rows[d].n / 7.0 - rows[d].exp_frac) ** 2
            / rows[d].exp_frac * 7.0 * 1e6
        )
        for d in range(1, 10)
    ) / 1e6
    assert abs(chi.pop() - expected) < 1e-6


def test_benford_audit_empty_input(spark):
    from bran_spark.operators.contracts import benford_audit

    df = spark.createDataFrame([(0,), (-5,)], "cents long")
    rows = benford_audit(df, "cents").collect()
    assert len(rows) == 9
    assert all(r.n == 0 and r.obs_frac is None and r.chi2 is None
               for r in rows)
    assert rows[0].n_excluded == 2 and rows[0].n_total == 0


def test_dp_release_audit_deterministic_and_bounded(spark):
    import hashlib

    from bran_spark.operators.contracts import dp_release_audit

    rows = [("en",)] * 50 + [("de",)] * 30 + [("fr",)] * 20
    df = spark.createDataFrame(rows, "lang string")
    out = {r.grp: r for r in dp_release_audit(
        df, "lang", epsilon=0.5, release_tag="r0").collect()}
    assert out["en"].true_count == 50 and out["en"].epsilon == 0.5

    def local_noise(grp):
        h = int(hashlib.md5(f"r0|{grp}".encode()).hexdigest()[:8], 16)
        u = (h % 1000000 + 0.5) / 1000000.0
        w = u - 0.5
        lap = -(1.0 / 0.5) * (1 if w > 0 else -1) * math.log(1 - 2 * abs(w))
        micro = round(lap * 1000000.0)
        return math.floor((micro + 500000) / 1000000.0)

    for g in ("en", "de", "fr"):
        assert out[g].noisy_count == out[g].true_count + local_noise(g)
        assert out[g].abs_err == abs(local_noise(g))
        # sensitivity-1 Laplace at eps 0.5: |noise| ≤ ln(1e6)/0.5 ≈ 27.6
        assert out[g].abs_err <= 28
    # rerun is bit-identical (the determinism seam)
    again = {r.grp: r.noisy_count for r in dp_release_audit(
        df, "lang", epsilon=0.5, release_tag="r0").collect()}
    assert again == {g: out[g].noisy_count for g in out}
    # a different release tag draws different noise for some group
    other = {r.grp: r.noisy_count for r in dp_release_audit(
        df, "lang", epsilon=0.5, release_tag="r1").collect()}
    assert other != again


def test_winsorized_effect_hand_example(spark):
    from bran_spark.operators.sampling import winsorized_effect

    # pooled values 1..7,100 cents; pct=75, n=8 → clip = min v with
    # cum·100 ≥ 600 → v=6; trt's 7 and 100 both clip to 6
    rows = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (1, 6), (1, 7), (1, 100)]
    df = spark.createDataFrame(rows, "arm int, y long")
    out = winsorized_effect(df, scale=100, pct=75).collect()[0]
    assert out.clip_value == 0.06 and out.n_clipped == 2
    c = [0.01, 0.02, 0.03, 0.04]
    t = [0.05, 0.06, 0.06, 0.06]
    mc, mt = sum(c) / 4, sum(t) / 4
    assert out.mean_ctl == round(mc, 6) and out.mean_trt == round(mt, 6)

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    se = math.sqrt(var(c) / 4 + var(t) / 4)
    assert abs(out.se - se) < 1e-6
    assert abs(out.t_stat - (mt - mc) / se) < 1e-6


def test_winsorized_effect_no_outlier_is_plain_welch(spark):
    from bran_spark.operators.sampling import ab_effect, winsorized_effect

    # pct=100 → clip = max value → nothing clips → identical to ab_effect
    rows = [(0, 100), (0, 200), (1, 300), (1, 400)]
    df = spark.createDataFrame(rows, "arm int, y long")
    w = winsorized_effect(df, scale=100, pct=100).collect()[0]
    a = ab_effect(df, scale=100).collect()[0]
    assert w.n_clipped == 0
    assert (w.mean_ctl, w.mean_trt, w.diff, w.se, w.t_stat) == (
        a.mean_ctl, a.mean_trt, a.diff, a.se, a.t_stat)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "subj string, obj string")


def test_scc_cycles_chain_and_singletons(spark):
    from bran_spark.operators.graphalgo import scc

    pairs = [
        # 3-cycle {a,b,c}; 2-cycle {x,y}; DAG bridge c→m→x; feeder d→a
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "x"),
        ("c", "m"), ("m", "x"), ("d", "a"),
        # self-loop-only node
        ("z", "z"),
    ]
    out = {r.node: r.scc_id for r in scc(_edges(spark, pairs)).collect()}
    assert out == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x",
        "m": "m", "d": "d", "z": "z",
    }


def test_scc_chain_of_sccs_needs_second_round(spark):
    from bran_spark.operators.graphalgo import scc

    # SCC {a,b} feeds SCC {c,d}: c's min ancestor is 'a' but min
    # descendant is 'c' → unresolved until {a,b} peels in round 1
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c")]
    out = {r.node: r.scc_id for r in scc(_edges(spark, pairs)).collect()}
    assert out == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_scc_pure_dag_all_singletons(spark):
    from bran_spark.operators.graphalgo import scc

    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    out = {r.node: r.scc_id for r in scc(_edges(spark, pairs)).collect()}
    assert out == {n: n for n in "abcd"}


def test_texttiling_planted_topic_shift(spark):
    from bran_spark.operators.quality import texttiling_boundaries

    two_topic = " ".join(["cat"] * 20 + ["dog"] * 20)
    uniform = " ".join(["same"] * 30)
    short = "only one block here"
    df = spark.createDataFrame(
        [(1, two_topic), (2, uniform), (3, short)], "doc_id long, text string"
    )
    out = texttiling_boundaries(df, "doc_id", "text", block_words=10)
    rows = {(r.doc_id, r.gap): r for r in out.collect()}
    # doc 1: 4 blocks → 3 gaps; the cat→dog valley at gap 1 is the cut
    assert rows[(1, 0)].sim == 1.0 and rows[(1, 2)].sim == 1.0
    assert rows[(1, 1)].sim == 0.0 and rows[(1, 1)].is_boundary
    assert not rows[(1, 0)].is_boundary and not rows[(1, 2)].is_boundary
    # doc 2: all-identical blocks → no strict local minimum, no boundary
    d2 = [r for (d, _), r in rows.items() if d == 2]
    assert len(d2) == 2 and all(not r.is_boundary for r in d2)
    # doc 3: a single block emits no gaps at all
    assert not any(d == 3 for (d, _) in rows)


def test_kg_fusion_job_rediscovers_planted_heterogeneities(tmp_path):
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [
            sys.executable, "jobs/run_kg_fusion.py",
            "--sf-dir", "/root/testdata/sf0.001",
            "--master", "local[4]", "--shuffle-partitions", "8",
            "--out", str(tmp_path / "pub"),
            "--fail-under-completeness", "0.5",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    funnel = json.loads(r.stdout.strip().splitlines()[-1])
    # the three planted heterogeneities must be rediscovered from
    # extension statistics alone (nothing is keyed on the names)
    assert funnel["renamed_predicates"] == {
        "bulk_supplier": "supplied_by", "located_in": "in_nation"
    }
    assert funnel["flipped_predicates"] == {"supplies": "supplied_by"}
    # feed B recovers supply pairs feed A's lossy extractor missed, so
    # the fused graph is strictly richer than either feed alone
    # (raw feed B is LARGER than the fused graph — its synonym/inverse
    # copies collapse under canonicalization, which is the point)
    assert funnel["fused_triples"] > funnel["feed_a_triples"]
    assert 0 < funnel["corroborated_triples"] < funnel["fused_triples"]
    # Chapman estimate from the two lossy supply extractors recovers the
    # true distinct pair count (1905 at sf0.001) near-exactly
    sup = funnel["completeness"]["supplied_by"]
    assert sup["n_both"] < min(sup["n_a"], sup["n_b"])
    assert abs(sup["est_total"] - 1905) <= 5
    # single-feed predicate honestly reports no estimate
    assert funnel["completeness"]["placed_by"]["est_total"] is None
    # published output exists and is predicate-partitioned
    import os

    parts = os.listdir(tmp_path / "pub" / "triples")
    assert any(p.startswith("pred=") for p in parts)
