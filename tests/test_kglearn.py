"""KG representation-learning data ops (operators/kglearn.py,
kgquality.ntriples_export): local exact-reference checks — the Spark
results must equal a pure-Python replay of the same md5-integer math
(the registry twins re-check the same operators against DuckDB at
sf0.01)."""

from __future__ import annotations

import hashlib

import pytest


def _md5int8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _emb(x: str, dim: int = 8) -> list[int]:
    return [_md5int8(f"{x}#{j}") % 2001 - 1000 for j in range(dim)]


def _score(s: str, p: str, c: str) -> int:
    es, ep, ec = _emb(s), _emb(p), _emb(c)
    return sum(abs(a + b - d) for a, b, d in zip(es, ep, ec))


TRIPLES = [
    ("a:1", "p", "b:1"),
    ("a:1", "p", "b:2"),
    ("a:2", "p", "b:1"),
    ("a:2", "q", "b:3"),
    ("a:3", "p", "b:4"),
    ("b:1", "r", "a:1"),
]


def _expected_ranks_for(triples):
    ents = sorted({x for t in triples for x in (t[0], t[2])})
    true = set(triples)
    out = {}
    for s, p, o in triples:
        pool = [e for e in ents if e.split(":")[0] == o.split(":")[0]]
        cands = [c for c in pool if c == o or (s, p, c) not in true]
        ts = _score(s, p, o)
        out[(s, p, o)] = 1 + sum(
            1
            for c in cands
            if c != o
            and (_score(s, p, c) < ts or (_score(s, p, c) == ts and c < o))
        )
    return out


def test_transe_rank_eval_matches_local_reference(spark):
    from bran_spark.operators.kglearn import transe_rank_eval

    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    # test_sample_mod=1 => every triple is a test triple
    got = {
        r.pred: r.asDict()
        for r in transe_rank_eval(df, test_sample_mod=1).collect()
    }
    ranks = _expected_ranks_for(TRIPLES)
    by_pred: dict[str, list[int]] = {}
    for (s, p, o), rk in ranks.items():
        by_pred.setdefault(p, []).append(rk)
    assert set(got) == set(by_pred)
    for p, rks in by_pred.items():
        n = len(rks)
        assert got[p]["n_test"] == n
        assert got[p]["hits_at_k"] == round(sum(r <= 10 for r in rks) / n, 6)
        micro = sum(int(round(1_000_000.0 / r)) for r in rks)
        assert got[p]["mrr"] == pytest.approx(round(micro / (n * 1e6), 6))
        assert got[p]["mean_rank"] == round(sum(rks) / n, 2)


def test_transe_rank_eval_filtered_setting(spark):
    """A true alternative tail (s, p, o2) must NOT count against the rank
    of (s, p, o1) — the 'filtered' protocol. With one entity per score
    slot this is observable: make o2 the best-scoring candidate."""
    from bran_spark.operators.kglearn import transe_rank_eval

    # find two tails where score(s,p,o2) < score(s,p,o1)
    s, p = "a:1", "p"
    tails = [f"b:{i}" for i in range(6)]
    by_score = sorted(tails, key=lambda c: _score(s, p, c))
    best, worst = by_score[0], by_score[-1]
    trip = [(s, p, best), (s, p, worst)] + [
        ("z:9", p, c) for c in tails if c not in (best, worst)
    ]
    df = spark.createDataFrame(trip, "subj string, pred string, obj string")
    rows = transe_rank_eval(df, test_sample_mod=1).collect()
    # the worst tail's rank ignores `best` (filtered out as a true tail):
    # among the 4 remaining candidates all score better (they were picked
    # as the middle of the order) => rank = 5 unfiltered would be 6
    ranks = _expected_ranks_for(trip)
    assert ranks[(s, p, worst)] == 1 + sum(
        1
        for c in tails
        if c not in (best, worst) and _score(s, p, c) < _score(s, p, worst)
    )
    got = {r.pred: r for r in rows}
    n = len(trip)
    assert got[p].n_test == n
    assert got[p].mean_rank == round(sum(ranks.values()) / n, 2)


def test_feature_propagation_exact_and_hub_cut(spark):
    from bran_spark.operators.kglearn import feature_propagation

    f0 = lambda x: _md5int8(x) % 1000  # noqa: E731
    # hub m: in-degree 3, out-degree 2 => 6 > cap(4) => cut from 2-hop;
    # clean mid b: a -> b -> c
    edges = [
        ("x1", "m"), ("x2", "m"), ("x3", "m"),
        ("m", "y1"), ("m", "y2"),
        ("a", "b"), ("b", "c"),
    ]
    df = spark.createDataFrame(
        [(s, "e", d) for s, d in edges], "subj string, pred string, obj string"
    )
    got = {r.ent: r.asDict() for r in feature_propagation(df, hub_cap=4).collect()}

    # 1-hop means are unaffected by the hub cut
    assert got["m"]["in_deg"] == 3
    assert got["m"]["f1_mean"] == round(
        (f0("x1") + f0("x2") + f0("x3")) / 3, 6
    )
    assert got["y1"]["f1_mean"] == round(f0("m") / 1, 6)
    # 2-hop: c gets a's feature via mid b
    assert got["c"]["n_paths2"] == 1
    assert got["c"]["f2_mean"] == round(f0("a") / 1, 6)
    # y1/y2's only 2-hop paths run through the cut hub m => zero paths
    assert got["y1"]["n_paths2"] == 0 and got["y1"]["f2_mean"] is None
    assert got["y2"]["n_paths2"] == 0
    # with a generous cap the paths reappear
    got2 = {
        r.ent: r.asDict() for r in feature_propagation(df, hub_cap=100).collect()
    }
    assert got2["y1"]["n_paths2"] == 3
    assert got2["y1"]["f2_mean"] == round(
        (f0("x1") + f0("x2") + f0("x3")) / 3, 6
    )


def test_ntriples_export_escaping(spark):
    from bran_spark.operators.kgquality import ntriples_export

    trip = spark.createDataFrame(
        [("N:1", "in_region", "R:2")], "subj string, pred string, obj string"
    )
    labels = spark.createDataFrame(
        [("N:1", 'He said "hi" \\ bye')], "ent string, label string"
    )
    lines = {r.kind: r.line for r in ntriples_export(trip, labels).collect()}
    assert lines["triple"] == (
        "<http://kg.local/e/N%3A1> <http://kg.local/p/in_region> "
        "<http://kg.local/e/R%3A2> ."
    )
    assert lines["label"] == (
        "<http://kg.local/e/N%3A1> "
        "<http://www.w3.org/2000/01/rdf-schema#label> "
        '"He said \\"hi\\" \\\\ bye" .'
    )


def test_ntriples_export_injective_iri_and_control_chars(spark):
    from bran_spark.operators.kgquality import ntriples_export

    # 'a%3Ab' and 'a:b' must NOT collide: '%' is encoded first
    trip = spark.createDataFrame(
        [("a%3Ab", "p", "x"), ("a:b", "p", "x")],
        "subj string, pred string, obj string",
    )
    lines = [r.line for r in ntriples_export(trip).collect()]
    assert len(set(lines)) == 2
    assert any("a%253Ab" in ln for ln in lines)
    # control characters in labels are escaped, keeping one stmt per line
    labels = spark.createDataFrame(
        [("x", "line1\nline2\ttab\rcr")], "ent string, label string"
    )
    lbl = [r.line for r in ntriples_export(trip, labels).collect()
           if r.kind == "label"][0]
    assert "\n" not in lbl and "\t" not in lbl and "\r" not in lbl
    assert '"line1\\nline2\\ttab\\rcr"' in lbl
