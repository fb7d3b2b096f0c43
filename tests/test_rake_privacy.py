"""rake_keyphrases (quality.py) and l_diversity_audit (contracts.py):
local exact-reference checks (their registry twins re-check against
DuckDB at sf0.01)."""

from __future__ import annotations


def test_rake_keyphrases_hand_example(spark):
    from bran_spark.operators.quality import rake_keyphrases

    docs = [
        (1, "the fast hash join and the fast sort"),
        (2, "fast hash join of a slow scan"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r.phrase: r.asDict() for r in rake_keyphrases(df, top_n=10).collect()}

    # phrases: doc1 -> "fast hash join", "fast sort"; doc2 -> "fast hash
    # join", "slow scan". member stats over those occurrences:
    # fast: freq 3, deg 3+2+3 = 8 ; hash: freq 2, deg 6 ; join: freq 2,
    # deg 6 ; sort: freq 1, deg 2 ; slow/scan: freq 1, deg 2
    micro = lambda deg, freq: int(round(1_000_000.0 * deg / freq))  # noqa: E731
    s_fast, s_hash = micro(8, 3), micro(6, 2)
    assert got["fast hash join"]["score_micro"] == s_fast + 2 * s_hash
    assert got["fast hash join"]["n_occurrences"] == 2
    assert got["fast hash join"]["n_docs"] == 2
    assert got["fast sort"]["score_micro"] == s_fast + micro(2, 1)
    assert got["slow scan"]["score_micro"] == 2 * micro(2, 1)
    # top-N ordering: score desc, phrase asc
    ordered = sorted(
        got.values(), key=lambda d: (-d["score_micro"], d["phrase"])
    )
    assert [d["phrase"] for d in ordered][0] == "fast hash join"


def test_rake_stopword_only_and_empty_docs(spark):
    from bran_spark.operators.quality import rake_keyphrases

    df = spark.createDataFrame(
        [(1, "the of and"), (2, ""), (3, "solo")], "doc_id int, text string"
    )
    rows = rake_keyphrases(df, top_n=10).collect()
    assert [r.phrase for r in rows] == ["solo"]
    assert rows[0].score_micro == 1_000_000  # deg=1, freq=1


def test_l_diversity_audit(spark):
    from bran_spark.operators.contracts import l_diversity_audit

    # group A: 3 rows, 3 distinct secrets (diverse);
    # group B: 4 rows, 1 distinct secret (homogeneous — violates l=2)
    rows = [
        ("A", 1, "x"), ("A", 1, "y"), ("A", 1, "z"),
        ("B", 2, "s"), ("B", 2, "s"), ("B", 2, "s"), ("B", 2, "s"),
    ]
    df = spark.createDataFrame(rows, "qi1 string, qi2 int, secret string")
    got = l_diversity_audit(df, ["qi1", "qi2"], "secret", l_min=2).collect()[0]
    assert got.n_rows == 7 and got.n_groups == 2
    assert got.min_diversity == 1
    assert got.n_violating_groups == 1 and got.n_violating_rows == 4
    assert got.violating_share == round(4 / 7, 6)
    assert got.l_satisfied is False

    ok = l_diversity_audit(df, ["qi1", "qi2"], "secret", l_min=1).collect()[0]
    assert ok.l_satisfied is True and ok.n_violating_rows == 0
