from __future__ import annotations

from bran_spark.operators.weaksup import (
    lf_stats,
    majority_vote,
    quality_lf_votes,
)


def _votes(spark):
    # item, lf1, lf2, lf3 — hand-picked to exercise every aggregation path
    return spark.createDataFrame(
        [
            ("a", 1, 1, 0),    # agree, one abstain -> label +1
            ("b", 1, -1, 0),   # tie -> label 0
            ("c", -1, -1, -1), # unanimous negative
            ("d", 0, 0, 0),    # all abstain -> label 0, n_votes 0
            ("e", 0, 0, 1),    # lone voter -> label +1, no overlap
        ],
        "id string, lf1 int, lf2 int, lf3 int",
    )


def test_majority_vote_labels_and_counts(spark):
    rows = {
        r.id: r
        for r in majority_vote(_votes(spark), "id", ["lf1", "lf2", "lf3"]).collect()
    }
    assert rows["a"].label == 1 and rows["a"].n_votes == 2
    assert rows["b"].label == 0 and rows["b"].n_votes == 2
    assert rows["c"].label == -1 and rows["c"].n_votes == 3
    assert rows["d"].label == 0 and rows["d"].n_votes == 0
    assert rows["e"].label == 1 and rows["e"].n_votes == 1


def test_lf_stats_coverage_overlap_conflict(spark):
    stats = {
        r.lf_name: r
        for r in lf_stats(_votes(spark), ["lf1", "lf2", "lf3"]).collect()
    }
    # lf1 votes on a,b,c (3/5); overlaps whenever it votes (a,b,c all have
    # another voter); conflicts only on b (lf2 disagrees)
    assert stats["lf1"].coverage == 0.6
    assert stats["lf1"].overlap == 0.6
    assert stats["lf1"].conflict == 0.2
    # lf3 votes on c,e; only c has co-voters; never conflicts
    assert stats["lf3"].coverage == 0.4
    assert stats["lf3"].overlap == 0.2
    assert stats["lf3"].conflict == 0.0
    assert all(r.n_items == 5 for r in stats.values())


def test_quality_lf_votes_thresholds(spark):
    docs = spark.createDataFrame(
        [
            ("long", " ".join(f"w{i}" for i in range(30))),  # 30 distinct words
            ("short", "just two"),                           # 2 words
            ("dupey", "spam spam spam spam spam ham"),       # dup_frac 4/6
            ("nums", "a1 22 333 4444"),                      # digit-heavy
        ],
        "doc_id string, text string",
    )
    v = {r.doc_id: r for r in quality_lf_votes(docs, "doc_id", "text").collect()}
    assert v["long"].lf_len == 1 and v["long"].lf_dup == 1
    assert v["short"].lf_len == -1 and v["short"].lf_digit == 1
    assert v["dupey"].lf_dup == -1
    assert v["nums"].lf_digit == -1


def test_fleiss_kappa_hand_worked_example(spark):
    import pytest

    from bran_spark.operators.weaksup import fleiss_kappa

    # item1: unanimous cat 1; item2: split 1/0/0.
    # S2 = 9+5 = 14, N*n = 6 -> p_bar = 8/12 = 2/3
    # totals: cat1=4, cat0=2 -> P_e = 20/36 = 5/9 -> kappa = 0.25
    df = spark.createDataFrame(
        [("i1", 1, 1, 1), ("i2", 1, 0, 0)],
        "item string, r1 int, r2 int, r3 int",
    )
    row = fleiss_kappa(df, "item", ["r1", "r2", "r3"]).head()
    assert row.n_items == 2 and row.n_raters == 3 and row.n_categories == 2
    assert abs(row.p_bar - 2 / 3) < 1e-6
    assert abs(row.p_e - 5 / 9) < 1e-6
    assert abs(row.kappa - 0.25) < 1e-6
    # one category ever used -> P_e = 1 -> kappa undefined (NULL), not 1
    uni = spark.createDataFrame(
        [("i1", 1, 1, 1), ("i2", 1, 1, 1)],
        "item string, r1 int, r2 int, r3 int",
    )
    row2 = fleiss_kappa(uni, "item", ["r1", "r2", "r3"]).head()
    assert row2.p_e == 1.0 and row2.kappa is None
    with pytest.raises(ValueError):
        fleiss_kappa(df, "item", ["r1"])
