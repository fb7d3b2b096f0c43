"""Repetition quality signals: hand-computed fractions + edge cases."""

from bran_spark.operators.quality import repetition_stats


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),        # 5 words, 2 distinct; top bigram "a b" ×2 of 4
            (2, "x y z"),            # no repetition at all
            (3, "solo"),             # single word → excluded (no bigram)
            (4, "w w w w"),          # maximal repetition
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["n_words"] == 5
    assert rows[1]["dup_word_frac"] == 0.6          # 1 - 2/5
    assert rows[1]["top_bigram_frac"] == 0.5        # "a b" twice of 4 bigrams
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["top_bigram_frac"] == 0.5        # all bigrams unique: 1 of 2
    assert rows[4]["dup_word_frac"] == 0.75         # 1 - 1/4
    assert rows[4]["top_bigram_frac"] == 1.0        # "w w" is every bigram
