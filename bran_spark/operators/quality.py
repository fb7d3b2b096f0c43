"""Repetition-based quality filters (Gopher-style, Rae et al. 2021 §A1.1):
the strongest cheap signal for machine-generated / boilerplate text that
length-and-stopword scoring (functions.text.quality_score) misses.

Per document:
- ``dup_word_frac``  — 1 − |distinct words| / |words|; pure array
  expressions inside the scan projection, no shuffle at all.
- ``top_bigram_frac`` — occurrences of the most frequent bigram / total
  bigrams; explode → two-phase aggregate. Partial aggregation map-side
  combines the (doc, bigram) counts before the exchange, so the shuffle
  carries at most one row per distinct (doc, bigram) — bounded by the doc's
  own length, never by corpus hot keys (the key is prefixed by doc_id, so
  no cross-doc skew exists by construction).

A training-data pipeline filters on thresholds downstream (e.g. Gopher
drops dup_word_frac > 0.3); emitting the raw fractions keeps the operator
composable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bran_spark.functions.text import words


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, n_words, dup_word_frac, top_bigram_frac) per document with
    at least 2 words (a single-word doc has no bigram — excluded, matching
    the SQL twin's inner join)."""
    wl = df.select(F.col(id_col).alias("doc_id"), words(text_col).alias("ws"))
    word_stats = wl.where(F.size("ws") >= 2).select(
        "doc_id",
        "ws",
        F.size("ws").cast("long").alias("n_words"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("ws")) / F.size("ws").cast("double"),
            6,
        ).alias("dup_word_frac"),
    )
    bigrams = word_stats.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at("ws", i + 1), F.element_at("ws", i + 2)
                ),
            )
        ).alias("bigram"),
    )
    top = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("c") / F.sum("c").cast("double"), 6).alias(
                "top_bigram_frac"
            )
        )
    )
    return word_stats.drop("ws").join(top, "doc_id")


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hot_words: int = 1000,
) -> DataFrame:
    """Unigram-LM quality score: mean ln p(w) per document under the
    corpus's own unigram distribution — the cheap perplexity-proxy filter
    of a pretraining pipeline (far-out-of-distribution and gibberish docs
    score low without running a neural LM). p(w) = corpus_count(w)/total.

    Scale shape: the token→frequency attach is a join on the WORD, which
    is maximally Zipf-skewed — the "the" partition of a naive shuffle join
    receives a constant fraction of the entire corpus. The hot path is
    split off explicitly: the top ``hot_words`` frequencies (a fixed tiny
    table) broadcast-join to their tokens with NO shuffle, and only the
    Zipf tail (bounded per-key by construction) takes the shuffle join;
    the two paths union before the per-doc aggregate. Frequencies are
    corpus-level, so the split changes the execution plan only, never the
    result. Returns (doc_id, n_tok, logprob) rounded 6dp."""
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").cast("double").alias("tot"))
    hot = freq.orderBy(F.desc("c"), F.asc("w")).limit(hot_words)
    tok_hot = tok.join(F.broadcast(hot), "w")
    tok_cold = tok.join(
        F.broadcast(hot.select("w")), "w", "left_anti"
    ).join(freq, "w")
    return (
        tok_hot.unionByName(tok_cold)
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.round(
                F.avg(F.log(F.col("c") / F.col("tot"))) + F.lit(1e-9), 6
            ).alias("logprob"),
        )
    )
