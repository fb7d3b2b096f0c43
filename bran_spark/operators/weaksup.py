"""Weak-supervision label aggregation (the Snorkel/data-programming
surface, Ratner et al., VLDB 2018) — how a training-data pipeline turns
cheap heuristic labeling functions (LFs) into silver labels at corpus
scale without a single human annotation. The reference corpus (bran) is
distantly supervised itself, so this is the same labeling regime one
abstraction up: LFs vote {-1, 0, +1} (0 = abstain), votes aggregate per
item, and per-LF diagnostics (coverage / overlap / conflict) tell you
which heuristic to fix next.

Scale shape: LF votes are pure column expressions evaluated in the scan
projection (shuffle-free, whole-stage codegen); majority_vote stays
per-row; lf_stats is ONE pass — the vote matrix explodes to n_items ×
n_lfs rows keyed by LF name (a handful of names → tiny groupBy state,
map-side combined).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def majority_vote(
    df: DataFrame, id_col: str, lf_cols: list[str]
) -> DataFrame:
    """Per-item silver label from LF votes: label = sign(Σ votes), 0 on
    a tie or when every LF abstains. Adds n_votes (non-abstain count)
    and keeps the individual votes for downstream reweighting. Pure
    row-local arithmetic — no shuffle."""
    total = sum((F.col(c) for c in lf_cols[1:]), F.col(lf_cols[0]))
    n_votes = sum(
        (F.when(F.col(c) != 0, 1).otherwise(0) for c in lf_cols[1:]),
        F.when(F.col(lf_cols[0]) != 0, 1).otherwise(0),
    )
    return df.select(
        id_col,
        *lf_cols,
        n_votes.cast("int").alias("n_votes"),
        F.signum(total).cast("int").alias("label"),
    )


def lf_stats(df: DataFrame, lf_cols: list[str]) -> DataFrame:
    """Per-LF diagnostics over the vote matrix (the Snorkel analysis
    triple):

      coverage = P(lf votes)                      — reach
      overlap  = P(lf votes AND ≥1 other votes)   — redundancy
      conflict = P(lf votes AND some other non-abstain vote disagrees)
                                                  — where denoising earns

    One corpus pass: each row explodes into one (lf_name, vote,
    other-context) record; the groupBy key space is |lf_cols|, so the
    aggregate state is a few rows regardless of corpus size. Output:
    (lf_name, n_items, coverage, overlap, conflict), 6 dp, ordered by
    lf_name."""
    if len(lf_cols) < 2:
        raise ValueError("lf_stats needs at least 2 labeling functions")
    per_lf = []
    for c in lf_cols:
        others = [o for o in lf_cols if o != c]
        any_other = sum(
            (F.when(F.col(o) != 0, 1).otherwise(0) for o in others[1:]),
            F.when(F.col(others[0]) != 0, 1).otherwise(0),
        ) > 0
        disagree = None
        for o in others:
            d = (F.col(o) != 0) & (F.col(o) != F.col(c))
            disagree = d if disagree is None else (disagree | d)
        per_lf.append(
            F.struct(
                F.lit(c).alias("lf_name"),
                (F.col(c) != 0).alias("voted"),
                ((F.col(c) != 0) & any_other).alias("overlapped"),
                ((F.col(c) != 0) & disagree).alias("conflicted"),
            )
        )
    exploded = df.select(
        F.explode(F.array(*per_lf)).alias("r")
    ).select("r.*")
    return (
        exploded.groupBy("lf_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.avg(F.col("voted").cast("double")), 6).alias("coverage"),
            F.round(F.avg(F.col("overlapped").cast("double")), 6).alias(
                "overlap"
            ),
            F.round(F.avg(F.col("conflicted").cast("double")), 6).alias(
                "conflict"
            ),
        )
        .orderBy("lf_name")
    )


def quality_lf_votes(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Three deterministic document-quality LFs — the concrete vote
    matrix q183/q184 aggregate (each is a scan-projection expression,
    the whole matrix costs one pass):

      lf_len:   +1 if ≥ 30 words, −1 if < 5, else abstain
      lf_dup:   +1 if duplicate-word fraction < 0.1, −1 if > 0.4
      lf_digit: +1 if the text has no digits, −1 if digits are > 20%
                of its characters
    """
    from bran_spark.functions.text import words

    ws = words(text_col)
    n_words = F.size(ws)
    dup_frac = 1 - F.size(F.array_distinct(ws)) / n_words.cast("double")
    digits = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    digit_frac = digits / F.greatest(F.length(text_col), F.lit(1)).cast(
        "double"
    )
    return docs.select(
        F.col(id_col),
        F.when(n_words >= 30, 1)
        .when(n_words < 5, -1)
        .otherwise(0)
        .cast("int")
        .alias("lf_len"),
        F.when(dup_frac < 0.1, 1)
        .when(dup_frac > 0.4, -1)
        .otherwise(0)
        .cast("int")
        .alias("lf_dup"),
        F.when(digits == 0, 1)
        .when(digit_frac > 0.2, -1)
        .otherwise(0)
        .cast("int")
        .alias("lf_digit"),
    )


def fleiss_kappa(
    df: DataFrame, item_col: str, rater_cols: list[str]
) -> DataFrame:
    """Fleiss' κ (Fleiss 1971) — chance-corrected agreement for MANY
    raters at once, the multi-rater generalization cohens_kappa can't
    cover: here the raters are labeling functions, so this is the
    one-number answer to "do the LFs agree more than chance?" that
    lf_stats' pairwise overlap/conflict table approximates.

      n_ij = raters assigning category j to item i   (n = |raters|)
      P̄   = (Σ_ij n_ij² − N·n) / (N·n·(n−1))
      P_e  = Σ_j (Σ_i n_ij / (N·n))²
      κ    = (P̄ − P_e) / (1 − P_e)

    Everything reduces to THREE exact integers — Σn_ij², the per-
    category totals' Σt_j², and N — so κ is one fixed scalar tree over
    associative integer sums: bit-equal across engines, no float
    accumulation anywhere. Plan: one explode (n rows per item), one
    (item, cat) count, two tiny rollups broadcast together. items must
    be unique in ``item_col``. NULL votes (the standard LF abstain
    encoding) are DROPPED, never counted as a category; Fleiss' formula
    requires every item fully rated, so if any vote was NULL the rating
    matrix is incomplete and κ is NULL (use Krippendorff's α for
    missing-data designs — silently scoring joint abstention as
    agreement is the failure mode this guard exists for). Output: 1 row
    (n_items, n_raters, n_categories, p_bar, p_e, kappa), 6 dp; κ is
    also NULL when P_e = 1 (a single category ever used — agreement is
    undefined, not 1)."""
    n = len(rater_cols)
    if n < 2:
        raise ValueError("fleiss_kappa needs at least 2 raters")
    long = df.select(
        F.col(item_col).alias("item"),
        F.explode(F.array(*[F.col(c) for c in rater_cols])).alias("cat"),
    ).where(F.col("cat").isNotNull())
    nij = long.groupBy("item", "cat").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    s2 = nij.agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        F.countDistinct("item").cast("long").alias("n_items"),
        F.sum("c").cast("long").alias("tot_votes"),
    )
    cat_tot = nij.groupBy("cat").agg(F.sum("c").cast("long").alias("t"))
    st2 = cat_tot.agg(
        F.sum(F.col("t") * F.col("t")).cast("long").alias("st2"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
    )
    g = s2.crossJoin(F.broadcast(st2))
    nn = F.col("n_items").cast("double") * n
    p_bar = (F.col("s2") - F.col("n_items") * n) / (nn * (n - 1))
    p_e = F.col("st2") / (nn * nn)
    complete = F.col("tot_votes") == F.col("n_items") * n
    return g.select(
        "n_items",
        F.lit(n).cast("long").alias("n_raters"),
        "n_categories",
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round(
            F.when(complete & (p_e != 1.0), (p_bar - p_e) / (1.0 - p_e)), 6
        ).alias("kappa"),
    )
