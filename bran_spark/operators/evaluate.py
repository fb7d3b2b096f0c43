"""Evaluation: P/R/F1 + dev threshold sweep (SURVEY.md §2 J6, J7, A4, W2).

Reference parity: bran evaluates document-level CID predictions against the
BioCreative V gold set with micro precision/recall/F1 and tunes the decision
threshold on the dev split (paper §3.2; reference eval path — reconstructed,
SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEYS = ["doc_id", "chem_mesh", "dis_mesh"]


def confusion(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """J6/J7 -> A4 inputs. predicted/gold: rows keyed by KEYS.

    One row: (tp, fp, fn) — ONE action, ONE shuffle: union both sides with
    presence markers, groupBy the keys (this also dedups each side — no
    separate dropDuplicates shuffle), classify each key by which sides saw
    it. The previous inner+2×anti-join form launched three jobs whose fixed
    scheduling cost dominated at high core counts (eval was ~15s of the
    32-core wall at sf0.5; this form is ~2s and scales with the data)."""
    marked = predicted.select(
        *KEYS, F.lit(1).alias("_p"), F.lit(0).alias("_g")
    ).unionByName(gold.select(*KEYS, F.lit(0).alias("_p"), F.lit(1).alias("_g")))
    cells = (
        marked.groupBy(*KEYS)
        .agg(F.max("_p").alias("p"), F.max("_g").alias("g"))
        .agg(
            # coalesce: SUM over zero rows is NULL, which would sail past
            # the =0 guards below and surface precision/recall/f1 = NULL on
            # an empty pred+gold pair instead of 0.0
            F.coalesce(F.sum(F.col("p") * F.col("g")), F.lit(0)).alias("tp"),
            F.coalesce(F.sum(F.col("p") * (1 - F.col("g"))), F.lit(0)).alias("fp"),
            F.coalesce(F.sum((1 - F.col("p")) * F.col("g")), F.lit(0)).alias("fn"),
        )
    )
    return cells.selectExpr(
        "tp", "fp", "fn",
        # CAST: bare 0.0 literals parse as DecimalType in Spark SQL
        "CAST(CASE WHEN tp+fp = 0 THEN 0.0 ELSE tp/(tp+fp) END AS DOUBLE) AS precision",
        "CAST(CASE WHEN tp+fn = 0 THEN 0.0 ELSE tp/(tp+fn) END AS DOUBLE) AS recall",
        "CAST(CASE WHEN 2*tp+fp+fn = 0 THEN 0.0 ELSE 2.0*tp/(2*tp+fp+fn) END AS DOUBLE) AS f1",
    )


def sweep_threshold(
    labeled_scores: DataFrame, n_steps: int = 50, grid: list[float] | None = None
) -> DataFrame:
    """W2: pick θ* maximizing F1 over labeled pooled scores — fully
    relational (no driver loop): score range → θ grid (sequence/explode) →
    non-equi join-free counting via conditional aggregation per θ.

    Input: (pooled_score, label). Output: one row (theta, f1).
    ``grid``: explicit θ values (used by the oracle twin so both engines
    evaluate the identical grid); default derives a grid from min/max.
    """
    if grid is not None:
        thetas = labeled_scores.sparkSession.createDataFrame(
            [(float(t),) for t in grid], "theta double"
        )
    else:
        bounds = labeled_scores.agg(
            F.min("pooled_score").alias("lo"), F.max("pooled_score").alias("hi")
        )
        thetas = bounds.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {n_steps}), i -> lo + (hi - lo) * i / {n_steps})"
                )
            ).alias("theta")
        )
    # broadcast the tiny θ grid against the scores; conditional agg per θ
    j = labeled_scores.join(F.broadcast(thetas))
    perf = j.groupBy("theta").agg(
        F.sum(F.when((F.col("pooled_score") >= F.col("theta")) & (F.col("label") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("pooled_score") >= F.col("theta")) & (F.col("label") == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("pooled_score") < F.col("theta")) & (F.col("label") == 1), 1).otherwise(0)).alias("fn"),
    )
    scored = perf.withColumn(
        "f1",
        F.expr(
            "CAST(CASE WHEN 2*tp+fp+fn = 0 THEN 0.0 ELSE 2.0*tp/(2*tp+fp+fn) END AS DOUBLE)"
        ),
    )
    w = Window.orderBy(F.desc("f1"), F.asc("theta"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("theta", "f1")
    )


# inverse-CDF thresholds for Poisson(1): P(X<=n) as exact decimal literals
# shared verbatim with the SQL twin so both engines draw identical weights
POISSON1_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406)


def bootstrap_prf(
    per_doc: DataFrame,
    n_resamples: int = 20,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Poisson-bootstrap confidence distribution for micro P/R/F1 — the
    bootstrap that actually scales (Chamandy et al., Google 2012): instead
    of materializing B resampled corpora, each doc gets an independent
    Poisson(1) weight per resample, so one pass over (doc, tp, fp, fn)
    computes every resample's confusion totals. Weights are DETERMINISTIC:
    u = md5(doc:b)-derived uniform, inverted through the Poisson(1) CDF
    (exact shared decimal thresholds) — reruns and engines agree exactly,
    and a CI is auditable. One explode (B rows per doc, B small) + one
    aggregate; no corpus duplication. Input: per-doc (doc_id, tp, fp, fn).
    Returns (b, precision, recall, f1) rounded 6 dp, one row per resample.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(doc_col), F.col("b"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(len(POISSON1_CDF))
    for n in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[n]), F.lit(n)).otherwise(w)
    drawn = per_doc.select(
        F.col(doc_col),
        "tp",
        "fp",
        "fn",
        F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("b"),
    ).withColumn("w", w)
    agg = drawn.groupBy("b").agg(
        F.sum(F.col("w") * F.col("tp")).alias("tp"),
        F.sum(F.col("w") * F.col("fp")).alias("fp"),
        F.sum(F.col("w") * F.col("fn")).alias("fn"),
    )
    p = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fp"))
    )
    r = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fn"))
    )
    f1 = F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(0.0)).otherwise(
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    )
    return agg.select(
        F.col("b").cast("int").alias("b"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def confusion_by(
    predicted: DataFrame, gold: DataFrame, slice_col: str
) -> DataFrame:
    """Sliced evaluation: micro P/R/F1 per value of ``slice_col`` (one of
    the eval key columns, e.g. the chemical entity) — the per-entity /
    per-slice error breakdown that tells a KG builder WHICH entities the
    extractor fails on, where the corpus-level micro numbers (confusion)
    hide exactly that. Macro-averages are a trivial aggregate over the
    returned table.

    Same single union+marker shape as ``confusion``: one shuffle keyed by
    the eval keys builds the per-key cells (deduping both sides in the
    same pass), then a second aggregate — keyed by the slice, whose
    cardinality is dimension-scale — folds cells into slices. Returns
    (slice, tp, fp, fn, precision, recall, f1)."""
    if slice_col not in KEYS:
        raise ValueError(f"slice_col must be one of {KEYS}")
    marked = predicted.select(
        *KEYS, F.lit(1).alias("_p"), F.lit(0).alias("_g")
    ).unionByName(gold.select(*KEYS, F.lit(0).alias("_p"), F.lit(1).alias("_g")))
    cells = marked.groupBy(*KEYS).agg(
        F.max("_p").alias("p"), F.max("_g").alias("g")
    )
    per = cells.groupBy(F.col(slice_col).alias("slice")).agg(
        F.sum(F.col("p") * F.col("g")).cast("long").alias("tp"),
        F.sum(F.col("p") * (1 - F.col("g"))).cast("long").alias("fp"),
        F.sum((1 - F.col("p")) * F.col("g")).cast("long").alias("fn"),
    )
    return per.selectExpr(
        "slice", "tp", "fp", "fn",
        "CAST(CASE WHEN tp+fp = 0 THEN 0.0 ELSE tp/(tp+fp) END AS DOUBLE) AS precision",
        "CAST(CASE WHEN tp+fn = 0 THEN 0.0 ELSE tp/(tp+fn) END AS DOUBLE) AS recall",
        "CAST(CASE WHEN 2*tp+fp+fn = 0 THEN 0.0 ELSE 2.0*tp/(2*tp+fp+fn) END AS DOUBLE) AS f1",
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "s",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a sigmoid-calibrated scorer: map each
    raw score to p = sigmoid(score), bucket p into ``n_bins`` equal-width
    bins, and report per bin the count, mean predicted confidence, observed
    positive rate, and their absolute gap (the per-bin term of Expected
    Calibration Error). A KG-construction pipeline runs this on the dev
    split before picking an acceptance threshold — a scorer whose
    confidence 0.9 bucket is only 60% precise poisons every downstream
    triple consumer that treats the score as a probability.

    One counting aggregate over ``n_bins`` keys — shuffle-free in practice
    (partial aggregation collapses each partition to <= n_bins rows).
    Cross-engine hash safety: p is ROUND-ed to 6 decimals BEFORE the
    bin-edge floor (both engines then floor the identical double), and all
    reported means are ROUND-ed to 6 — the same idiom every threshold
    comparison in this repo uses.
    """
    p = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(score_col))), 6
    )
    binned = scored.withColumn(
        "bin",
        F.least(
            F.lit(n_bins - 1),
            F.greatest(F.lit(0), F.floor(p * n_bins).cast("int")),
        ).cast("int"),
    ).withColumn("_p", p)
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("_p"), 6).alias("avg_conf"),
            F.round(F.avg(F.col(label_col).cast("double")), 6).alias("frac_pos"),
        )
        .withColumn(
            "gap", F.round(F.abs(F.col("avg_conf") - F.col("frac_pos")), 6)
        )
    )


def blocking_quality(
    candidates: DataFrame, gold: DataFrame, n_records: int
) -> DataFrame:
    """Blocking/candidate-generation evaluation (the ER-survey standard
    triple): pair completeness PC = |C∩G|/|G| (recall of true matches),
    pairs quality PQ = |C∩G|/|C| (precision of the candidate set), and
    reduction ratio RR = 1 - |C|/(n·(n-1)/2) (how much of the quadratic
    comparison space blocking avoided). The gate that decides whether a
    blocking scheme (linking.blocking_pairs, dedup LSH bands) is safe to
    put in front of an expensive verify stage: PC is the bound on
    end-to-end recall, RR is the bound on cost.

    Inputs are (id_a, id_b) frames with id_a < id_b (both sides
    normalized defensively here). |C∩G| is one equi-join on the pair key
    — gold is match-scale (tiny vs the corpus) so Spark broadcasts it
    under AQE; counts are single-row aggregates. Returns one row
    (n_candidates, n_gold, n_hit, pc, pq, rr), ratios rounded 6 dp;
    PC/PQ are NULL when their denominator is empty (no gold / no
    candidates) rather than a misleading 0.
    """
    if n_records < 2:
        raise ValueError(f"n_records must be >= 2, got {n_records}")

    def norm(df: DataFrame) -> DataFrame:
        a, b = df.columns[0], df.columns[1]
        return df.select(
            F.least(F.col(a), F.col(b)).alias("id_a"),
            F.greatest(F.col(a), F.col(b)).alias("id_b"),
        ).distinct()

    c = norm(candidates)
    g = norm(gold)
    hit = c.join(g, ["id_a", "id_b"])
    nc = c.agg(F.count(F.lit(1)).alias("n_candidates"))
    ng = g.agg(F.count(F.lit(1)).alias("n_gold"))
    nh = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    total_pairs = float(n_records) * (n_records - 1) / 2.0
    return (
        nc.crossJoin(ng)
        .crossJoin(nh)
        .select(
            F.col("n_candidates").cast("long"),
            F.col("n_gold").cast("long"),
            F.col("n_hit").cast("long"),
            F.round(
                F.when(
                    F.col("n_gold") > 0, F.col("n_hit") / F.col("n_gold")
                ),
                6,
            ).alias("pc"),
            F.round(
                F.when(
                    F.col("n_candidates") > 0,
                    F.col("n_hit") / F.col("n_candidates"),
                ),
                6,
            ).alias("pq"),
            F.round(
                F.lit(1.0) - F.col("n_candidates") / F.lit(total_pairs), 6
            ).alias("rr"),
        )
    )


def mcnemar_compare(
    gold: DataFrame,
    pred_a: DataFrame,
    pred_b: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Paired extractor comparison on the gold set (McNemar's test with
    continuity correction): for each gold item, did extractor A / B
    recover it? The discordant cells decide whether A and B genuinely
    differ — two extractors with identical recall can still disagree on
    WHICH items they find, and aggregate P/R/F1 (q25) cannot see that.

      chi2 = (|b−c|−1)² / (b+c),  b = A-only hits, c = B-only hits
      (0 when b+c=0); significant_95 = chi2 > 3.841459 (χ²₁, α=0.05).

    One row out: (n_both, n_a_only, n_b_only, n_neither, chi2,
    significant_95). Two key-shuffle left joins from the gold side +
    one global aggregate — gold is the smallest of the three inputs, so
    this costs less than the evaluation joins q25 already does."""
    g = gold.select(*keys).distinct()
    a = pred_a.select(*keys).distinct().withColumn("_in_a", F.lit(1))
    b = pred_b.select(*keys).distinct().withColumn("_in_b", F.lit(1))
    j = g.join(a, keys, "left").join(b, keys, "left").select(
        F.col("_in_a").isNotNull().alias("ina"),
        F.col("_in_b").isNotNull().alias("inb"),
    )
    agg = j.agg(
        F.sum(F.when(F.col("ina") & F.col("inb"), 1).otherwise(0))
        .cast("long").alias("n_both"),
        F.sum(F.when(F.col("ina") & ~F.col("inb"), 1).otherwise(0))
        .cast("long").alias("n_a_only"),
        F.sum(F.when(~F.col("ina") & F.col("inb"), 1).otherwise(0))
        .cast("long").alias("n_b_only"),
        F.sum(F.when(~F.col("ina") & ~F.col("inb"), 1).otherwise(0))
        .cast("long").alias("n_neither"),
    )
    disc = F.col("n_a_only") + F.col("n_b_only")
    chi2 = F.when(disc > 0,
        F.round(
            F.pow(F.abs(F.col("n_a_only") - F.col("n_b_only")) - 1, 2) / disc,
            6,
        ),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_both", "n_a_only", "n_b_only", "n_neither",
        chi2.alias("chi2"),
        (chi2 > F.lit(3.841459)).alias("significant_95"),
    )


def cohens_kappa(
    a: DataFrame,
    b: DataFrame,
    universe: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Cohen's kappa between two binary raters over a closed item
    universe — chance-corrected agreement. McNemar (mcnemar_compare)
    asks "do A and B differ against GOLD"; kappa asks "how much do two
    raters agree beyond chance" with no gold at all — the
    annotation-quality / weak-supervision-consistency statistic:

      po = (n_yy + n_nn) / n
      pe = p_a·p_b + (1−p_a)·(1−p_b)
      kappa = (po − pe) / (1 − pe)    (NULL when pe = 1: both raters
                                       constant — kappa undefined)

    a / b are each rater's POSITIVE item sets; universe is the full
    item table (positives not in the universe are ignored — raters
    can't vote on items that don't exist). Two key-shuffle left joins +
    one global aggregate; exact integer cells, floats only in the 1-row
    formula, 6 dp. Output: (n_items, n_both_yes, n_both_no, po, pe,
    kappa)."""
    u = universe.select(*keys).distinct()
    ja = a.select(*keys).distinct().withColumn("_a", F.lit(1))
    jb = b.select(*keys).distinct().withColumn("_b", F.lit(1))
    j = (
        u.join(ja, keys, "left")
        .join(jb, keys, "left")
        .select(
            F.col("_a").isNotNull().alias("ya"),
            F.col("_b").isNotNull().alias("yb"),
        )
    )
    cells = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("ya") & F.col("yb"), 1).otherwise(0))
        .cast("long").alias("n_yy"),
        F.sum(F.when(~F.col("ya") & ~F.col("yb"), 1).otherwise(0))
        .cast("long").alias("n_nn"),
        F.sum(F.when(F.col("ya"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("yb"), 1).otherwise(0)).cast("long").alias("n_b"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n_yy") + F.col("n_nn")) / n
    pa = F.col("n_a") / n
    pb = F.col("n_b") / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    return cells.select(
        F.col("n").alias("n_items"),
        F.col("n_yy").alias("n_both_yes"),
        F.col("n_nn").alias("n_both_no"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.when(pe != 1.0, F.round((po - pe) / (1 - pe), 6)).alias("kappa"),
    )


def rank_agreement(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Kendall rank agreement between two top-k retrieval rankings —
    the system-comparison statistic a retrieval stack computes before
    swapping one ranker for another (BM25 vs query-likelihood, lexical
    vs ANN): high tau means the cheaper system can stand in for the
    expensive one; low tau means they surface genuinely different docs
    and fusion (rrf_fuse) is worth the cost.

    a / b are ALREADY-TRUNCATED (id, score) lists — dimension-scale by
    the same contract as rrf_fuse, so the rank windows and the pairwise
    self-join (k² rows) never touch corpus-scale data. Ranks derive
    from row_number over (rounded score desc, id), so no ties exist
    within a list and tau-a over the common items is exact integer
    math:

      tau = (n_conc − n_disc) / (m(m−1)/2)   over the m common docs
            (NULL when m < 2 — no pairs to compare)
      overlap = m / min(|a|, |b|)            (overlap@k)

    Output: 1 row (n_a, n_b, n_common, n_concordant, n_discordant,
    overlap, tau), floats 6 dp."""

    def ranked(r: DataFrame, rank_name: str) -> DataFrame:
        score_col = [c for c in r.columns if c != id_col][0]
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        return r.select(
            F.col(id_col).alias("id"),
            F.row_number().over(w).alias(rank_name),
        )

    ra = ranked(a, "ra")
    rb = ranked(b, "rb")
    common = ra.join(rb, "id")
    c1 = common.select(
        F.col("id").alias("id1"), F.col("ra").alias("ra1"), F.col("rb").alias("rb1")
    )
    c2 = common.select(
        F.col("id").alias("id2"), F.col("ra").alias("ra2"), F.col("rb").alias("rb2")
    )
    pairs = c1.join(c2, F.col("id1") < F.col("id2"))
    pair_cells = pairs.agg(
        F.sum(
            F.when(
                (F.col("ra1") - F.col("ra2")) * (F.col("rb1") - F.col("rb2")) > 0, 1
            ).otherwise(0)
        ).cast("long").alias("n_concordant"),
        F.sum(
            F.when(
                (F.col("ra1") - F.col("ra2")) * (F.col("rb1") - F.col("rb2")) < 0, 1
            ).otherwise(0)
        ).cast("long").alias("n_discordant"),
    )
    sizes = (
        ra.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
        .crossJoin(rb.agg(F.count(F.lit(1)).cast("long").alias("n_b")))
        .crossJoin(common.agg(F.count(F.lit(1)).cast("long").alias("n_common")))
    )
    m = F.col("n_common").cast("double")
    npairs = m * (m - 1) / 2
    return sizes.crossJoin(pair_cells).select(
        "n_a",
        "n_b",
        "n_common",
        F.coalesce("n_concordant", F.lit(0)).cast("long").alias("n_concordant"),
        F.coalesce("n_discordant", F.lit(0)).cast("long").alias("n_discordant"),
        F.when(
            F.least(F.col("n_a"), F.col("n_b")) > 0,
            F.round(m / F.least(F.col("n_a"), F.col("n_b")).cast("double"), 6),
        ).alias("overlap"),
        F.when(
            F.col("n_common") >= 2,
            F.round(
                (F.col("n_concordant") - F.col("n_discordant")) / npairs, 6
            ),
        ).alias("tau"),
    )


def ndcg_at_k(
    ranked: DataFrame,
    rels: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@k of a ranking against graded relevance (Järvelin &
    Kekäläinen, TOIS 2002) — the graded counterpart of the binary
    P/R/F1 eval surface (confusion/sweep_threshold): credit decays
    logarithmically with rank, so putting the best doc 9th instead of
    1st is penalized even though set-based recall cannot see it.

      DCG@k  = Σ_{r=1..k} (2^rel(d_r) − 1) / log2(r + 1)
      IDCG@k = the same sum over the k highest relevance grades in the
               CORPUS (the ideal reordering), so ndcg = dcg/idcg ∈ [0,1]
               (NULL when idcg = 0: no relevant docs exist anywhere).

    ``ranked`` = (id, score), already truncated upstream (top-k rows,
    dimension-scale — rank window legality as rrf_fuse); ``rels`` =
    (id, rel) integer grades over the corpus. IDCG needs only the k
    largest grades: an ORDER BY + LIMIT (TakeOrdered — never a full
    sort), then a k-row window. Docs missing from ``rels`` count as
    grade 0. Output: 1 row (dcg, idcg, ndcg), 6 dp."""
    score_col = [c for c in ranked.columns if c != id_col][0]
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    gains = (
        ranked.select(
            F.col(id_col).alias("id"), F.row_number().over(w).alias("r")
        )
        .where(F.col("r") <= k)
        .join(
            rels.select(F.col(id_col).alias("id"), F.col(rel_col).alias("rel")),
            "id",
            "left",
        )
        .select(
            (
                (F.pow(F.lit(2.0), F.coalesce("rel", F.lit(0)).cast("double")) - 1)
                / F.log2(F.col("r").cast("double") + 1)
            ).alias("g")
        )
    )
    dcg = gains.agg(F.sum("g").alias("dcg"))
    ideal = (
        rels.select(F.col(rel_col).alias("rel"))
        .orderBy(F.desc("rel"))
        .limit(k)
        .select(
            (
                (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1)
                / F.log2(
                    F.row_number().over(Window.orderBy(F.desc("rel"))).cast("double")
                    + 1
                )
            ).alias("g")
        )
        .agg(F.sum("g").alias("idcg"))
    )
    return dcg.crossJoin(ideal).select(
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.when(
            F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
        ).alias("ndcg"),
    )


def retrieval_metrics(
    ranked: DataFrame,
    rel: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Set-and-rank retrieval eval in one row — the binary companions of
    ndcg_at_k for a top-k ranking against a relevant-document set:

      p_at_k = |top-k ∩ rel| / k
      r_at_k = |top-k ∩ rel| / |rel|   (NULL when no relevant docs exist)
      mrr    = 1 / rank of the first relevant doc (0 if none in top-k)

    ``ranked`` = (id, score), already truncated upstream (dimension-scale
    rank-window legality as rrf_fuse); ``rel`` = relevant ids over the
    corpus — its size is one exact count. Output: (n_ranked, n_rel,
    n_hit, p_at_k, r_at_k, mrr), 6 dp."""
    score_col = [c for c in ranked.columns if c != id_col][0]
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    r = ranked.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)
    rl = rel.select(F.col(id_col).alias("id")).distinct()
    hits = r.join(rl, "id")
    cells = (
        r.agg(F.count(F.lit(1)).cast("long").alias("n_ranked"))
        .crossJoin(rl.agg(F.count(F.lit(1)).cast("long").alias("n_rel")))
        .crossJoin(
            hits.agg(
                F.count(F.lit(1)).cast("long").alias("n_hit"),
                F.min("rank").alias("first_rank"),
            )
        )
    )
    return cells.select(
        "n_ranked",
        "n_rel",
        "n_hit",
        F.round(F.col("n_hit") / F.lit(float(k)), 6).alias("p_at_k"),
        F.when(
            F.col("n_rel") > 0,
            F.round(F.col("n_hit") / F.col("n_rel").cast("double"), 6),
        ).alias("r_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("first_rank").cast("double"), F.lit(0.0)), 6
        ).alias("mrr"),
    )


def roc_auc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "s",
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney pair count with the standard
    tie correction — threshold-free ranking quality next to
    sweep_threshold's single-operating-point P/R/F1:

      AUC = (Σ_s n_pos(s)·n_neg(<s) + ½·n_pos(s)·n_neg(s)) / (P·N)

    computed on the SCORE-GROUPED table: one aggregate collapses the
    corpus to its distinct score values, the cumulative-negatives window
    runs over that score-distinct table (bounded by the score grid —
    deterministic scorers and calibration pipelines bin scores; bin
    first via calibration_bins if yours are continuous), and every cell
    stays an exact integer until the single final division (numerator
    doubled to keep the ½-tie term integral). Output: 1 row (n_pos,
    n_neg, auc), 6 dp; auc NULL when either class is empty."""
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("np"),
        F.sum(F.when(F.col(label_col) == 1, 0).otherwise(1))
        .cast("long")
        .alias("nn"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    per_s = g.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).alias("cum_neg"),
    ).select(
        "np",
        "nn",
        (2 * F.col("np") * F.col("cum_neg") + F.col("np") * F.col("nn")).alias(
            "num2"
        ),
    )
    return per_s.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum("num2").cast("long").alias("num2"),
    ).select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("num2")
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
    )


def conformal_coverage(
    calib: DataFrame,
    test: DataFrame,
    alpha: float = 0.1,
    score_col: str = "s",
) -> DataFrame:
    """Split-conformal coverage check (Vovk et al.; Angelopoulos & Bates
    2023 tutorial form): the calibration scores set a distribution-free
    threshold, and the test set verifies the guarantee empirically —
    the modern calibration audit next to the reliability diagram
    (calibration_bins):

      k   = ⌊α·(n_calib + 1)⌋
      τ   = k-th SMALLEST calibration score  (an order statistic of the
            multiset — tie order cannot change the value)
      coverage = P_test(score ≥ τ)           (≥ 1 − α in expectation
            under exchangeability)

    Degenerate calibration sets: when ⌊α·(n+1)⌋ = 0 (n < 1/α − 1) NO
    finite order statistic can honor the 1−α guarantee, so the audit
    reports k=0, τ=−∞ and full coverage (the predict-everything set)
    rather than silently clamping to the minimum score, which would
    deliver only n/(n+1) coverage while still printing `target`=1−α.

    The rank window runs over the CALIBRATION set only — calibration
    sets are sampled and bounded by design (hundreds to thousands), the
    same dimension-table legality as mmr_rerank; the test side is one
    broadcast-τ comparison + aggregate at any scale. Output: 1 row
    (n_calib, k, tau, n_test, n_covered, coverage, target), 6 dp."""
    n = calib.agg(F.count(F.lit(1)).cast("long").alias("n_calib"))
    ranked = (
        calib.select(F.col(score_col).alias("cs"))
        .withColumn("rn", F.row_number().over(Window.orderBy("cs")))
        .crossJoin(F.broadcast(n))
    )
    k_req = F.floor(F.lit(alpha) * (F.col("n_calib") + 1)).cast("long")
    tau = ranked.where(
        F.col("rn") == F.greatest(F.lit(1), k_req)
    ).select(
        "n_calib",
        F.when(k_req >= 1, F.col("rn").cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("k"),
        F.when(k_req >= 1, F.col("cs"))
        .otherwise(F.lit(float("-inf")))
        .alias("tau"),
    )
    cov = test.select(F.col(score_col).alias("ts")).crossJoin(
        F.broadcast(tau)
    ).agg(
        F.first("n_calib").alias("n_calib"),
        F.first("k").alias("k"),
        F.round(F.first("tau"), 6).alias("tau"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("ts") >= F.col("tau"), 1).otherwise(0))
        .cast("long")
        .alias("n_covered"),
    )
    return cov.select(
        "n_calib",
        "k",
        "tau",
        "n_test",
        "n_covered",
        F.round(F.col("n_covered") / F.col("n_test").cast("double"), 6).alias(
            "coverage"
        ),
        F.round(F.lit(1.0 - alpha), 6).alias("target"),
    )


def confident_joint(
    df: DataFrame,
    label_col: str = "label",
    prob_col: str = "p",
) -> DataFrame:
    """Confident-learning joint (Northcutt et al., JAIR 2021) for binary
    labels — the label-NOISE estimator behind dataset pruning: count
    examples whose predicted probability confidently indicates true
    class j while the given (possibly wrong) label says i. Off-diagonal
    mass is the estimated label-error budget; cleanlab-style pruning
    drops exactly those rows before training.

      t_j  = mean model probability of class j among rows LABELED j
      row counts toward (i, j) iff label = i, prob_j ≥ t_j
      (both classes confident → argmax; ties → class 1)

    Two passes: a 1-row threshold aggregate (broadcast back, rounded to
    6 dp so both engines compare against the identical literal) and one
    (label, est) count — each a plain corpus aggregate. Output: 4 rows
    (noisy_label, est_true, n, frac), frac over all confidently
    assigned rows, 6 dp."""
    p = F.col(prob_col).cast("double")
    lbl = F.col(label_col).cast("int")
    t = df.agg(
        F.round(F.avg(F.when(lbl == 1, p)), 6).alias("t1"),
        F.round(F.avg(F.when(lbl == 0, 1.0 - p)), 6).alias("t0"),
    )
    marked = df.crossJoin(F.broadcast(t)).select(
        lbl.alias("noisy_label"),
        F.when(
            (p >= F.col("t1")) & ((1.0 - p) >= F.col("t0")),
            F.when(p >= 1.0 - p, 1).otherwise(0),
        )
        .when(p >= F.col("t1"), 1)
        .when((1.0 - p) >= F.col("t0"), 0)
        .alias("est_true"),
    )
    counts = (
        marked.where(F.col("est_true").isNotNull())
        .groupBy("noisy_label", "est_true")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("double").alias("n_tot"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "noisy_label",
            F.col("est_true").cast("int").alias("est_true"),
            "n",
            F.round(F.col("n") / F.col("n_tot"), 6).alias("frac"),
        )
        .orderBy("noisy_label", "est_true")
    )


def isotonic_calibration(
    df: DataFrame,
    prob_col: str = "p",
    label_col: str = "label",
    n_bins: int = 20,
) -> DataFrame:
    """Isotonic (monotone) calibration of model scores — the
    nonparametric upgrade of calibration_bins' reliability diagram:
    fit the best monotone step function from score to empirical
    positive rate (Zadrozny & Elkan, KDD 2002; sklearn's
    IsotonicRegression). Downstream, scores are calibrated by joining
    against the returned bin mapping.

    Instead of the sequential pool-adjacent-violators sweep, this uses
    PAVA's MINIMAX characterization — iso(i) = max_{j≤i} min_{k≥i}
    weightedRate(j..k) — which is pure relational algebra: after ONE
    corpus-scale bin aggregate, everything operates on the n_bins-sized
    dimension (prefix sums via a single-partition window over ≤n_bins
    rows, a j≤i≤k triple join of O(n_bins³) tiny rows, two aggregates).
    Every rate is an exact integer ratio and min/max are order-free, so
    the fit is bit-stable across engines — no sequential state, no
    floats accumulating. Empty bins simply don't exist in the mapping
    (calibration is defined on observed bins; join semantics downstream
    decide interpolation). Output: (bin, n, n_pos, rate_raw, rate_iso),
    6 dp, ordered by bin; rate_iso is non-decreasing."""
    p = F.col(prob_col).cast("double")
    binned = df.select(
        F.least(
            F.lit(n_bins - 1), F.floor(p * n_bins).cast("int")
        ).alias("bin"),
        F.col(label_col).cast("long").alias("y"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = bins.select(
        "bin",
        "n",
        "n_pos",
        (F.sum("n").over(w) - F.col("n")).alias("cn0"),
        F.sum("n").over(w).alias("cn1"),
        (F.sum("n_pos").over(w) - F.col("n_pos")).alias("cp0"),
        F.sum("n_pos").over(w).alias("cp1"),
    )
    j = pref.select(
        F.col("bin").alias("jb"), F.col("cn0").alias("jcn0"),
        F.col("cp0").alias("jcp0"),
    )
    k = pref.select(
        F.col("bin").alias("kb"), F.col("cn1").alias("kcn1"),
        F.col("cp1").alias("kcp1"),
    )
    i = pref.select(F.col("bin").alias("ib"))
    trip = (
        j.join(k, F.col("jb") <= F.col("kb"))
        .join(i, (F.col("jb") <= F.col("ib")) & (F.col("ib") <= F.col("kb")))
        .select(
            "jb",
            "ib",
            (
                (F.col("kcp1") - F.col("jcp0")).cast("double")
                / (F.col("kcn1") - F.col("jcn0"))
            ).alias("avg"),
        )
    )
    iso = (
        trip.groupBy("jb", "ib")
        .agg(F.min("avg").alias("m"))
        .groupBy("ib")
        .agg(F.max("m").alias("rate_iso"))
    )
    return (
        bins.join(iso, bins["bin"] == iso["ib"])
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(F.col("n_pos") / F.col("n").cast("double"), 6).alias(
                "rate_raw"
            ),
            F.round("rate_iso", 6).alias("rate_iso"),
        )
        .orderBy("bin")
    )


def platt_scaling(
    df: DataFrame,
    score_col: str = "s",
    label_col: str = "label",
    iters: int = 3,
    s_scale: int = 10,
) -> DataFrame:
    """Platt scaling (Platt 1999) — the PARAMETRIC rung of the
    calibration ladder next to calibration_bins (diagnosis) and
    isotonic_calibration (nonparametric fit): fit p = sigma(a*s + b) by
    maximum likelihood so a raw triple-confidence score becomes a
    probability. Fit = ``iters`` fixed Newton-Raphson steps from
    (a,b) = (0,0); the 2x2 Hessian solve is closed-form.

    Distributed + engine-stable by the FS idiom: each step is ONE pass
    over the corpus in which every per-row gradient/Hessian term is
    micro-rounded to a BIGINT (pm = round(p*1e6), wm =
    round(p(1-p)*1e6)) BEFORE summation, so the sums are associative
    and bit-identical across partitionings and engines; the Newton
    update is a single fixed scalar tree over those integers. The score
    must be an exact decimal with ``1/s_scale`` resolution (s10 =
    round(s*s_scale) exact). Bounds: |Sum (y*1e6-pm)*s10| < 2^63 means
    n*|s10|*1e6 < 9e18 (n <= ~1e10 at |s| <= 10, 1 dp) — beyond that
    drop the micro scale to 1e3. A zero Hessian determinant (all-equal
    scores) leaves the params unchanged rather than dividing by zero.

    ``iters`` passes + 1 metric pass, each a map-side partial aggregate
    with a broadcast 1-row param join — no driver loop over data, no
    collect. Output: 1 row (n, n_pos, a 6dp, b 6dp, avg_p 6dp,
    log_loss 6dp with probabilities clamped to [1e-12, 1-1e-12])."""
    rows = df.select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("long").alias("_y"),
    )
    spark = df.sparkSession
    params = spark.range(1).select(
        F.lit(0.0).alias("a"), F.lit(0.0).alias("b")
    )

    def _p(j):
        z = F.col("a") * F.col("_s") + F.col("b")
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    for _ in range(int(iters)):
        j = rows.crossJoin(F.broadcast(params))
        pd_ = _p(j)
        pm = F.round(pd_ * 1000000.0, 0).cast("long")
        wm = F.round((pd_ * (F.lit(1.0) - pd_)) * 1000000.0, 0).cast("long")
        s10 = F.round(F.col("_s") * s_scale, 0).cast("long")
        agg = j.agg(
            F.max("a").alias("a_prev"),
            F.max("b").alias("b_prev"),
            F.sum(F.col("_y") * 1000000 - pm).cast("long").alias("gbm"),
            F.sum((F.col("_y") * 1000000 - pm) * s10)
            .cast("long")
            .alias("gam"),
            F.sum(wm).cast("long").alias("hbbm"),
            F.sum(wm * s10).cast("long").alias("habm"),
            F.sum(wm * s10 * s10).cast("long").alias("haam"),
        )
        ga = F.col("gam") / (1000000.0 * s_scale)
        gb = F.col("gbm") / 1000000.0
        haa = F.col("haam") / (1000000.0 * s_scale * s_scale)
        hab = F.col("habm") / (1000000.0 * s_scale)
        hbb = F.col("hbbm") / 1000000.0
        det = haa * hbb - hab * hab
        da = (hbb * ga - hab * gb) / det
        db = (haa * gb - hab * ga) / det
        params = agg.select(
            (
                F.col("a_prev")
                + F.when(det != F.lit(0.0), da).otherwise(F.lit(0.0))
            ).alias("a"),
            (
                F.col("b_prev")
                + F.when(det != F.lit(0.0), db).otherwise(F.lit(0.0))
            ).alias("b"),
        )
    j = rows.crossJoin(F.broadcast(params))
    pd_ = _p(j)
    pm = F.round(pd_ * 1000000.0, 0).cast("long")
    pc = F.least(F.greatest(pd_, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    ll = F.lit(0.0) - (
        F.col("_y") * F.log(pc) + (F.lit(1) - F.col("_y")) * F.log(F.lit(1.0) - pc)
    )
    llm = F.round(ll * 1000000.0, 0).cast("long")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.max("a").alias("_a"),
        F.max("b").alias("_b"),
        F.sum(pm).cast("long").alias("_spm"),
        F.sum(llm).cast("long").alias("_sllm"),
    ).select(
        "n",
        "n_pos",
        F.round(F.col("_a"), 6).alias("a"),
        F.round(F.col("_b"), 6).alias("b"),
        F.round(F.col("_spm") / (F.col("n") * 1000000.0), 6).alias("avg_p"),
        F.round(F.col("_sllm") / (F.col("n") * 1000000.0), 6).alias(
            "log_loss"
        ),
    )


def cmh_test(
    units: DataFrame,
    stratum_col: str = "stratum",
    exposure_col: str = "exposure",
    outcome_col: str = "outcome",
) -> DataFrame:
    """Cochran-Mantel-Haenszel test (Mantel & Haenszel 1959) — the
    stratified 2×2 association test an experiment platform reaches for
    when a binary outcome must be judged ACROSS confounding strata
    (country, device, cohort): pooling the tables naively invites
    Simpson's paradox; CMH combines per-stratum evidence

      z = Σ_k (a_k − E_k) / sqrt(Σ_k V_k),
      E_k = r1_k·c1_k / n_k,
      V_k = r1_k·r0_k·c1_k·c0_k / (n_k²·(n_k − 1))

    where a_k = exposed-and-positive count. Per-stratum E and V are
    micro-rounded to BIGINTs before the cross-strata sum (FS idiom —
    the only floats summed are exact integers ×10⁻⁶), so the statistic
    is one fixed scalar tree; the two-sided p uses the logistic
    normal-CDF approximation (see sampling.bh_fdr). Strata with n < 2
    are excluded (V undefined); ΣV = 0 yields NULL z.

    One stratum-keyed conditional aggregate over the corpus + a 1-row
    rollup. Output: 1 row (n_strata, n_units, sum_a, z 6 dp,
    p_micro)."""
    e = F.col("_e")
    y = F.col("_y")
    g = (
        units.select(
            F.col(stratum_col).alias("k"),
            F.col(exposure_col).cast("int").alias("_e"),
            F.col(outcome_col).cast("int").alias("_y"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when((e == 1) & (y == 1), 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(e == 1, 1).otherwise(0)).cast("long").alias("r1"),
            F.sum(F.when(y == 1, 1).otherwise(0)).cast("long").alias("c1"),
        )
        .where(F.col("n") > 1)
    )
    nd = F.col("n").cast("double")
    em = F.round(
        F.col("r1") * F.col("c1") * F.lit(1000000.0) / nd, 0
    ).cast("long")
    vm = F.round(
        F.col("r1").cast("double")
        * (F.col("n") - F.col("r1"))
        * F.col("c1")
        * (F.col("n") - F.col("c1"))
        * F.lit(1000000.0)
        / (nd * nd * (nd - 1.0)),
        0,
    ).cast("long")
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("n").cast("long").alias("n_units"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum(em).cast("long").alias("_sem"),
        F.sum(vm).cast("long").alias("_svm"),
    )
    z = F.round(
        F.when(
            F.col("_svm") > 0,
            (F.col("sum_a") - F.col("_sem") / 1000000.0)
            / F.sqrt(F.col("_svm") / 1000000.0),
        ),
        6,
    )
    p_micro = F.when(
        z.isNotNull(),
        F.round(2000000.0 / (1.0 + F.exp(1.702 * F.abs(z))), 0).cast("long"),
    ).otherwise(F.lit(1000000).cast("long"))
    return t.select(
        "n_strata", "n_units", "sum_a", z.alias("z"), p_micro.alias("p_micro")
    )


def chi_square_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Pearson chi-square test of independence for two categorical
    columns — the first question a datacard asks of (source × language),
    (split × label), (annotator × verdict): is the joint distribution a
    product of its margins? Expected counts include EMPTY cells (the
    margins cross join is dimension×dimension — tiny), each cell's
    (o−e)²/e term is micro-rounded to a BIGINT before summation, and
    the p-value maps the Wilson-Hilferty cube-root normal approximation
    of χ²_df through the logistic CDF (both monotone — ranking-safe).

    One (row,col)-keyed count (the contingency shuffle), two margin
    aggregates, a broadcast margins cross join. Output: 1 row (n, df,
    chi2 6 dp, z 6 dp, p_micro)."""
    # NULL is a category, not a hole: left un-coalesced, the join on
    # (r, c) never matches NULL keys, so NULL-category observations keep
    # their expected counts but lose their observed ones — every NULL
    # cell contributes a phantom (0−e)²/e and chi2 inflates
    cells = df.select(
        F.coalesce(F.col(row_col).cast("string"), F.lit("__null__")).alias(
            "r"
        ),
        F.coalesce(F.col(col_col).cast("string"), F.lit("__null__")).alias(
            "c"
        ),
    ).groupBy("r", "c").agg(F.count(F.lit(1)).cast("long").alias("o"))
    rm = cells.groupBy("r").agg(F.sum("o").cast("long").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("o").cast("long").alias("cn"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    full = (
        rm.crossJoin(F.broadcast(cm))
        .join(cells, ["r", "c"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(tot))
    )
    e_ = F.col("rn") * F.col("cn") / F.col("n").cast("double")
    term_m = F.round(
        (F.col("o") - e_) * (F.col("o") - e_) / e_ * 1000000.0, 0
    ).cast("long")
    agg = full.agg(
        F.max("n").cast("long").alias("n"),
        (
            (F.countDistinct("r") - 1) * (F.countDistinct("c") - 1)
        ).cast("long").alias("df"),
        F.sum(term_m).cast("long").alias("_stm"),
    )
    chi2 = F.col("_stm") / 1000000.0
    dfd = F.col("df").cast("double")
    # Wilson-Hilferty: (χ²/df)^(1/3) ≈ Normal(1 − 2/(9df), 2/(9df))
    z = F.round(
        F.when(
            F.col("df") > 0,
            (
                F.cbrt(chi2 / dfd)
                - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dfd))
            )
            / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dfd)),
        ),
        6,
    )
    # chi-square is an UPPER-tail test: p = 1 − Φ(z) on the SIGNED z
    # (logistic approximation), not the two-sided form
    p_micro = F.when(
        z.isNotNull(),
        F.round(1000000.0 / (1.0 + F.exp(1.702 * z)), 0).cast("long"),
    ).otherwise(F.lit(1000000).cast("long"))
    return agg.select(
        "n",
        "df",
        F.round(chi2, 6).alias("chi2"),
        z.alias("z"),
        p_micro.alias("p_micro"),
    )


def calibration_summary(
    df: DataFrame,
    prob_col: str = "p",
    label_col: str = "label",
    n_bins: int = 20,
) -> DataFrame:
    """Scalar calibration metrics — the numbers printed NEXT TO the
    reliability diagram (calibration_bins) and the fits (isotonic,
    Platt): ECE (expected calibration error — bin-weighted |accuracy −
    confidence|), MCE (the worst bin), the raw Brier score, and
    Murphy's (1973) binned decomposition reliability / resolution /
    uncertainty — the standard one-row verdict on whether a confidence
    score can be read as a probability.

    Exact arithmetic: probabilities micro-round ONCE per row (pm =
    round(p·10⁶) — exact when p has ≤6 dp), per-row Brier terms and
    per-bin |acc−conf| / squared-gap terms micro-round before the
    bin-weighted sums, so every metric is one fixed scalar tree over
    BIGINTs. One corpus-scale bin aggregate (map-side combine) + one
    n_bins-row rollup. Output: 1 row (n, n_bins_used, ece, mce, brier,
    reliability, resolution, uncertainty), 6 dp."""
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("long")
    rows = df.select(
        F.least(F.lit(n_bins - 1), F.floor(p * n_bins).cast("int")).alias(
            "bin"
        ),
        y.alias("y"),
        F.round(p * 1000000.0, 0).cast("long").alias("pm"),
        F.round((p - y) * (p - y) * 1000000.0, 0).cast("long").alias("bm"),
    )
    bins = rows.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("pm").cast("long").alias("spm"),
        F.sum("bm").cast("long").alias("sbm"),
    )
    acc = F.col("sy") / F.col("nb").cast("double")
    conf = F.col("spm") / (F.col("nb") * 1000000.0)
    gap_m = F.round(F.abs(acc - conf) * 1000000.0, 0).cast("long")
    sq_m = F.round((conf - acc) * (conf - acc) * 1000000.0, 0).cast("long")
    t = bins.agg(
        F.sum("nb").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum("sy").cast("long").alias("sy_all"),
        F.sum("sbm").cast("long").alias("sbm_all"),
        F.sum(F.col("nb") * gap_m).cast("long").alias("ece_m"),
        F.max(gap_m).cast("long").alias("mce_m"),
        F.sum(F.col("nb") * sq_m).cast("long").alias("rel_m"),
        # resolution needs ȳ, a global — carry Σ nb·round((acc)²·1e6)
        # and assemble (acc−ȳ)² = acc² − 2·acc·ȳ + ȳ² from exact parts
        F.sum(
            F.col("nb") * F.round(acc * acc * 1000000.0, 0).cast("long")
        )
        .cast("long")
        .alias("acc2_m"),
    )
    nd = F.col("n").cast("double")
    ybar = F.col("sy_all") / nd
    # Σ nb·(acc_b − ȳ)² = Σ nb·acc² − n·ȳ²  (since Σ nb·acc_b = Σ y)
    res = F.col("acc2_m") / (nd * 1000000.0) - ybar * ybar
    return t.select(
        "n",
        "n_bins_used",
        F.round(F.col("ece_m") / (nd * 1000000.0), 6).alias("ece"),
        F.round(F.col("mce_m") / 1000000.0, 6).alias("mce"),
        F.round(F.col("sbm_all") / (nd * 1000000.0), 6).alias("brier"),
        F.round(F.col("rel_m") / (nd * 1000000.0), 6).alias("reliability"),
        F.round(F.greatest(res, F.lit(0.0)), 6).alias("resolution"),
        F.round(ybar * (F.lit(1.0) - ybar), 6).alias("uncertainty"),
    )
