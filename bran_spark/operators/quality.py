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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bran_spark.functions.text import STOPWORDS, words


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


def mix_divergence(
    a: DataFrame, b: DataFrame, group_col: str, alpha: float = 0.5
) -> DataFrame:
    """Domain-mix drift between two corpus snapshots: per-group smoothed
    shares plus pointwise KL and Jensen-Shannon terms — the monitor a
    pretraining pipeline runs when a new crawl lands (did the source /
    language / domain mixture move?). Totals are SUM over the returned
    dimension-scale table: KL(a‖b) = Σ kl_ab_term, JS = Σ js_term.

    Additive-α smoothing over the UNION group set keeps every term
    finite when a group exists in only one snapshot (exactly the case
    drift detection is for). Scale shape: two group-count aggregates
    (map-side combined), a full-outer merge of two dimension-scale
    tables, and one 1-row totals broadcast — the corpora are each
    scanned once, nothing corpus-scale shuffles. Returns
    (g, p_a, p_b, kl_ab_term, kl_ba_term, js_term), rounded 6dp."""
    ca = a.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("double").alias("n_a")
    )
    cb = b.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("double").alias("n_b")
    )
    merged = ca.join(cb, "g", "full_outer").select(
        "g",
        F.coalesce("n_a", F.lit(0.0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0.0)).alias("n_b"),
    )
    tots = merged.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n_a").alias("tot_a"),
        F.sum("n_b").alias("tot_b"),
    )
    al = F.lit(float(alpha))
    p = (F.col("n_a") + al) / (F.col("tot_a") + al * F.col("k"))
    q = (F.col("n_b") + al) / (F.col("tot_b") + al * F.col("k"))
    m = (p + q) / 2
    return merged.crossJoin(F.broadcast(tots)).select(
        "g",
        F.round(p, 6).alias("p_a"),
        F.round(q, 6).alias("p_b"),
        F.round(p * F.log(p / q) + F.lit(1e-9), 6).alias("kl_ab_term"),
        F.round(q * F.log(q / p) + F.lit(1e-9), 6).alias("kl_ba_term"),
        F.round(
            (p * F.log(p / m) + q * F.log(q / m)) / 2 + F.lit(1e-9), 6
        ).alias("js_term"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.1,
    hot_bigrams: int = 1000,
) -> DataFrame:
    """Bigram-LM quality score: mean ln p(w₂|w₁) per document under the
    corpus's own add-α bigram model, p(w₂|w₁) = (c(w₁w₂)+α)/(c(w₁·)+α·V)
    — the next step up from the unigram perplexity proxy
    (``unigram_logprob``), in the spirit of CCNet's LM-based quality
    bucketing (Wenzek et al. 2020): repetitive or shuffled-word docs
    score low even when their unigram mix looks normal.

    Scale shape: c(w₁w₂) and c(w₁·) are both aggregates with map-side
    combine; the conditional-probability table is assembled by joining
    the two DIMENSION-scale count tables on w₁ (never the token stream
    on the Zipf-skewed first word). The corpus bigram stream then joins
    the probability table once on the composite (w₁,w₂) key — far flatter
    than any single-word key — with the top ``hot_bigrams`` entries split
    onto a broadcast join exactly like unigram_logprob's hot path.
    Docs with fewer than 2 words have no bigram and are excluded (same
    contract as repetition_stats). Returns (doc_id, n_bigram, logprob)."""
    wl = df.select(F.col(id_col).alias("doc_id"), words(text_col).alias("ws"))
    big = wl.where(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 2),
                lambda i: F.struct(
                    F.element_at("ws", i + 1).alias("w1"),
                    F.element_at("ws", i + 2).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab_n = df.select(
        F.explode(words(text_col)).alias("w")
    ).agg(F.countDistinct("w").cast("double").alias("v"))
    probs = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "w1",
            "w2",
            "c12",
            F.log(
                (F.col("c12") + F.lit(float(alpha)))
                / (F.col("c1") + F.lit(float(alpha)) * F.col("v"))
            ).alias("lp"),
        )
    )
    hot = (
        probs.orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
        .limit(hot_bigrams)
        .select("w1", "w2", "lp")
    )
    big_hot = big.join(F.broadcast(hot), ["w1", "w2"])
    big_cold = big.join(
        F.broadcast(hot.select("w1", "w2")), ["w1", "w2"], "left_anti"
    ).join(probs.select("w1", "w2", "lp"), ["w1", "w2"])
    return (
        big_hot.unionByName(big_cold)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigram"),
            F.round(F.avg("lp") + F.lit(1e-9), 6).alias("logprob"),
        )
    )


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy of the word distribution, plus the
    length-normalized form H/ln(n_distinct) ∈ [0,1] — the diversity
    signal repetition fractions miss: a doc can have a low dup_word_frac
    (many distinct words) while its probability mass still collapses
    onto a few tokens (template text, keyword stuffing). Low normalized
    entropy flags exactly that.

    One (doc, word) counting aggregate — the key is doc-prefixed, so no
    cross-doc hot word exists by construction — then a per-doc fold.
    Single-word docs define norm_entropy = 0 (ln 1 = 0 guard). Returns
    (doc_id, n_tok, n_distinct, entropy, norm_entropy) rounded 6dp."""
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("w")
    )
    cnt = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    per = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (
            -F.sum(F.col("c") * F.log(F.col("c")))
        ).alias("_sclogc"),
    )
    h = F.log(F.col("n_tok").cast("double")) + F.col("_sclogc") / F.col("n_tok")
    return per.select(
        "doc_id",
        "n_tok",
        "n_distinct",
        F.round(h + F.lit(1e-9), 6).alias("entropy"),
        F.round(
            F.when(F.col("n_distinct") > 1, h / F.log(F.col("n_distinct").cast("double")))
            .otherwise(F.lit(0.0))
            + F.lit(1e-9),
            6,
        ).alias("norm_entropy"),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    alpha: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two snapshots of a continuous
    signal (score, doc length, price): fixed-width bins over [lo, hi),
    values outside clamp into the edge bins, per-bin smoothed shares and
    the PSI contribution (p_ref - p_cur)·ln(p_ref/p_cur). Total PSI is
    SUM(psi_term) over the returned n_bins-row table (rule of thumb:
    <0.1 stable, >0.25 action). The continuous-valued sibling of
    mix_divergence — drift monitors need both.

    Bins are FIXED-WIDTH from explicit bounds, not quantiles: the bin of
    a value never depends on the rest of the data, so the metric is
    deterministic, replayable cross-engine, and two snapshots bin
    identically (quantile bins would move with the data being tested —
    at 10^12 rows an approx-quantile pass would also cost a second scan).
    NULL values are dropped. Scale: one map-side-combined n_bins-card
    aggregate per snapshot, a bin-spine outer merge, one 1-row totals
    broadcast — each corpus scanned exactly once.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / n_bins

    def binned(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = F.least(
            F.greatest(
                F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)
            ),
            F.lit(n_bins - 1),
        )
        return (
            df.where(v.isNotNull())
            .groupBy(b.cast("int").alias("bin"))
            .agg(F.count(F.lit(1)).cast("double").alias(out))
        )

    spark = ref.sparkSession
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    merged = (
        spine.join(binned(ref, "n_ref"), "bin", "left")
        .join(binned(cur, "n_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0.0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0.0)).alias("n_cur"),
        )
    )
    tots = merged.agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    al = F.lit(float(alpha))
    k = F.lit(float(n_bins))
    p = (F.col("n_ref") + al) / (F.col("tot_ref") + al * k)
    q = (F.col("n_cur") + al) / (F.col("tot_cur") + al * k)
    return merged.crossJoin(F.broadcast(tots)).select(
        "bin",
        F.round(F.lit(lo) + F.lit(width) * F.col("bin"), 6).alias("bin_lo"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        F.round((p - q) * F.log(p / q) + F.lit(1e-9), 6).alias("psi_term"),
    )


def woe_iv(
    df: DataFrame,
    value_col: str,
    label_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    alpha: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence binning + information value — psi_drift's
    SUPERVISED sibling: instead of comparing two snapshots of one
    signal, compare the positive- and negative-label distributions of
    one signal in the same snapshot. Per fixed-width bin over [lo, hi)
    (edge-clamped, same determinism argument as psi_drift — quantile
    bins would move with the data):

      woe = ln(share_pos / share_neg)      (alpha-smoothed shares)
      iv_term = (share_pos − share_neg)·woe

    Total IV = SUM(iv_term) grades the signal as a label separator
    (rule of thumb: <0.02 useless, >0.3 strong) — the feature-audit
    step before any quality score is trusted to gate a corpus. NULL
    values and NULL labels are dropped.

    Scale: ONE map-side-combined n_bins-card aggregate (conditional
    sums carry both classes in one pass — half psi_drift's scans), a
    bin-spine outer merge, one 1-row totals broadcast."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    lbl = F.col(label_col)
    b = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    )
    counts = (
        df.where(v.isNotNull() & lbl.isNotNull())
        .groupBy(b.cast("int").alias("bin"))
        .agg(
            F.sum(F.when(lbl, 1).otherwise(0)).cast("double").alias("n_pos"),
            F.sum(F.when(~lbl, 1).otherwise(0)).cast("double").alias("n_neg"),
        )
    )
    spark = df.sparkSession
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    merged = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("n_pos", F.lit(0.0)).alias("n_pos"),
        F.coalesce("n_neg", F.lit(0.0)).alias("n_neg"),
    )
    tots = merged.agg(
        F.sum("n_pos").alias("tot_pos"), F.sum("n_neg").alias("tot_neg")
    )
    al = F.lit(float(alpha))
    k = F.lit(float(n_bins))
    g = (F.col("n_pos") + al) / (F.col("tot_pos") + al * k)
    bd = (F.col("n_neg") + al) / (F.col("tot_neg") + al * k)
    return merged.crossJoin(F.broadcast(tots)).select(
        "bin",
        F.round(F.lit(lo) + F.lit(width) * F.col("bin"), 6).alias("bin_lo"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(F.log(g / bd), 6).alias("woe"),
        F.round((g - bd) * F.log(g / bd), 6).alias("iv_term"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: OLS slope of ln(freq) on
    ln(rank) for the top_n terms (rank = frequency order, ties by term).
    Natural corpora sit near slope −1; a corpus drifting toward 0 is
    template/boilerplate-heavy, one plunging far below −1 has a
    vocabulary collapsed onto a few tokens — either way a feed-quality
    alarm from ONE corpus scan. Output 1 row: (n_terms, slope,
    intercept), 6 dp.

    One term-count aggregate (map-side combined), a top_n TakeOrdered
    cut, then the closed-form OLS sums over the top_n-row table — the
    regression input is bounded at any corpus size, so the fit itself
    is driver-free constant work."""
    tf = (
        docs.select(F.explode(words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("freq"))
        .orderBy(F.desc("freq"), "term")
        .limit(top_n)
    )
    ranked = tf.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.desc("freq"), "term")),
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log("freq").alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


def diversity_profile(df: DataFrame, group_col: str) -> DataFrame:
    """Corpus-mix concentration in one row — the diversity numbers a
    pretraining-mix owner watches next to psi_drift's two-snapshot
    comparison (is the corpus quietly collapsing onto one source?):

      n_groups      — distinct sources
      top_share     — max_i p_i (head concentration)
      shannon_h     — −Σ p ln p
      eff_shannon   — exp(H), Hill number q=1 ("effective sources",
                      equals n_groups only under a uniform mix)
      gini_simpson  — 1 − Σ p², the collision-probability complement
      eff_simpson   — 1/Σ p², Hill number q=2 (head-weighted)

    Two tiny aggregates: per-group counts (map-side combined; group
    cardinality = number of sources, dimension-scale), then the one-row
    reduction. Floats appear only in the final |groups|-term sums, 6 dp."""
    counts = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("c")
    )
    total = df.agg(F.count(F.lit(1)).cast("double").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(p.alias("p"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.round(F.max("p"), 6).alias("top_share"),
            F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("shannon_h"),
            F.round(F.exp(-F.sum(F.col("p") * F.log("p"))), 6).alias(
                "eff_shannon"
            ),
            F.round(1 - F.sum(F.col("p") * F.col("p")), 6).alias(
                "gini_simpson"
            ),
            F.round(1 / F.sum(F.col("p") * F.col("p")), 6).alias(
                "eff_simpson"
            ),
        )
    )


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between two groups'
    value distributions — the sup-norm drift test next to psi_drift's
    binned divergence (KS needs no bin choice and catches shape shifts
    PSI's fixed bins can smear):

      D = max over observed values v of |F_a(v) − F_b(v)|

    Plan: per-group value counts (one aggregate), full-outer merge on
    the value grid, cumulative counts via a window ORDER BY value, one
    max. Integers until the two ECDF divisions. The window runs over
    the DISTINCT-value grid — for continuous corpus-scale values,
    quantize first (the same move calibration_bins makes) or lift the
    cumsum onto packing.pack_token_bins' two-phase distributed prefix
    sum; the statistic is exact either way on the grid it sees.
    Output: 1 row (n_a, n_b, ks_d), 6 dp."""
    a = (
        df.where(F.col(group_col) == group_a)
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        df.where(F.col(group_col) == group_b)
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    merged = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = merged.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            # ANSI mode: double/0 ABORTS the job, so an absent group must
            # short-circuit to NULL (→ NULL ks_d), matching the sibling
            # stat operators' degenerate-denominator convention
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.abs(
                    F.col("cum_a") / F.col("n_a").cast("double")
                    - F.col("cum_b") / F.col("n_b").cast("double")
                ),
            ).alias("d"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.round(F.max("d"), 6).alias("ks_d"))
    )


def vocab_saturation(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Vocabulary-saturation audit via Good-Turing unseen mass — the
    one-row answer to "does more data still buy new tokens?" that a
    corpus-growth decision actually turns on:

      unseen_mass = V1 / N   (Good-Turing estimate of the probability
                              the NEXT token is a never-seen type)
      herdan_c    = ln V / ln N   (Heaps/Herdan growth exponent; stable
                              C < 1 means vocabulary still growing
                              polynomially, C falling means saturation)

    Two aggregates over the term-frequency table (term keys, map-side
    combined; the frequency-of-frequencies reduction state is tiny).
    Output: (n_tokens, vocab, n_singletons, unseen_mass, herdan_c),
    6 dp."""
    tf = (
        df.select(F.explode(words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return tf.agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_singletons"),
    ).select(
        "n_tokens",
        "vocab",
        "n_singletons",
        F.round(
            F.col("n_singletons") / F.col("n_tokens").cast("double"), 6
        ).alias("unseen_mass"),
        F.round(
            F.log(F.col("vocab").cast("double"))
            / F.log(F.col("n_tokens").cast("double")),
            6,
        ).alias("herdan_c"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """Within-group quantile normalization of a score — the move that
    makes quality thresholds comparable ACROSS sources (a fixed global
    cutoff keeps 90% of Wikipedia and 2% of CommonCrawl; a per-source
    quantile keeps the same fraction of each):

      q = percent_rank of the score within its group
          (ties share a rank, so equal scores get equal quantiles —
           no tie-break needed and none used)

    One window per group partition: at corpus scale each source sorts
    independently (partition-parallel); a single mega-source is the
    known skew case — range-partition that source's sort or pre-bin the
    score. Output: (id, group, score, q), 6 dp."""
    w = Window.partitionBy(group_col).orderBy(score_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(score_col).alias("score"),
        F.round(F.percent_rank().over(w), 6).alias("q"),
    )


def readability_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch-style reading-ease per document — the classic quality
    dimension next to the length/punctuation/stopword gates: very high
    scores flag listicle/keyword-stuffed text, very low ones flag
    boilerplate legalese; both are curation cut candidates.

      ease = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Syllables use the standard vowel-GROUP proxy (runs of [aeiouy]),
    sentences the terminal-punctuation count (min 1) — both stated
    approximations, both pure regexp counts, so the whole score is a
    scan projection: no shuffle, no UDF, identical expression tree in
    the twin. Words split on ANY whitespace (multi-line web docs would
    merge tokens under a space-only split). Output: (doc_id, n_words,
    n_sentences, n_syllables, ease), 6 dp; ease is NULL for empty/
    whitespace-only docs (a score for no text is noise, not 121.2)."""
    lower = F.lower(F.col(text_col))
    n_words = F.size(
        F.filter(F.split(lower, r"\s+"), lambda w: w != "")
    )
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(lower, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    n_syll = F.greatest(
        F.size(F.regexp_extract_all(lower, F.lit(r"[aeiouy]+"), F.lit(0))),
        F.lit(1),
    )
    ease = (
        F.lit(206.835)
        - 1.015 * (n_words.cast("double") / n_sent.cast("double"))
        - 84.6 * (n_syll.cast("double") / n_words.cast("double"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(F.when(n_words > 0, ease), 6).alias("ease"),
    ).orderBy("doc_id")


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 10,
    min_chars: int = 10,
) -> DataFrame:
    """Cross-document boilerplate census: lines (newline-split, trimmed)
    that recur in ≥ ``min_df`` DISTINCT documents — cookie banners,
    nav bars, license footers — the single highest-yield web-corpus
    cleanup after dedup (CCNet/RefinedWeb both ship a variant). Short
    lines below ``min_chars`` are ignored (punctuation/bullets would
    swamp the table).

    One explode + one (line)-keyed distinct-doc count — the same
    shuffle shape as exact dedup, on lines instead of docs. Output:
    (line, df) for flagged lines, hottest first (df desc, line asc)."""
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    ).select("doc_id", F.trim(F.col("raw")).alias("line"))
    return (
        lines.where(F.length("line") >= min_chars)
        .groupBy("line")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.asc("line"))
    )


def strip_boilerplate(
    docs: DataFrame,
    flagged: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite pass paired with boilerplate_lines: drop every flagged
    line from every document and rejoin with newlines — as a PURE SCAN
    PROJECTION. The flagged table is boilerplate-dimension-sized by
    construction (lines recurring across ≥min_df docs), so it collapses
    to ONE broadcast array and each doc filters its own split lines in
    place: zero shuffles, line order preserved for free, and a doc
    whose every line was flagged naturally comes back as '' (the
    earlier explode→anti-join→regroup shape cost two corpus shuffles
    plus a restore join for the same answer). Returns (doc_id, text)."""
    fl = flagged.agg(F.collect_list("line").alias("_fl"))
    kept = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda l: ~F.array_contains(F.col("_fl"), F.trim(l)),
    )
    return (
        docs.crossJoin(F.broadcast(fl))
        .select(
            F.col(id_col).alias("doc_id"),
            F.array_join(kept, "\n").alias("text"),
        )
        .orderBy("doc_id")
    )


def rake_keyphrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — corpus-level
    candidate-term mining: the cheap, language-light extractor that
    surfaces multi-word terms for KG node candidates and index
    vocabularies. Candidate phrases are maximal stopword-free word runs
    (relational gaps-and-islands: island = pos − row_number over
    non-stopword positions, the q162 idiom); each word scores
    deg/freq where deg sums the lengths of every phrase containing it
    (RAKE's degree = co-occurrence credit), and a phrase scores the sum
    of its members' scores.

    Exactness contract: word scores are round(1e6·deg/freq) BIGINT
    micro-scores (ONE float op per distinct word), phrase scores are
    then associative INTEGER sums — bit-stable across engines and
    partitionings. Output: the corpus's ``top_n`` phrases by
    (score_micro DESC, phrase ASC) — (phrase, score_micro,
    n_occurrences, n_docs).

    Scale: one corpus explode, a word-keyed stats aggregate (map-side
    combined; the join back to members is 1:1 per row — Zipf-hot words
    fan nothing out), one (doc, island) rollup, one phrase rollup, and
    a top-N. No driver-side state."""
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words(text_col)).alias("pos", "w"),
    ).where(F.col("w") != "")
    ns = w.where(~F.col("w").isin(*STOPWORDS)).withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    mem = ns.withColumn(
        "plen", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "island"))
    )
    scores = (
        mem.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .select(
            "w",
            F.round(F.lit(1000000.0) * F.col("deg") / F.col("freq"))
            .cast("long")
            .alias("w_score"),
        )
    )
    phrases = (
        mem.join(scores, "w")
        .groupBy("doc_id", "island")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("phrase"),
            F.sum("w_score").cast("long").alias("score_micro"),
        )
    )
    return (
        phrases.groupBy("phrase", "score_micro")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("score_micro"), F.asc("phrase"))
        .limit(top_n)
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
    hot_words: int = 1000,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): per
    language, split the corpus into head / middle / tail thirds by LM
    quality — the standard curation knob where "head" feeds pretraining
    and "tail" is dropped or downweighted. The LM here is the corpus's
    own unigram model (unigram_logprob's perplexity proxy; swap in a
    real LM score column upstream and the bucketing dataflow is
    unchanged). Higher mean log-prob = lower perplexity = head.

    Buckets are ntile(n) over a TOTAL order (logprob 6 dp descending,
    doc_id ascending) within each language partition — deterministic
    and engine-identical. The per-language window sorts that language's
    doc-dimension rows (id + one double), not the corpus text; at
    10^12 docs swap ntile for fixed logprob cutoffs learned on a
    sample, which removes the sort entirely. Per-bucket mean log-prob
    is summed as exact micro-integers (logprob is already 6 dp, so
    round(lp·10⁶) is lossless).

    Output: (lang, bucket, bucket_rank, n_docs, avg_logprob 6 dp),
    ordered by (lang, bucket_rank)."""
    lp = unigram_logprob(df, id_col, text_col, hot_words=hot_words)
    langs = df.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
    )
    j = lp.join(langs, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("logprob"), F.asc("doc_id")
    )
    tiled = j.select(
        "lang",
        F.round(F.col("logprob") * 1000000.0, 0).cast("long").alias("lpm"),
        F.ntile(n_buckets).over(w).cast("int").alias("bucket_rank"),
    )
    # a language with fewer docs than n_buckets only emits ranks 1..k:
    # its WORST observed tier must still be labeled 'tail' (a pipeline
    # dropping bucket='tail' would otherwise never drop anything for
    # small languages); a 1-doc language is head by precedence
    name = (
        F.when(F.col("bucket_rank") == 1, F.lit("head"))
        .when(F.col("bucket_rank") == F.col("_maxr"), F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    wl = Window.partitionBy("lang")
    return (
        tiled.groupBy("lang", "bucket_rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("lpm").cast("long").alias("_slpm"),
        )
        .withColumn("_maxr", F.max("bucket_rank").over(wl))
        .select(
            "lang",
            name.alias("bucket"),
            "bucket_rank",
            "n_docs",
            F.round(F.col("_slpm") / (F.col("n_docs") * 1000000.0), 6).alias(
                "avg_logprob"
            ),
        )
        .orderBy("lang", "bucket_rank")
    )


def texttiling_boundaries(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_words: int = 10,
) -> DataFrame:
    """Topic-boundary detection per document (TextTiling, Hearst 1997,
    median-threshold variant): cut the token stream into fixed
    ``block_words`` blocks, score every inter-block gap by the cosine
    similarity of the adjacent blocks' term vectors, and flag a gap as a
    segment boundary when it is a strict local minimum BELOW the
    document's lower-median gap score. The chunker upstream of
    embedding/RAG pipelines that wants topically coherent chunks instead
    of q93's fixed windows.

    Deviation from Hearst documented: the classic depth-score cutoff
    (mean − sd/2) needs float mean/sd comparisons that can flip on
    engine ulp; the lower median of MICRO-ROUNDED similarities is an
    exact integer order statistic — same qualitative rule (cut at
    unusually low valleys), engine-stable by construction.

    Shape: one posexplode (rows = token count), two (doc, block)-keyed
    aggregates, one adjacent-block equi-join on (doc, word) whose
    fan-out is bounded per document, two doc-keyed windows (gap order +
    median pick) — keys are all doc-prefixed, so no cross-doc hot key
    exists and a 10^12-doc corpus shuffles evenly. Output: (doc_id,
    gap, sim 6 dp, is_boundary) — one row per gap between consecutive
    blocks; single-block documents emit nothing."""
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.trim(F.lower(F.col(text_col))), " +")
            ).alias("pos", "w"),
        )
        .where(F.col("w") != "")
        .select(
            "doc_id",
            (F.col("pos").cast("long") / block_words)
            .cast("long")
            .alias("block"),
            "w",
        )
    )
    counts = toks.groupBy("doc_id", "block", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    norms = counts.groupBy("doc_id", "block").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ssq")
    )
    dots = (
        counts.alias("l")
        .join(
            counts.alias("r"),
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.block") + 1 == F.col("r.block"))
            & (F.col("l.w") == F.col("r.w")),
        )
        .groupBy(F.col("l.doc_id").alias("doc_id"), F.col("l.block").alias("gap"))
        .agg(F.sum(F.col("l.c") * F.col("r.c")).cast("long").alias("dot"))
    )
    gaps = (
        norms.alias("n1")
        .join(
            norms.alias("n2"),
            (F.col("n1.doc_id") == F.col("n2.doc_id"))
            & (F.col("n1.block") + 1 == F.col("n2.block")),
        )
        .select(
            F.col("n1.doc_id").alias("doc_id"),
            F.col("n1.block").alias("gap"),
            F.col("n1.ssq").alias("ssq_l"),
            F.col("n2.ssq").alias("ssq_r"),
        )
        .join(dots, ["doc_id", "gap"], "left")
        .select(
            "doc_id",
            "gap",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0)).cast("double")
                / (
                    F.sqrt(F.col("ssq_l").cast("double"))
                    * F.sqrt(F.col("ssq_r").cast("double"))
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("sim_micro"),
        )
    )
    worder = Window.partitionBy("doc_id").orderBy("gap")
    wmed = Window.partitionBy("doc_id").orderBy("sim_micro", "gap")
    wall = Window.partitionBy("doc_id")
    g = gaps.select(
        "doc_id",
        "gap",
        "sim_micro",
        F.lag("sim_micro").over(worder).alias("prev"),
        F.lead("sim_micro").over(worder).alias("nxt"),
        F.row_number().over(wmed).alias("rn"),
        F.count(F.lit(1)).over(wall).cast("long").alias("cnt"),
    )
    lmed = g.where(
        F.col("rn") == F.expr("(cnt + 1) DIV 2")
    ).select("doc_id", F.col("sim_micro").alias("lmed"))
    local_min = (
        F.col("prev").isNull() | (F.col("sim_micro") < F.col("prev"))
    ) & (F.col("nxt").isNull() | (F.col("sim_micro") < F.col("nxt")))
    return (
        g.join(lmed, "doc_id")
        .select(
            "doc_id",
            "gap",
            F.round(F.col("sim_micro") / 1000000.0, 6).alias("sim"),
            (local_min & (F.col("sim_micro") < F.col("lmed"))).alias(
                "is_boundary"
            ),
        )
    )
