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


def test_mix_divergence_zero_on_identical_and_finite_on_missing(spark):
    """KL/JS terms sum to ~0 for identical mixes, strictly positive under
    drift, and stay finite when a group exists in only one snapshot."""
    from bran_spark.operators.quality import mix_divergence

    a = spark.createDataFrame(
        [(i, ["s0", "s1"][i % 2]) for i in range(100)], "doc_id long, g string"
    )
    same = mix_divergence(a, a, "g").collect()
    assert abs(sum(r.kl_ab_term for r in same)) < 1e-4
    assert abs(sum(r.js_term for r in same)) < 1e-4

    b = spark.createDataFrame(
        [(i, ["s0", "s2"][i % 4 == 0 and 1 or 0]) for i in range(100)],
        "doc_id long, g string",
    )
    drift = mix_divergence(a, b, "g").collect()
    gs = {r.g: r for r in drift}
    assert set(gs) == {"s0", "s1", "s2"}          # union of groups
    assert all(abs(r.kl_ab_term) < 1e6 for r in drift)   # finite
    assert sum(r.js_term for r in drift) > 0.01   # real drift registers


def test_bigram_logprob_ranks_predictable_text_higher(spark):
    """A doc of corpus-frequent bigrams outscores one whose words are
    corpus-frequent but whose TRANSITIONS are rare (the case unigram
    scoring cannot separate); <2-word docs are excluded; the hot-bigram
    broadcast split never changes results."""
    from bran_spark.operators.quality import bigram_logprob

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "the cat sat on the mat"))      # frequent transitions
    rows.append((101, "mat the on sat cat the"))      # same words, rare ones
    rows.append((102, "solo"))                        # no bigram
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert 102 not in out
    assert out[100].logprob > out[101].logprob
    no_hot = {r.doc_id: r for r in
              bigram_logprob(df, "doc_id", "text", hot_bigrams=0).collect()}
    assert {k: (v.n_bigram, v.logprob) for k, v in out.items()} == \
           {k: (v.n_bigram, v.logprob) for k, v in no_hot.items()}


def test_countmin_never_underestimates(spark):
    """CMS guarantee: est >= exact for every audited word; with width far
    above vocabulary size collisions vanish and est == exact."""
    from bran_spark.functions.text import countmin_heavy_hitters

    rows = [(i, " ".join(f"w{j % 13}" for j in range(i % 20 + 1)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = countmin_heavy_hitters(df, "doc_id", "text",
                                 width=64, depth=4, k=10).collect()
    assert len(out) == 10
    assert all(r.est >= r.exact for r in out)
    wide = countmin_heavy_hitters(df, "doc_id", "text",
                                  width=4096, depth=4, k=10).collect()
    assert all(r.est == r.exact for r in wide)


def test_token_entropy_separates_skewed_from_uniform(spark):
    """Uniform word mix -> norm_entropy ~1; mass collapsed on one token
    among many distinct words -> low norm_entropy despite low
    dup_word_frac-style distinctness; single-word doc guard -> 0."""
    from bran_spark.operators.quality import token_entropy

    uniform = " ".join(f"w{i}" for i in range(16))
    skewed = " ".join(["the"] * 48 + [f"w{i}" for i in range(16)])
    rows = [(1, uniform), (2, skewed), (3, "solo solo solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert abs(out[1].norm_entropy - 1.0) < 1e-4
    assert out[2].n_distinct == 17 and out[2].norm_entropy < 0.6
    assert out[3].norm_entropy == round(0.0 + 1e-9, 6)
    import math
    assert abs(out[1].entropy - math.log(16)) < 1e-4


def test_woe_iv_separating_vs_useless_signal(spark):
    """WOE/IV hand arithmetic: a perfectly separating signal has high
    total IV with opposite-sign WOE in the two occupied bins; a signal
    independent of the label has IV ~ 0."""
    import math

    from bran_spark.operators.quality import woe_iv

    # separating: positives all land in bin 0, negatives in bin 1
    rows = [(5.0, True)] * 8 + [(15.0, False)] * 8
    df = spark.createDataFrame(rows, "v double, y boolean")
    out = {r.bin: r for r in woe_iv(df, "v", "y", lo=0.0, hi=20.0, n_bins=2).collect()}
    g0, b0 = (8 + 0.5) / (8 + 1.0), (0 + 0.5) / (8 + 1.0)
    assert out[0].woe == round(math.log(g0 / b0), 6)
    assert out[1].woe == round(math.log(b0 / g0), 6)  # mirrored
    assert out[0].iv_term == round((g0 - b0) * math.log(g0 / b0), 6)
    assert sum(r.iv_term for r in out.values()) > 0.3  # "strong" signal

    # useless: labels independent of the bin -> IV ~ 0
    rows2 = [(5.0, True)] * 4 + [(5.0, False)] * 4 + [(15.0, True)] * 4 + [(15.0, False)] * 4
    df2 = spark.createDataFrame(rows2, "v double, y boolean")
    out2 = woe_iv(df2, "v", "y", lo=0.0, hi=20.0, n_bins=2).collect()
    assert all(r.woe == 0.0 and r.iv_term == 0.0 for r in out2)

    # NULL values and labels are dropped, edge values clamp into bins
    rows3 = [(None, True), (5.0, None), (-99.0, True), (999.0, False)]
    df3 = spark.createDataFrame(rows3, "v double, y boolean")
    out3 = {r.bin: (r.n_pos, r.n_neg) for r in woe_iv(df3, "v", "y", 0.0, 20.0, 2).collect()}
    assert out3 == {0: (1, 0), 1: (0, 1)}


def test_diversity_profile_uniform_and_skewed(spark):
    import math

    from bran_spark.operators.quality import diversity_profile

    uniform = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(40)], "id int, source string"
    )
    u = diversity_profile(uniform, "source").head()
    assert u.n_groups == 4 and u.top_share == 0.25
    assert abs(u.shannon_h - round(math.log(4), 6)) < 1e-9
    assert abs(u.eff_shannon - 4.0) < 1e-5 and abs(u.eff_simpson - 4.0) < 1e-5
    assert abs(u.gini_simpson - 0.75) < 1e-9

    skewed = spark.createDataFrame(
        [(i, "big" if i < 9 else "tiny") for i in range(10)],
        "id int, source string",
    )
    s = diversity_profile(skewed, "source").head()
    assert s.n_groups == 2 and s.top_share == 0.9
    assert s.eff_shannon < 2.0 and s.eff_simpson < 2.0
    assert abs(s.gini_simpson - (1 - 0.81 - 0.01)) < 1e-9


def test_ks_drift_identical_and_disjoint(spark):
    rows = [(i, "a", float(i % 5)) for i in range(20)]
    same = spark.createDataFrame(
        rows + [(100 + i, "b", float(i % 5)) for i in range(20)],
        "id int, g string, v double",
    )
    from bran_spark.operators.quality import ks_drift

    assert ks_drift(same, "g", "v", "a", "b").head().ks_d == 0.0
    disjoint = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 10.0), (4, "b", 11.0)],
        "id int, g string, v double",
    )
    row = ks_drift(disjoint, "g", "v", "a", "b").head()
    assert row.ks_d == 1.0 and row.n_a == 2 and row.n_b == 2
    # half-shifted: {1,2} vs {2,3} -> D = 0.5
    half = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 2.0), (4, "b", 3.0)],
        "id int, g string, v double",
    )
    assert ks_drift(half, "g", "v", "a", "b").head().ks_d == 0.5
    # absent group: must yield NULL ks_d, not an ANSI DIVIDE_BY_ZERO abort
    absent = ks_drift(half, "g", "v", "a", "nosuch").head()
    assert absent.ks_d is None and absent.n_b == 0


def test_vocab_saturation_closed_form(spark):
    import math

    from bran_spark.operators.quality import vocab_saturation

    docs = spark.createDataFrame(
        [("1", "a a a b b c"), ("2", "a d")], "doc_id string, text string"
    )
    row = vocab_saturation(docs, "text").head()
    # tokens: a x4, b x2, c x1, d x1 -> N=8, V=4, singletons=2
    assert row.n_tokens == 8 and row.vocab == 4 and row.n_singletons == 2
    assert row.unseen_mass == 0.25
    assert abs(row.herdan_c - round(math.log(4) / math.log(8), 6)) < 1e-9


def test_quantile_normalize_per_group_and_ties(spark):
    from bran_spark.operators.quality import quantile_normalize

    df = spark.createDataFrame(
        [
            ("a", "s1", 10), ("b", "s1", 20), ("c", "s1", 30),
            ("d", "s2", 5), ("e", "s2", 5), ("f", "s2", 99),
        ],
        "doc_id string, source string, n_chars int",
    )
    out = {
        r.id: r.q
        for r in quantile_normalize(df, "source", "n_chars", "doc_id").collect()
    }
    assert out["a"] == 0.0 and out["b"] == 0.5 and out["c"] == 1.0
    # ties share the rank (both minimums -> 0), max -> 1 regardless of group
    assert out["d"] == 0.0 and out["e"] == 0.0 and out["f"] == 1.0


def test_extract_quantities_canonicalizes_units(spark):
    from bran_spark.functions.text import extract_quantities

    docs = spark.createDataFrame(
        [
            (1, "give 500 mg then 0.5 g then 2 kg and 250 mcg"),
            (2, "dilute in 1.5 l or 150 cl or 1500 ml"),
            (3, "no units here, just 42 words"),
        ],
        "doc_id long, text string",
    )
    out = extract_quantities(docs).collect()
    by_raw = {(r.doc_id, r.raw): r for r in out}
    # '500 mg' and '0.5 g' canonicalize to the SAME mg value
    assert by_raw[(1, "500 mg")].canonical == 500.0
    assert by_raw[(1, "0.5 g")].canonical == 500.0
    assert by_raw[(1, "2 kg")].canonical == 2000000.0
    assert by_raw[(1, "250 mcg")].canonical == 0.25
    assert all(
        r.kind == "mass_mg" for r in out if r.doc_id == 1
    )
    # the three volume spellings agree at 1500 ml
    vols = {r.canonical for r in out if r.doc_id == 2}
    assert vols == {1500.0}
    # bare numbers without a unit are not mentions
    assert not [r for r in out if r.doc_id == 3]


def test_readability_flesch_arithmetic(spark):
    from bran_spark.operators.quality import readability_scores

    docs = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!"), (2, "no terminal punctuation")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability_scores(docs).collect()}
    r1 = out[1]
    assert r1.n_words == 6 and r1.n_sentences == 2
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (r1.n_syllables / 6)
    assert abs(r1.ease - round(expected, 6)) < 1e-9
    assert out[2].n_sentences == 1  # clamped, never /0


def test_boilerplate_detect_and_strip(spark):
    from bran_spark.operators.quality import (
        boilerplate_lines,
        strip_boilerplate,
    )

    docs = spark.createDataFrame(
        [
            (1, "real content one\ncommon footer line here"),
            (2, "real content two\ncommon footer line here"),
            (3, "real content three\ncommon footer line here"),
            (4, "common footer line here"),  # nothing else -> becomes ''
            (5, "short\nan uncommon line that stays"),
        ],
        "doc_id long, text string",
    )
    flagged = boilerplate_lines(docs, min_df=3, min_chars=10)
    assert [r.line for r in flagged.collect()] == ["common footer line here"]
    out = {r.doc_id: r.text for r in strip_boilerplate(docs, flagged).collect()}
    assert out[1] == "real content one"
    assert out[4] == ""  # fully-boilerplate doc preserved as empty
    assert out[5] == "short\nan uncommon line that stays"
    assert set(out) == {1, 2, 3, 4, 5}


def test_url_canonical_rules(spark):
    from bran_spark.functions.text import url_canonical

    df = spark.createDataFrame(
        [
            ("HTTPS://Site.COM:443/a/?utm_source=x&b=2&a=1#frag",),
            ("https://site.com/a/?a=1&b=2",),
            ("http://Host.org:80",),
            ("https://h.io:8443/x",),          # non-default port KEPT
            ("http://h.io/?gclid=1&ref=t",),   # all-tracking query -> none
            ("not a url at all",),
        ],
        "u string",
    )
    got = [r.c for r in df.select(url_canonical("u").alias("c")).collect()]
    assert got[0] == got[1] == "https://site.com/a/?a=1&b=2"
    assert got[2] == "http://host.org/"
    assert got[3] == "https://h.io:8443/x"
    assert got[4] == "http://h.io/"
    assert got[5] == "not a url at all"  # pass-through, never mangled


def test_url_canonical_empty_authority_passthrough(spark):
    from bran_spark.functions.text import url_canonical

    df = spark.createDataFrame(
        [("file:///a.txt",), ("file:///b.txt",), ("http://:80/x",)],
        "u string",
    )
    got = [r.c for r in df.select(url_canonical("u").alias("c")).collect()]
    # no authority -> no host rules apply; pass through (NEVER collapse
    # distinct paths onto 'scheme:///')
    assert got[0] == "file:///a.txt" and got[1] == "file:///b.txt"
    assert got[2] == "http://:80/x"


def test_readability_whitespace_and_empty(spark):
    from bran_spark.operators.quality import readability_scores

    docs = spark.createDataFrame(
        [(1, "the cat\nthe dog."), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability_scores(docs).collect()}
    assert out[1].n_words == 4  # newline splits words
    assert out[2].n_words == 0 and out[2].ease is None
    assert out[3].ease is None
