"""BM25 ranking, token-bin packing (distributed prefix sum), ANN kNN join."""

import math

from pyspark.sql import functions as F

from bran_spark.operators.packing import pack_token_bins
from bran_spark.operators.search import bm25_topk
from bran_spark.operators.similarity import ann_knn_join


def _bm25_local(corpus, terms, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in corpus.items()}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    out = {}
    for i, w in docs.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            if not tf or not df[t]:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if s:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_local_reference(spark):
    corpus = {
        1: "spark shuffles data across the cluster",
        2: "spark spark spark tuning guide",
        3: "a completely unrelated document about cooking",
        4: "cluster management and spark deployment on a cluster",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ["spark", "cluster"], k=10).collect()
    }
    want = _bm25_local(corpus, ["spark", "cluster"])
    assert got == want
    # two-term doc 1 (spark + cluster) outranks one-term doc 2 despite
    # doc 2's tf=3 — tf saturates at k1, idf of a second term doesn't
    assert got[1] > got[2]
    assert max(got, key=got.get) == max(want, key=want.get)


def test_pack_token_bins_prefix_sum(spark):
    rows = [(i, f"doc {i}", (i * 37) % 90 + 10) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tok long")
    out = {
        r["id"]: (r["offset"], r["bin_id"])
        for r in pack_token_bins(df, "doc_id", "n_tok", budget=256).collect()
    }
    acc = 0
    for i in range(500):
        n = (i * 37) % 90 + 10
        assert out[i] == (acc, acc // 256), f"doc {i}"
        acc += n
    assert len(out) == 500


def test_pack_token_bins_partition_invariance(spark):
    rows = [(i, (i * 13) % 50 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = pack_token_bins(df, "doc_id", "n_tok", budget=100, partitions=3)
    b = pack_token_bins(df.repartition(17), "doc_id", "n_tok", budget=100,
                        partitions=29)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ann_knn_join_ranks_by_cosine(spark):
    # 3 clusters along axes; every vector's nearest neighbors share its axis
    rows = []
    for axis in range(3):
        for j in range(4):
            v = [0.0] * 24
            v[axis * 8] = 1.0
            v[axis * 8 + 1] = 0.1 * (j + 1)
            rows.append((axis * 10 + j, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann_knn_join(df, k=2).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["id_a"], []).append(r)
    for qid, rs in by_query.items():
        assert len(rs) <= 2
        assert all(r["rank"] in (1, 2) for r in rs)
        # neighbors come from the same axis cluster (cosine ≈ 1 in-cluster,
        # ≈ 0 across clusters — banding can only drop, not reorder)
        for r in rs:
            assert r["id_b"] // 10 == qid // 10
            assert r["cos"] > 0.9


def test_rrf_fuse_arithmetic_and_missing_lists(spark):
    """Hand-computed fusion: a doc ranked 1st in both lists gets
    2/(k+1); a doc present in only one list gets its single term;
    ordering follows fused score with id tie-break."""
    from bran_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(10, 5.0), (20, 4.0), (30, 3.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(10, 0.9), (40, 0.8)], "doc_id long, cos double"
    )
    out = {r.doc_id: r for r in rrf_fuse([a, b], k=60, top=10).collect()}
    assert out[10].n_lists == 2
    assert abs(out[10].rrf_score - (1 / 61 + 1 / 61)) < 1e-5
    assert out[20].n_lists == 1 and abs(out[20].rrf_score - 1 / 62) < 1e-5
    assert abs(out[40].rrf_score - 1 / 62) < 1e-5
    ordered = [r.doc_id for r in rrf_fuse([a, b], k=60, top=10)
               .orderBy("rrf_score", ascending=False).collect()]
    assert ordered[0] == 10


def test_mmr_rerank_diversifies_redundant_top(spark):
    """Planted redundancy: two near-identical high-relevance docs — MMR
    picks one, then prefers a diverse lower-relevance doc over the twin;
    rank order and budget respected; determinism across reruns."""
    from bran_spark.operators.search import mmr_rerank

    cands = spark.createDataFrame(
        [(1, 0.95), (2, 0.94), (3, 0.80), (4, 0.10)],
        "id long, rel double",
    )
    # docs 1 and 2 are near-duplicates (sim .99); 3 is diverse
    sims_rows = [(1, 2, 0.99), (2, 1, 0.99),
                 (1, 3, 0.10), (3, 1, 0.10),
                 (2, 3, 0.10), (3, 2, 0.10),
                 (1, 4, 0.0), (4, 1, 0.0), (2, 4, 0.0), (4, 2, 0.0),
                 (3, 4, 0.0), (4, 3, 0.0)]
    sims = spark.createDataFrame(sims_rows, "id_a long, id_b long, sim double")
    out = mmr_rerank(cands, sims, k=3, lam=0.7).collect()
    order = [r.id for r in out]
    assert order[0] == 1                 # best relevance first
    assert order[1] == 3                 # diverse beats the 0.94 twin
    assert order[2] == 2
    assert [r.rank for r in out] == [1, 2, 3]
    again = [r.id for r in mmr_rerank(cands, sims, k=3, lam=0.7).collect()]
    assert order == again


def test_lm_dirichlet_hand_values(spark):
    import math

    from bran_spark.operators.search import lm_dirichlet_topk

    docs = spark.createDataFrame(
        [(1, "data data x"), (2, "data y"), (3, "z")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.score
        for r in lm_dirichlet_topk(
            docs, ["data", "dup"], mu=10.0, k=10
        ).collect()
    }
    # |C|=6, ctf(data)=3 -> p=0.5; 'dup' absent from the corpus: it adds
    # no matched rows and the constant |q| term is rank-neutral
    p = 3 / 6
    s1 = math.log(1 + 2 / (10 * p)) + 2 * math.log(10 / (3 + 10))
    s2 = math.log(1 + 1 / (10 * p)) + 2 * math.log(10 / (2 + 10))
    assert out == {1: round(s1, 6), 2: round(s2, 6)}  # d3 never scored
    # Dirichlet's length prior dominates at small mu: the shorter doc
    # outranks the higher-tf longer one (unlike BM25's k1/b trade-off)
    assert out[2] > out[1]


def test_zipf_fit_closed_form(spark):
    import math

    from bran_spark.operators.quality import zipf_fit

    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = zipf_fit(docs, top_n=100).collect()[0]
    xs = [math.log(i) for i in (1, 2, 3, 4)]
    ys = [math.log(f) for f in (8, 4, 2, 1)]
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sx2 = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    assert r.n_terms == 4
    assert abs(r.slope - slope) < 1e-5
    assert abs(r.intercept - (sy - slope * sx) / n) < 1e-5


def test_prf_expansion_recovers_vocab_neighbors(spark):
    """PRF recovers a doc sharing vocabulary with the top results but
    not with the literal query; original query terms stay in round 2."""
    from bran_spark.operators.search import bm25_topk, prf_expand_topk

    docs = spark.createDataFrame(
        [
            (1, "query apple banana"),        # matches the query, has 'banana'
            (2, "query banana cherry"),       # matches, has 'banana'
            (3, "banana cherry orange"),      # NO query term, shares feedback vocab
            (4, "pear plum quince"),          # unrelated
        ],
        "doc_id int, text string",
    )
    base = {r.doc_id for r in bm25_topk(docs, ["query"], k=10).collect()}
    assert base == {1, 2}  # literal query can't see doc 3
    exp = {
        r.doc_id
        for r in prf_expand_topk(
            docs, ["query"], fb_docs=2, fb_terms=2, k=10
        ).collect()
    }
    assert 3 in exp          # recovered via expansion terms
    assert {1, 2} <= exp     # originals still match
    assert 4 not in exp      # unrelated stays out


def test_rank_agreement_hand_values(spark):
    from bran_spark.operators.evaluate import rank_agreement

    # ranking A: d1 d2 d3 d4 ; ranking B: d2 d1 d3 d5 (scores encode order)
    a = spark.createDataFrame(
        [("d1", 4.0), ("d2", 3.0), ("d3", 2.0), ("d4", 1.0)],
        "doc_id string, score double",
    )
    b = spark.createDataFrame(
        [("d2", 4.0), ("d1", 3.0), ("d3", 2.0), ("d5", 1.0)],
        "doc_id string, score double",
    )
    row = rank_agreement(a, b).head()
    # common = {d1(1,2), d2(2,1), d3(3,3)} -> pairs: (d1,d2) discordant,
    # (d1,d3) concordant, (d2,d3) concordant -> tau = (2-1)/3
    assert row.n_a == 4 and row.n_b == 4 and row.n_common == 3
    assert row.n_concordant == 2 and row.n_discordant == 1
    assert row.overlap == 0.75
    assert abs(row.tau - (1 / 3)) < 1e-6


def test_rank_agreement_identical_and_tiny(spark):
    from bran_spark.operators.evaluate import rank_agreement

    a = spark.createDataFrame(
        [("x", 2.0), ("y", 1.0), ("z", 0.5)], "doc_id string, score double"
    )
    same = rank_agreement(a, a).head()
    assert same.tau == 1.0 and same.overlap == 1.0
    # disjoint lists: no common pairs -> tau NULL, zero counts
    b = spark.createDataFrame([("w", 1.0)], "doc_id string, score double")
    dis = rank_agreement(a, b).head()
    assert dis.n_common == 0 and dis.tau is None
    assert dis.n_concordant == 0 and dis.n_discordant == 0
    # empty ranking: overlap must be NULL, not an ANSI DIVIDE_BY_ZERO abort
    empty = spark.createDataFrame([], "doc_id string, score double")
    deg = rank_agreement(a, empty).head()
    assert deg.n_b == 0 and deg.overlap is None and deg.tau is None


def test_ndcg_hand_values(spark):
    import math

    from bran_spark.operators.evaluate import ndcg_at_k

    # grades: d1=3 d2=2 d3=0 d4=1 ; ranking puts d2 first, d1 second
    ranked = spark.createDataFrame(
        [("d2", 9.0), ("d1", 8.0), ("d3", 7.0)], "doc_id string, score double"
    )
    rels = spark.createDataFrame(
        [("d1", 3), ("d2", 2), ("d3", 0), ("d4", 1)], "doc_id string, rel int"
    )
    row = ndcg_at_k(ranked, rels, k=3).head()
    dcg = 3 / math.log2(2) + 7 / math.log2(3) + 0
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert abs(row.dcg - round(dcg, 6)) < 1e-9
    assert abs(row.idcg - round(idcg, 6)) < 1e-9
    assert abs(row.ndcg - round(round(dcg, 6) / round(idcg, 6), 6)) < 1e-6


def test_ndcg_perfect_ranking_is_one_and_no_rels_null(spark):
    from bran_spark.operators.evaluate import ndcg_at_k

    rels = spark.createDataFrame(
        [("a", 2), ("b", 1), ("c", 0)], "doc_id string, rel int"
    )
    ideal = spark.createDataFrame(
        [("a", 5.0), ("b", 4.0), ("c", 3.0)], "doc_id string, score double"
    )
    assert ndcg_at_k(ideal, rels, k=3).head().ndcg == 1.0
    zero = spark.createDataFrame(
        [("a", 0), ("b", 0)], "doc_id string, rel int"
    )
    assert ndcg_at_k(ideal, zero, k=3).head().ndcg is None


def test_hard_negatives_excludes_full_matches(spark):
    from bran_spark.operators.search import hard_negatives

    docs = spark.createDataFrame(
        [
            ("full", "alpha beta gamma"),        # contains both -> positive
            ("half1", "alpha alpha alpha"),      # hard negative, high tf
            ("half2", "beta delta"),             # hard negative
            ("none", "delta epsilon"),           # no match -> never scored
        ],
        "doc_id string, text string",
    )
    out = hard_negatives(docs, ["alpha", "beta"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert "full" not in ids and "none" not in ids
    assert set(ids) == {"half1", "half2"}
    assert [r.rank for r in sorted(out, key=lambda r: -r.score)] == [1, 2]
    # a repeated query term must not inflate the conjunctive-match size
    # past reach (which emptied the positive set and returned the true
    # matches as "negatives") nor double that term's BM25 contribution:
    # duplicated input == deduplicated input, bit-for-bit.
    dup = hard_negatives(docs, ["alpha", "alpha", "beta"], k=10).collect()
    assert sorted((r.doc_id, r.score, r.rank) for r in dup) == sorted(
        (r.doc_id, r.score, r.rank) for r in out
    )


def test_textrank_hub_word_ranks_first(spark):
    from bran_spark.operators.search import textrank_keywords

    # 'hub' co-occurs with everything; leaves only with 'hub'
    docs = spark.createDataFrame(
        [("1", "hub alpha"), ("2", "hub beta"), ("3", "hub gamma"),
         ("4", "hub delta"), ("5", "alpha beta")],
        "doc_id string, text string",
    )
    out = textrank_keywords(docs, window=2, iters=5, k=10).collect()
    assert out[0].word == "hub"
    assert out[0].rank_fp > out[-1].rank_fp
    words_out = {r.word for r in out}
    assert {"hub", "alpha", "beta", "gamma", "delta"} == words_out


def test_cloze_pairs_masks_every_occurrence_of_top_term(spark):
    from bran_spark.operators.search import cloze_pairs

    # 'rare' appears only in doc 1 (twice) -> highest tf*idf there;
    # common fillers appear everywhere
    docs = spark.createDataFrame(
        [
            ("1", "rare common1 rare common2"),
            ("2", "common1 common2 other"),
            ("3", "common1 common2 other"),
        ],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in cloze_pairs(docs).collect()}
    assert out["1"].answer == "rare"
    assert out["1"].question == "[MASK] common1 [MASK] common2"
    assert "[MASK]" in out["2"].question
    assert out["2"].answer not in out["2"].question.split()


def test_retrieval_metrics_hand_values(spark):
    from bran_spark.operators.evaluate import retrieval_metrics

    ranked = spark.createDataFrame(
        [("a", 5.0), ("b", 4.0), ("c", 3.0), ("d", 2.0)],
        "doc_id string, score double",
    )
    rel = spark.createDataFrame(
        [("b",), ("d",), ("z",)], "doc_id string"
    )
    row = retrieval_metrics(ranked, rel, k=4).head()
    assert row.n_ranked == 4 and row.n_rel == 3 and row.n_hit == 2
    assert row.p_at_k == 0.5
    assert abs(row.r_at_k - round(2 / 3, 6)) < 1e-9
    assert row.mrr == 0.5  # first relevant at rank 2
    # no relevant docs in the ranking -> mrr 0
    none = retrieval_metrics(
        ranked, spark.createDataFrame([("z",)], "doc_id string"), k=4
    ).head()
    assert none.mrr == 0.0 and none.n_hit == 0
