"""Connected components (large-star/small-star) vs a local union-find."""

import random

import pytest
from pyspark.sql import functions as F

from bran_spark.operators.components import connected_components, dedup_clusters


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


def test_cc_chain_triangle_pair(spark):
    # a 6-chain (worst case for label propagation), a triangle, a lone pair
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
             (10, 11), (11, 12), (12, 10),
             (20, 21)]
    _check(spark, edges)


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_summary(spark):
    edges = [(5, 9), (9, 7), (1, 2)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = {r["component"]: r for r in dedup_clusters(df).collect()}
    assert rows[5]["n_docs"] == 3 and rows[5]["keep_id"] == 5
    assert rows[1]["n_docs"] == 2 and rows[1]["keep_id"] == 1


def test_dedup_corpus_keeps_one_per_cluster_and_isolated_docs(spark):
    from bran_spark.operators.components import dedup_corpus

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    # clusters {0,1,2} and {3,4}; doc 5 isolated (in no pair)
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    got = sorted(r["doc_id"] for r in dedup_corpus(docs, pairs).collect())
    assert got == [0, 3, 5]


def test_cluster_safe_split_keeps_duplicates_together(spark):
    """Near-dup cluster members always share a split; singletons split
    ~80/10/10; output covers every doc exactly once."""
    from bran_spark.operators.components import cluster_safe_split

    # doc pairs (i, i+1000) are near-dups; 2000..2999 are singletons
    pairs = spark.createDataFrame(
        [(i, i + 1000) for i in range(200)], "id_a long, id_b long"
    )
    ids = list(range(200)) + list(range(1000, 1200)) + list(range(2000, 3000))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {r.doc_id: (r.cluster, r.split)
           for r in cluster_safe_split(docs, pairs, "doc_id").collect()}
    assert len(out) == len(ids)
    for i in range(200):
        assert out[i][1] == out[i + 1000][1], f"pair {i} straddles splits"
        assert out[i][0] == out[i + 1000][0] == min(i, i + 1000)
    singles = [out[i][1] for i in range(2000, 3000)]
    assert 700 < singles.count("train") < 880
    assert 50 < singles.count("val") < 160
    assert 40 < singles.count("test") < 160


def test_dedup_savings_per_source_accounting(spark):
    from bran_spark.operators.components import dedup_savings

    docs = spark.createDataFrame(
        [
            (1, "spam", "one two three four"),   # cluster {1,2,3}: keep 1
            (2, "spam", "one two three four"),
            (3, "spam", "one two three"),
            (4, "clean", "five six"),            # untouched source
        ],
        "doc_id int, source string, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a int, id_b int"
    )
    out = {r.grp: r for r in dedup_savings(docs, pairs, "source").collect()}
    spam = out["spam"]
    assert spam.n_docs == 3 and spam.n_kept == 1
    assert spam.tokens == 11 and spam.tokens_kept == 4
    assert abs(spam.savings_frac - round(1 - 4 / 11, 6)) < 1e-9
    clean = out["clean"]
    assert clean.n_kept == 1 and clean.tokens_kept == 2
    assert clean.savings_frac == 0.0
