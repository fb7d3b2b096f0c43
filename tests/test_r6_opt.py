"""Round-6 optimization equivalence tests: every operator whose INTERNALS
changed for performance must still compute the identical result.

- rdfs_closure's fused combo-bitmask path (one corpus shuffle) vs the
  row-level derivation-store formulation (rdfs_derivations +
  aggregate_closure) — including the >64-combo chunked-mask branch.
- mine_path_rules' assume_distinct fast path and the pre-aggregated PCA
  join vs the same mining over a dup-containing input.
- entity_summarization / transe_rank_eval assume_distinct equivalence.
- property_path ('plus', p, k) rejects k < 1 (ADVICE r5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_rdfs_closure_fused_equals_derivation_store(spark):
    from bran_spark.operators.reasoning import (
        aggregate_closure,
        prepare_ontology,
        rdfs_closure,
        rdfs_derivations,
    )

    triples = spark.createDataFrame(
        [
            ("a", "p", "b"), ("a", "p", "b"),  # duplicate triple
            ("b", "q", "c"), ("c", "r", "a"), ("d", "p", "a"),
        ],
        ["subj", "pred", "obj"],
    )
    schema = spark.createDataFrame(
        [
            ("p", "subPropertyOf", "q"),
            ("q", "subPropertyOf", "r"),
            ("p", "domain", "A"),
            ("q", "domain", "B"),
            ("r", "range", "C"),
            ("A", "subClassOf", "Top"),
            ("C", "subClassOf", "Top"),
        ],
        ["s", "p", "o"],
    )
    fused = rdfs_closure(triples, schema)
    store = aggregate_closure(
        rdfs_derivations(triples, prepare_ontology(schema), persist=False)
    )
    cols = ["entity", "cls", "n_derivations"]
    assert _rows(fused, cols) == _rows(store, cols)


def test_rdfs_closure_chunked_masks_past_64_combos(spark):
    """71 domain-declared predicates -> >64 combos forces the multi-mask
    chunked branch; result must equal the derivation-store twin."""
    from bran_spark.operators.reasoning import (
        aggregate_closure,
        prepare_ontology,
        rdfs_closure,
        rdfs_derivations,
    )

    n = 71
    triples = spark.createDataFrame(
        [(f"e{i % 7}", f"p{i}", f"o{i % 5}") for i in range(n)],
        ["subj", "pred", "obj"],
    )
    schema = spark.createDataFrame(
        [(f"p{i}", "domain", f"C{i % 3}") for i in range(n)],
        ["s", "p", "o"],
    )
    fused = rdfs_closure(triples, schema)
    store = aggregate_closure(
        rdfs_derivations(triples, prepare_ontology(schema), persist=False)
    )
    cols = ["entity", "cls", "n_derivations"]
    got = _rows(fused, cols)
    assert got == _rows(store, cols)
    # some entity must aggregate >1 combo for the popcount to matter
    assert max(r[2] for r in got) > 1


def test_mine_path_rules_assume_distinct_and_pca_preagg(spark):
    from bran_spark.operators.graphalgo import mine_path_rules

    dup = spark.createDataFrame(
        [
            ("x1", "a", "y1"), ("x1", "a", "y1"),
            ("y1", "b", "z1"), ("x1", "c", "z1"),
            ("x2", "a", "y1"), ("y1", "b", "z2"),
            ("x2", "c", "z9"),
        ],
        ["subj", "pred", "obj"],
    )
    cols = [
        "p1", "p2", "p3", "support", "body_size",
        "confidence", "pca_body", "pca_confidence",
    ]
    base = _rows(mine_path_rules(dup), cols)
    fast = _rows(
        mine_path_rules(dup.distinct(), assume_distinct=True), cols
    )
    assert base == fast


def test_entity_summarization_assume_distinct(spark):
    from bran_spark.operators.kgquality import entity_summarization

    dup = spark.createDataFrame(
        [
            ("s1", "p", "o1"), ("s1", "p", "o1"), ("s1", "q", "o2"),
            ("s2", "p", "o1"), ("s2", "q", "o3"), ("s2", "q", "o3"),
        ],
        ["subj", "pred", "obj"],
    )
    cols = ["subj", "rank", "pred", "obj", "n_pred", "n_po"]
    assert _rows(entity_summarization(dup, k=2), cols) == _rows(
        entity_summarization(dup.distinct(), k=2, assume_distinct=True),
        cols,
    )


def test_transe_eval_assume_distinct(spark):
    from bran_spark.operators.kglearn import transe_rank_eval

    dup = spark.createDataFrame(
        [
            ("A:1", "p", "B:1"), ("A:1", "p", "B:1"),
            ("A:2", "p", "B:2"), ("A:1", "q", "B:2"),
            ("A:3", "p", "B:1"),
        ],
        ["subj", "pred", "obj"],
    )
    cols = ["pred", "n_test", "hits_at_k", "mrr", "mean_rank"]
    base = _rows(transe_rank_eval(dup, test_sample_mod=1), cols)
    fast = _rows(
        transe_rank_eval(dup.distinct(), test_sample_mod=1, assume_distinct=True),
        cols,
    )
    assert base == fast


def test_property_path_plus_rejects_nonpositive_k(spark):
    from bran_spark.operators.reasoning import property_path

    t = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError, match="k >= 1"):
        property_path(t, ("plus", "p", 0)).collect()


def test_kg_relational_triples_coded_bijective(spark, testdata_dir):
    """The integer-coded lifted-KG view must be row-bijective with the
    string view (same triple set after decoding)."""
    from bran_spark.plans.oracle_queries import (
        _KG_PREFIX_CODES,
        _kg_pred_decode,
        _kg_relational_triples,
        _kg_relational_triples_coded,
    )

    s = _kg_relational_triples(spark, testdata_dir)
    c = _kg_relational_triples_coded(spark, testdata_dir)
    inv = {v: k for k, v in _KG_PREFIX_CODES.items()}
    pref = None
    for code, name in inv.items():
        e = F.when(F.shiftright(F.col("subj"), 44) == code, F.lit(name))
        pref = e if pref is None else pref.when(
            F.shiftright(F.col("subj"), 44) == code, F.lit(name)
        )
    decoded = c.select(
        F.concat(
            pref, F.lit(":"),
            (F.col("subj") - (F.shiftright(F.col("subj"), 44) * (1 << 44)))
            .cast("string"),
        ).alias("subj"),
        _kg_pred_decode(F.col("pred")).alias("pred"),
        F.concat(
            F.when(F.shiftright(F.col("obj"), 44) == 1, "O")
            .when(F.shiftright(F.col("obj"), 44) == 2, "C")
            .when(F.shiftright(F.col("obj"), 44) == 3, "S")
            .when(F.shiftright(F.col("obj"), 44) == 4, "N")
            .when(F.shiftright(F.col("obj"), 44) == 5, "R")
            .when(F.shiftright(F.col("obj"), 44) == 6, "P"),
            F.lit(":"),
            (F.col("obj") - (F.shiftright(F.col("obj"), 44) * (1 << 44)))
            .cast("string"),
        ).alias("obj"),
    )
    cols = ["subj", "pred", "obj"]
    assert _rows(decoded, cols) == _rows(s, cols)


def test_mention_dict_candidates_matches_groupby_formulation(spark):
    """The r06 broadcast/pre-aggregated candidate shape must equal the
    old melt-and-aggregate formulation row for row."""
    from bran_spark.operators.linking import mention_dict_candidates

    mesh = spark.createDataFrame(
        [
            ("D1", "Chemical", "Aspirin", ["asa", "acetyl"]),
            ("D2", "Disease", "Asthma", ["ast"]),
            ("D3", "Disease", "Astigmatism", []),
        ],
        ["mesh_id", "type", "canonical_name", "synonyms"],
    )
    mentions = spark.createDataFrame(
        [
            ("m1", "Chemical", "D1", " aspirin "),
            ("m2", "Disease", "D2", "asthma"),
            ("m3", "Disease", "D1", "astigmatism"),
            ("m4", "Chemical", None, "asa"),
        ],
        ["mention_id", "type", "mesh_id", "text"],
    )
    got = mention_dict_candidates(mentions, mesh, prefix_len=3, max_block=50)
    # reference: explicit block join + per-pair aggregation
    names = (
        mesh.select(
            "mesh_id",
            F.col("type").alias("dict_type"),
            F.lower("canonical_name").alias("canon"),
            F.explode(
                F.array_union(F.array(F.col("canonical_name")), F.col("synonyms"))
            ).alias("name0"),
        )
        .select("mesh_id", "dict_type", "canon", F.lower("name0").alias("name"))
        .distinct()
        .withColumn("block", F.substring("name", 1, 3))
    )
    m = mentions.select(
        "mention_id",
        F.col("type").alias("m_type"),
        F.col("mesh_id").alias("gold_id"),
        F.lower(F.trim(F.col("text"))).alias("surface"),
    ).withColumn("block", F.substring("surface", 1, 3))
    ref = (
        m.join(names, "block")
        .groupBy("mention_id", "mesh_id")
        .agg(
            F.max(F.col("surface") == F.col("canon")).alias("agree_name"),
            F.max(F.col("surface") == F.col("name")).alias("agree_syn"),
            F.max(F.col("m_type") == F.col("dict_type")).alias("agree_type"),
            F.max(F.col("gold_id") == F.col("mesh_id")).alias("is_match"),
        )
    )
    cols = ["mention_id", "mesh_id", "agree_name", "agree_syn",
            "agree_type", "is_match"]
    assert _rows(got, cols) == _rows(ref, cols)
    assert len(_rows(got, cols)) > 0


def test_lazy_loops_match_truncated(spark):
    """Lazy iteration chains must be bit-identical to the per-round
    truncated form (truncate_every=1 replays the old shape)."""
    from bran_spark.operators.graphalgo import (
        hits_fixed_point,
        katz_centrality,
        pagerank_fixed_point,
        personalized_pagerank,
        symmetric_edges,
        weighted_sssp,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        ["subj", "obj"],
    )
    sym = symmetric_edges(pairs)
    assert _rows(
        pagerank_fixed_point(sym, iters=3), ["entity", "rank_fp"]
    ) == _rows(
        pagerank_fixed_point(sym, iters=3, truncate_every=1),
        ["entity", "rank_fp"],
    )
    seeds = spark.createDataFrame([("a",)], ["u"])
    assert _rows(
        personalized_pagerank(sym, seeds, iters=3), ["entity", "rank_fp"]
    ) == _rows(
        personalized_pagerank(sym, seeds, iters=3, truncate_every=1),
        ["entity", "rank_fp"],
    )
    cols = ["node", "hub_fp", "auth_fp"]
    assert _rows(hits_fixed_point(pairs, iters=3), cols) == _rows(
        hits_fixed_point(pairs, iters=3, truncate_every=1), cols
    )
    assert _rows(katz_centrality(pairs, iters=3), ["node", "katz_fp"]) == _rows(
        katz_centrality(pairs, iters=3, truncate_every=1), ["node", "katz_fp"]
    )
    wedges = sym.withColumn("w", F.lit(7).cast("long"))
    assert _rows(
        weighted_sssp(wedges, seeds, iters=3), ["entity", "dist"]
    ) == _rows(
        weighted_sssp(wedges, seeds, iters=3, truncate_every=1),
        ["entity", "dist"],
    )


def test_node2vec_lazy_matches_truncated(spark):
    """r06b: node2vec steps compose lazily by default (the step
    expressions are lambda-HOF-free, so the relation-dedup mis-binding
    that motivated per-step checkpoints cannot bite); truncate_every=1
    replays the old per-step-checkpointed shape bit-identically."""
    from bran_spark.operators.graphalgo import node2vec_walks, symmetric_edges

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
         ("e", "a"), ("b", "d")],
        ["subj", "obj"],
    )
    sym = symmetric_edges(pairs)
    cols = ["start", "walk_id", "step", "node"]
    assert _rows(
        node2vec_walks(sym, p=4.0, q=0.25, n_walks=2, walk_len=4), cols
    ) == _rows(
        node2vec_walks(
            sym, p=4.0, q=0.25, n_walks=2, walk_len=4, truncate_every=1
        ),
        cols,
    )
