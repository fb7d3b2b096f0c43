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
