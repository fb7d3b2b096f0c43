"""Ontology semantic similarity: depths, LCA/path/Wu-Palmer, Resnik IC,
Lin — hand-computed references on a small forest, DAG tie-breaking, and
isolated-node handling."""

from __future__ import annotations

import math

from bran_spark.operators.ontosim import (
    information_content,
    lin_similarity,
    node_depths,
    semantic_similarity,
)

#      r                (depth 1)
#     / \
#    x   y              (depth 2)
#   / \   \
#  a   b   c            (depth 3)
EDGES = [("x", "r"), ("y", "r"), ("a", "x"), ("b", "x"), ("c", "y")]
NODES = ["r", "x", "y", "a", "b", "c", "z"]  # z = isolated root


def _dfs(spark):
    edges = spark.createDataFrame(EDGES, "child string, parent string")
    nodes = spark.createDataFrame([(n,) for n in NODES], "node string")
    return edges, nodes


def test_node_depths(spark):
    edges, nodes = _dfs(spark)
    got = {r.node: r.depth for r in node_depths(edges, nodes).collect()}
    assert got == {"r": 1, "x": 2, "y": 2, "a": 3, "b": 3, "c": 3, "z": 1}


def test_semantic_similarity_hand_values(spark):
    edges, nodes = _dfs(spark)
    got = {
        (r.node_a, r.node_b): (r.lca, r.path_len, r.wup)
        for r in semantic_similarity(edges, nodes).collect()
    }
    # siblings: LCA is the shared parent, never the root
    assert got[("a", "b")] == ("x", 2, round(2 * 2 / 6, 6))
    # cross-subtree: LCA is the root
    assert got[("a", "c")] == ("r", 4, round(2 * 1 / 6, 6))
    # ancestor-descendant pair: LCA is the ancestor itself
    assert got[("a", "x")] == ("x", 1, round(2 * 2 / 5, 6))
    assert got[("r", "x")] == ("r", 1, round(2 * 1 / 3, 6))
    # isolated node shares no ancestor with anything
    assert not any("z" in p for p in got)
    # every pair in one tree appears exactly once (a<b canonical order)
    assert len(got) == 15  # C(6,2) over {r,x,y,a,b,c}


def test_semantic_similarity_dag_tiebreak(spark):
    # diamond: d has two parents x and y, both at depth 2 → two paths of
    # equal total to two distinct "lowest" ancestors; smallest id wins.
    edges = spark.createDataFrame(
        EDGES + [("d", "x"), ("d", "y")], "child string, parent string"
    )
    nodes = spark.createDataFrame(
        [(n,) for n in ["r", "x", "y", "a", "b", "c", "d"]], "node string"
    )
    got = {
        (r.node_a, r.node_b): (r.lca, r.path_len)
        for r in semantic_similarity(edges, nodes).collect()
    }
    # (c, d): via y total 2; via x impossible for c; lca = y
    assert got[("c", "d")] == ("y", 2)
    # (a, d): via x total 2 and nothing shorter; lca = x
    assert got[("a", "d")] == ("x", 2)
    # (b, d) vs (a, d) symmetric; max_path prunes long pairs
    pruned = {
        (r.node_a, r.node_b)
        for r in semantic_similarity(edges, nodes, max_path=2).collect()
    }
    assert ("a", "d") in pruned and ("a", "c") not in pruned  # path 4 cut


def test_information_content_and_lin(spark):
    edges, nodes = _dfs(spark)
    occ = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",)], "mesh_id string"
    )
    ic_df = information_content(edges, nodes, occ)
    got = {r.node: (r.freq, r.ic) for r in ic_df.collect()}
    n = 4.0
    assert got["r"] == (4, round(-math.log(4 / n), 6))  # covers everything
    assert got["x"] == (3, round(-math.log(3 / n), 6))
    assert got["a"] == (2, round(-math.log(2 / n), 6))
    assert got["b"] == (1, round(-math.log(1 / n), 6))
    assert "z" not in got  # never mentioned, no descendants mentioned

    lin = {
        (r.node_a, r.node_b): r.lin
        for r in lin_similarity(
            semantic_similarity(edges, nodes), ic_df
        ).collect()
    }
    ic_x, ic_a, ic_b = got["x"][1], got["a"][1], got["b"][1]
    assert lin[("a", "b")] == round(2 * ic_x / (ic_a + ic_b), 6)
    # pairs whose LCA is the whole-corpus root have lin = 0 (IC(r)=0)
    assert lin[("a", "c")] == 0.0
    # (r, x): IC(r)+IC(x) > 0 so defined; lca=r → 0
    assert lin[("r", "x")] == 0.0
