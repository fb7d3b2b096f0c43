"""Entity linking / canonicalization (SURVEY.md §2 J4; north_star mandate).

In the reference, mentions arrive pre-linked to MeSH ids from PubTator
(paper §3); canonicalization is therefore thin there. The north_rule makes it
a first-class stage: mention → canonical entity record via a broadcast
dictionary join, with unlinkable mentions quarantined instead of dropped
silently (lineage/counter requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_mentions(mentions: DataFrame, mesh_dict: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (linked, unlinked).

    linked  = mentions + canonical_name, entity type REVALIDATED against
    the dictionary: a mention whose type contradicts its resolved entity's
    type (e.g. a 'Chemical' mention whose mesh id is a Disease entry) is
    quarantined, not passed through — type-inconsistent rows would
    otherwise flow straight into pair generation.
    unlinked = mentions whose mesh_id is absent from the dictionary OR
    type-contradictory — quarantined for the lineage counters, mirroring
    the reference's drop of '-1' unlinkable ids (SURVEY.md §2 F2) but
    without losing the rows.
    """
    dim = F.broadcast(
        mesh_dict.select("mesh_id", "canonical_name", F.col("type").alias("dict_type"))
    )
    j = mentions.join(dim, "mesh_id", "left")
    ok = F.col("canonical_name").isNotNull() & (
        F.col("type") == F.col("dict_type")
    )
    linked = j.where(ok).drop("dict_type")
    unlinked = j.where(~ok | F.col("canonical_name").isNull()).drop(
        "canonical_name", "dict_type"
    )
    return linked, unlinked


def canonical_triples(triples: DataFrame, mesh_dict: DataFrame) -> DataFrame:
    """Attach canonical names to (subj, pred, obj) triples — two broadcast
    joins against the same dimension; Catalyst reuses the broadcast exchange."""
    dim_s = F.broadcast(
        mesh_dict.select(
            F.col("mesh_id").alias("subj"), F.col("canonical_name").alias("subj_name")
        )
    )
    dim_o = F.broadcast(
        mesh_dict.select(
            F.col("mesh_id").alias("obj"), F.col("canonical_name").alias("obj_name")
        )
    )
    return triples.join(dim_s, "subj", "left").join(dim_o, "obj", "left")


def canonical_surface_forms(mentions: DataFrame) -> DataFrame:
    """Surface-form resolution: for each entity, its most frequent mention
    text in the corpus — the canonicalization signal when no curated
    dictionary name exists (the inverse of link_mentions, which assumes
    one). Returns (mesh_id, surface, n_mentions).

    Two-phase: count by (mesh_id, text) with map-side partial agg (the only
    corpus-sized shuffle, doc-count independent), then an argmax window over
    the already-aggregated table — deterministic tie-break on the surface
    string so reruns pick the same canonical form.
    """
    counts = mentions.groupBy("mesh_id", "text").agg(
        F.count(F.lit(1)).alias("n_mentions")
    )
    w = Window.partitionBy("mesh_id").orderBy(F.desc("n_mentions"), F.asc("text"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("mesh_id", F.col("text").alias("surface"), "n_mentions")
    )


def name_neardup_pairs(
    entities: DataFrame,
    id_col: str = "mesh_id",
    name_col: str = "canonical_name",
    n: int = 3,
    min_jaccard: float = 0.4,
    max_df: int = 200,
) -> DataFrame:
    """Entity-dictionary resolution candidates: pairs of entities whose
    NAMES are near-duplicates by character-trigram Jaccard — the blocking +
    verify step of entity resolution (two dictionary entries that are
    plausibly the same real-world entity under spelling variation).

    Same scale shape as document near-dup (dedup.ngram_jaccard_pairs, which
    this parameterizes with a char-shingler): inverted index on trigrams,
    broadcast-anti df-cut of the hot trigrams (trigrams are FAR hotter than
    word 8-grams — the cut is what keeps the candidate join subquadratic),
    exact Jaccard verify. Returns (id_a, id_b, jaccard), id_a < id_b."""
    from bran_spark.functions.text import char_shingles
    from bran_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        entities.select(id_col, name_col),
        id_col,
        name_col,
        n=n,
        min_jaccard=min_jaccard,
        max_df=max_df,
        shingler=char_shingles,
    )


def truth_discovery(
    claims: DataFrame,
    iters: int = 2,
    source_col: str = "source",
    key_col: str = "key",
    value_col: str = "value",
    checkpoint: bool = False,
) -> DataFrame:
    """Conflict resolution for functional attributes by iterated
    source-trust voting (Sums / TruthFinder-lite): when heterogeneous
    sources assert different values for the same (entity, attribute) key,
    alternate between value confidence (trust-weighted vote share within
    the key) and source trust (mean confidence of the source's claims),
    then emit the arg-max value per key with its final confidence. This is
    the fusion step between extraction and the canonical triple sink —
    majority vote weighted by how often each source agrees with the
    emerging consensus, so a feed that is wrong everywhere stops outvoting
    two reliable feeds that agree.

    Every round is two key-partitioned aggregates plus one tiny
    source-keyed aggregate (trust is one row per source — broadcast onto
    the claims at the next round's attach). All reductions are ROUND(.,6)-
    ed at round boundaries so float summation order cannot leak into the
    cross-engine hash; the final arg-max breaks exact confidence ties by
    value string, deterministically.

    ``checkpoint=True`` lineage-truncates the per-round trust table (and
    the distinct claim set, re-read twice per round) so round N's plan
    never nests the full DAG of rounds 1..N-1 — use it for deep ``iters``
    on a real cluster. Default off: at the default 2 rounds the measured
    single-box wall is ~20% better lazy (5.0 s vs 6.2 s median-of-3 at
    sf0.1), the same lazy-beats-materialize result as rule_inference.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    c = claims.select(
        F.col(source_col).alias("source"),
        F.col(key_col).alias("key"),
        F.col(value_col).alias("value"),
    ).distinct()
    if checkpoint:
        c = c.localCheckpoint(eager=True)
    trust = c.select("source").distinct().withColumn(
        "trust", F.lit(1.0)
    )
    conf = None
    for _ in range(iters):
        vote = (
            c.join(F.broadcast(trust), "source")
            .groupBy("key", "value")
            .agg(F.round(F.sum("trust"), 6).alias("vote"))
        )
        tot = vote.groupBy("key").agg(F.round(F.sum("vote"), 6).alias("tot"))
        conf = vote.join(tot, "key").select(
            "key", "value", F.round(F.col("vote") / F.col("tot"), 6).alias("conf")
        )
        # one tiny row-per-source table — the broadcast payload of the
        # next round; checkpointing it caps the conf->trust->conf plan
        # recursion when iters is deep
        trust = (
            c.join(conf, ["key", "value"])
            .groupBy("source")
            .agg(F.round(F.avg("conf"), 6).alias("trust"))
        )
        if checkpoint:
            trust = trust.localCheckpoint(eager=True)
    w = Window.partitionBy("key").orderBy(
        F.col("conf").desc(), F.col("value").desc()
    )
    return (
        conf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("key", "value", F.col("conf").alias("confidence"))
    )


def blocking_pairs(
    records: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_block: int = 20,
    n: int = 1,
) -> DataFrame:
    """Token blocking + CBS meta-blocking for entity resolution
    (Papadakis et al., TKDE'14 family): every distinct token ``n``-gram a
    record contains is a block (n=1 is classic token blocking; raise n
    when the vocabulary is too small for unigrams to discriminate —
    every blocking key then lands either purged-hot or singleton);
    records sharing a block become candidate pairs
    weighted by Common Block Scheme (number of shared blocks); weighted
    node pruning then keeps a pair only if its weight reaches the mean
    pair weight of EITHER endpoint. The blocking-graph complement to
    name_neardup_pairs' string-similarity verify — this one never
    compares strings, it prunes purely on co-occurrence structure.

    Scale shape: the block-size pass is the df-cut — blocks larger than
    ``max_block`` are purged BEFORE pair generation (a stop-word block of
    10^6 records would otherwise contribute 10^12 pairs; purging huge
    blocks is the standard blocking move and loses only signal-free
    pairs), singleton blocks are skipped (no pairs). Pair generation is
    a same-key self-join bounded by max_block per block; CBS is one pair
    aggregate; the node-mean attach is two node-keyed shuffle joins
    (node table can be corpus-scale — never broadcast).

    Returns (id_a, id_b, cbs) with id_a < id_b, kept pairs only.
    """
    from bran_spark.functions.text import shingles, words

    keys = words(text_col) if n == 1 else shingles(text_col, n)
    tok = (
        records.select(
            F.col(id_col).alias("rid"),
            F.explode(keys).alias("w"),
        )
        .where(F.col("w") != "")
        .distinct()
    )
    bs = tok.groupBy("w").agg(F.count(F.lit(1)).alias("b"))
    keep = tok.join(
        bs.where((F.col("b") <= max_block) & (F.col("b") >= 2)), "w"
    ).select("rid", "w")
    pairs = (
        keep.alias("l")
        .join(
            keep.alias("r"),
            (F.col("l.w") == F.col("r.w"))
            & (F.col("l.rid") < F.col("r.rid")),
        )
        .groupBy(
            F.col("l.rid").alias("id_a"), F.col("r.rid").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cbs"))
    )
    ends = pairs.select(F.col("id_a").alias("node"), "cbs").unionByName(
        pairs.select(F.col("id_b").alias("node"), "cbs")
    )
    nodeavg = ends.groupBy("node").agg(
        F.round(F.avg("cbs"), 6).alias("avgw")
    )
    return (
        pairs.join(
            nodeavg.withColumnRenamed("node", "id_a").withColumnRenamed(
                "avgw", "avg_a"
            ),
            "id_a",
        )
        .join(
            nodeavg.withColumnRenamed("node", "id_b").withColumnRenamed(
                "avgw", "avg_b"
            ),
            "id_b",
        )
        .where(
            (F.col("cbs") >= F.col("avg_a")) | (F.col("cbs") >= F.col("avg_b"))
        )
        .select("id_a", "id_b", "cbs")
    )
