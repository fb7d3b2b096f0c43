"""Entity linking / canonicalization (SURVEY.md §2 J4; north_star mandate).

In the reference, mentions arrive pre-linked to MeSH ids from PubTator
(paper §3); canonicalization is therefore thin there. The north_rule makes it
a first-class stage: mention → canonical entity record via a broadcast
dictionary join, with unlinkable mentions quarantined instead of dropped
silently (lineage/counter requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_mentions(mentions: DataFrame, mesh_dict: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (linked, unlinked).

    linked  = mentions + canonical_name (+ entity type revalidated)
    unlinked = mentions whose mesh_id is absent from the dictionary —
    quarantined for the lineage counters, mirroring the reference's drop of
    '-1' unlinkable ids (SURVEY.md §2 F2) but without losing the rows.
    """
    dim = F.broadcast(
        mesh_dict.select("mesh_id", "canonical_name", F.col("type").alias("dict_type"))
    )
    j = mentions.join(dim, "mesh_id", "left")
    linked = j.where(F.col("canonical_name").isNotNull()).drop("dict_type")
    unlinked = j.where(F.col("canonical_name").isNull()).drop(
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
