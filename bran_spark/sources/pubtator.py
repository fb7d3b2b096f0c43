"""PubTator corpus source (SURVEY.md §2 S1).

Reference parity: bran's processing ingests BioCreative V CDR files in
PubTator format (reference: bin/process_CDR/, src/processing/utils/
process_CDR_data.py — reconstructed, SURVEY.md §0; format per paper §3):

    <pmid>|t|<title>
    <pmid>|a|<abstract>
    <pmid>\\t<start>\\t<end>\\t<surface>\\t<type>\\t<mesh_id>
    <pmid>\\tCID\\t<chem_mesh>\\t<dis_mesh>
    (blank line between documents)

Spark-first design: ``spark.read.text(..., wholetext=True)`` (one row per
file — PubTator files are the natural split unit) → an Arrow-batched
``mapInPandas`` block parser emitting three outputs in one pass, encoded as
a single long-format DataFrame filtered per consumer. Composite MeSH ids
(``D001|D002``) are split (F3) and unlinkable ``-1`` ids dropped (F2)
downstream, matching standard CDR processing.

Offsets: PubTator annotation offsets index into title + ' ' + abstract,
which is exactly the pipeline's ``full_text`` convention, so parsed docs
flow into the DAG unchanged.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Window, DataFrame, SparkSession
from pyspark.sql import functions as F

PARSED_SCHEMA = (
    "doc_id string, kind string, title string, abstract string, "
    "start int, end int, text string, type string, mesh_id string, "
    "chem_mesh string, dis_mesh string"
)


def _parse_block(block: str) -> list[dict]:
    rows: list[dict] = []
    pmid, title, abstract = None, "", ""
    anns, rels = [], []
    for line in block.strip().splitlines():
        # classify by the EXACT second |-field, not substring presence —
        # an abstract whose text contains "|t|" must not be re-parsed as a
        # title line (title/abstract text may contain any characters)
        head = line.split("|", 2)
        if len(head) == 3 and head[0].isdigit() and head[1] == "t":
            pmid, _, title = head
        elif len(head) == 3 and head[0].isdigit() and head[1] == "a":
            pmid, _, abstract = head
        elif "\t" in line:
            parts = line.split("\t")
            if len(parts) >= 6:
                anns.append(parts[:6])
            elif len(parts) == 4 and parts[1] == "CID":
                rels.append(parts)
    if pmid is None:
        return rows
    rows.append(
        {
            "doc_id": pmid, "kind": "doc", "title": title, "abstract": abstract,
            "start": None, "end": None, "text": None, "type": None,
            "mesh_id": None, "chem_mesh": None, "dis_mesh": None,
        }
    )
    for p, s, e, surf, typ, mesh in anns:
        rows.append(
            {
                "doc_id": p, "kind": "mention", "title": None, "abstract": None,
                "start": int(s), "end": int(e), "text": surf, "type": typ,
                "mesh_id": mesh, "chem_mesh": None, "dis_mesh": None,
            }
        )
    for p, _, c, d in rels:
        rows.append(
            {
                "doc_id": p, "kind": "relation", "title": None, "abstract": None,
                "start": None, "end": None, "text": None, "type": None,
                "mesh_id": None, "chem_mesh": c, "dis_mesh": d,
            }
        )
    return rows


def parse_pubtator(spark: SparkSession, path: str) -> DataFrame:
    """Parse PubTator file(s) into the long-format PARSED_SCHEMA frame."""
    raw = spark.read.text(path, wholetext=True)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for content in pdf["value"]:
                # normalize CRLF first: a Windows-saved corpus otherwise
                # never splits on "\n\n" and collapses to one block whose
                # per-doc title/abstract overwrite each other
                for block in content.replace("\r\n", "\n").split("\n\n"):
                    rows.extend(_parse_block(block))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "title", "abstract", "start", "end",
                    "text", "type", "mesh_id", "chem_mesh", "dis_mesh",
                ],
            )

    return raw.mapInPandas(fn, PARSED_SCHEMA)


def pubtator_tables(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(documents_interleaved, mentions, gold_relations) from PubTator files.

    documents: title span + one body span, offsets per the full_text
    convention. mentions: composite ids exploded (F3), '-1' dropped (F2),
    mention_id = '<pmid>#<ordinal by start>'.
    """
    parsed = parse_pubtator(spark, path)
    docs = parsed.where(F.col("kind") == "doc").select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("title").alias("kind"),
                F.col("title").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("body").alias("kind"),
                F.col("abstract").alias("text"),
                F.lit("").alias("media_ref"),
                (F.length("title") + F.lit(1)).cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    mentions = (
        parsed.where(F.col("kind") == "mention")
        .withColumn("mesh_id", F.explode(F.split("mesh_id", r"\|")))  # F3
        .where(F.col("mesh_id") != "-1")                              # F2
        .where(F.col("type").isin("Chemical", "Disease"))             # F1
    )
    w_id = F.concat_ws(
        "#",
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("start", "end", "mesh_id"))
        .cast("string"),
    )
    mentions = mentions.select(
        "doc_id", w_id.alias("mention_id"), "type", "mesh_id", "start", "end", "text"
    )
    relations = parsed.where(F.col("kind") == "relation").select(
        "doc_id", F.lit("CID").alias("rel_type"), "chem_mesh", "dis_mesh"
    )
    return docs, mentions, relations
