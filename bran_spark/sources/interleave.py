"""Adapter: plain text table → ``documents_interleaved`` (BASELINE.json shape).

Pure JVM-side array expressions (no Python): the plain text is word-split,
chunked into a title span + fixed-size body spans, offsets accumulated with
``aggregate`` so the span invariant (offset_i = len of join of previous text
spans + separating spaces) holds by construction. Even-keyed docs get one
trailing media span to keep the corpus genuinely interleaved.

This is how the engine ingests any plain corpus (e.g. the driver's
``documents.parquet``) into the pipeline's mandated input shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interleave_documents(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    title_words: int = 6,
    body_words: int = 12,
) -> DataFrame:
    """Returns (doc_id string, spans array<struct<kind,text,media_ref,offset>>)."""
    chunks_expr = f"""
    transform(
      sequence(0, greatest(int(ceil((size(_words) - {title_words}) / {body_words}.0)), 0)),
      i -> CASE WHEN i = 0
            THEN named_struct('kind', 'title',
                              'text', array_join(slice(_words, 1, {title_words}), ' '))
            ELSE named_struct('kind', 'body',
                              'text', array_join(
                                slice(_words, {title_words} + 1 + (i-1) * {body_words},
                                      {body_words}), ' '))
           END)
    """
    spans_expr = """
    aggregate(
      _chunks,
      named_struct('pos', 0, 'acc',
                   cast(array() as array<struct<kind:string,text:string,media_ref:string,offset:int>>)),
      (st, c) -> named_struct(
          'pos', st.pos + length(c.text) + 1,
          'acc', array_append(st.acc,
                 named_struct('kind', c.kind, 'text', c.text,
                              'media_ref', '', 'offset', st.pos))),
      st -> CASE WHEN _has_media
            THEN array_append(st.acc,
                 named_struct('kind', 'image', 'text', '',
                              'media_ref', concat('blob://plain/', _docid),
                              'offset', st.pos))
            ELSE st.acc END)
    """
    return (
        docs.select(
            F.col(doc_id_col).cast("string").alias("_docid"),
            F.split(F.lower(F.col(text_col)), " +").alias("_words"),
        )
        .withColumn("_chunks", F.expr(chunks_expr))
        .withColumn("_has_media", F.expr("pmod(crc32(_docid), 2) = 0"))
        .select(
            F.col("_docid").alias("doc_id"),
            F.expr(spans_expr).alias("spans"),
        )
    )


# A seeded entity world over the driver testdata vocabulary, so the flagship
# KG pipeline runs end-to-end on /root/testdata documents: half the common
# corpus words act as Chemicals, half as Diseases, with a small hypernym
# forest. Deterministic constants — no data-dependent state.
PLAIN_CHEMICALS = ["spark", "hash", "join", "merge", "filter", "sort", "batch", "vector"]
PLAIN_DISEASES = ["window", "stream", "table", "query", "group", "scan", "agg", "row"]
PLAIN_PARENTS = {"merge": "join", "filter": "sort", "stream": "window", "scan": "table"}


def plain_mesh_dict(spark) -> DataFrame:
    import pandas as pd

    rows = []
    for i, w in enumerate(PLAIN_CHEMICALS):
        parent = PLAIN_PARENTS.get(w)
        pid = (
            [f"KC{PLAIN_CHEMICALS.index(parent):04d}"] if parent in PLAIN_CHEMICALS else []
        )
        rows.append((f"KC{i:04d}", w, "Chemical", [w], pid, pid))
    for i, w in enumerate(PLAIN_DISEASES):
        parent = PLAIN_PARENTS.get(w)
        pid = (
            [f"KD{PLAIN_DISEASES.index(parent):04d}"] if parent in PLAIN_DISEASES else []
        )
        rows.append((f"KD{i:04d}", w, "Disease", [w], pid, pid))
    # pandas -> Arrow -> LocalRelation: a broadcastable local table, NOT a
    # python-RDD scan (ExistingRDD disables codegen and re-runs py4j per use)
    pdf = pd.DataFrame(
        rows,
        columns=["mesh_id", "canonical_name", "type", "synonyms", "parents", "ancestors"],
    )
    return spark.createDataFrame(
        pdf,
        "mesh_id string, canonical_name string, type string, "
        "synonyms array<string>, parents array<string>, ancestors array<string>",
    )
