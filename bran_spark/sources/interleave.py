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


def validate_interleaved(
    docs: DataFrame,
    spans_col: str = "spans",
    text_kinds: tuple = ("title", "body"),
    known_kinds: tuple = ("title", "body", "image", "audio", "video"),
) -> DataFrame:
    """Input-contract audit for the interleaved document shape
    (BASELINE.json input_hint) — the operator form of the invariants the
    test suite asserts on fixtures, runnable against any INCOMING feed
    before it reaches the pipeline. Long-form report
    (rule, n_checked, n_violations):

      offset_arithmetic — per doc with ≥1 text span: every text span's
        offset equals the accumulated length of the text spans before it
        (+1 separator each) — the invariant the whole span-alignment
        stack (J5/X2) relies on; violations counted in DOCS.
      media_shape — media spans carry a non-empty media_ref and no text.
      text_shape  — text spans carry text and no media_ref.
      kind_known  — every span kind is in the declared enum.

    The offset check is a row-local array fold (zero shuffles); the
    span-shape checks are one explode + one global conditional-sum
    aggregate. Two column-pruned scans total at any corpus size."""
    tk = ", ".join(f"'{k}'" for k in text_kinds)
    ok = F.expr(
        f"aggregate(filter({spans_col}, s -> s.kind IN ({tk})),"
        " named_struct('pos', 0, 'ok', true),"
        " (acc, s) -> named_struct('pos', acc.pos + length(s.text) + 1,"
        " 'ok', acc.ok AND s.offset = acc.pos)).ok"
    )
    has_text = F.expr(f"size(filter({spans_col}, s -> s.kind IN ({tk}))) > 0")
    r1 = docs.where(has_text).agg(
        F.lit("offset_arithmetic").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.coalesce(F.sum(F.when(ok, 0).otherwise(1)), F.lit(0))
        .cast("long")
        .alias("n_violations"),
    )
    sp = docs.select(F.explode(spans_col).alias("s")).select(
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("mref"),
    )
    bad_media = (
        (F.col("text") != "") | F.col("mref").isNull() | (F.col("mref") == "")
    )
    r2 = sp.where(~F.col("kind").isin(*text_kinds)).agg(
        F.lit("media_shape").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.coalesce(F.sum(F.when(bad_media, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_violations"),
    )
    bad_text = (
        (F.col("mref") != "") | F.col("text").isNull() | (F.col("text") == "")
    )
    r3 = sp.where(F.col("kind").isin(*text_kinds)).agg(
        F.lit("text_shape").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.coalesce(F.sum(F.when(bad_text, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_violations"),
    )
    r4 = sp.agg(
        F.lit("kind_known").alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.coalesce(
            F.sum(F.when(~F.col("kind").isin(*known_kinds), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_violations"),
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4)
