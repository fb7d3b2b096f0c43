"""Fixture-generator invariants (SURVEY.md §5.2.3): exact offsets by
construction — the property the whole span-alignment stack relies on."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_span_offset_invariant(spark, fx_dir):
    docs = spark.read.parquet(f"{fx_dir}/documents_interleaved.parquet")
    chk = docs.selectExpr(
        "aggregate(filter(spans, s -> s.text != ''), named_struct('pos', 0, 'ok', true),"
        " (acc, s) -> named_struct('pos', acc.pos + length(s.text) + 1,"
        " 'ok', acc.ok AND s.offset = acc.pos)).ok AS ok"
    )
    assert chk.filter("NOT ok").count() == 0


def test_mention_offsets_exact(spark, fx_dir):
    docs = spark.read.parquet(f"{fx_dir}/documents_interleaved.parquet")
    m = spark.read.parquet(f"{fx_dir}/mentions.parquet")
    bad = (
        m.join(docs, "doc_id")
        .selectExpr(
            "substring(array_join(transform(filter(spans, s -> s.text != ''),"
            " s -> s.text), ' '), start + 1, `end` - start) AS cut",
            "text",
        )
        .filter("cut != text")
    )
    assert bad.count() == 0


def test_media_spans_present(spark, fx_dir):
    docs = spark.read.parquet(f"{fx_dir}/documents_interleaved.parquet")
    media = docs.selectExpr("explode(spans) AS s").filter("s.media_ref != ''")
    assert media.count() > 0
    assert media.filter("s.text != ''").count() == 0  # media spans carry no text


def test_generator_deterministic(tmp_path):
    """Same seed + sf ⇒ bit-identical logical content across regenerations."""
    import duckdb

    from bran_spark.fixtures.gen import generate

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    generate(0.001, d1, docs=60)
    generate(0.001, d2, docs=60)
    con = duckdb.connect()
    for t in ["documents_interleaved", "mentions", "gold_relations", "mesh_dict"]:
        n = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM '{d1}/{t}.parquet' EXCEPT"
            f" SELECT * FROM '{d2}/{t}.parquet')"
        ).fetchone()[0]
        assert n == 0, t


def test_gold_relations_reference_present_entities(spark, fx_dir):
    """Every gold CID pair names entities actually mentioned in its doc."""
    m = spark.read.parquet(f"{fx_dir}/mentions.parquet").select("doc_id", "mesh_id").distinct()
    g = spark.read.parquet(f"{fx_dir}/gold_relations.parquet")
    missing_chem = g.join(
        m.withColumnRenamed("mesh_id", "chem_mesh"), ["doc_id", "chem_mesh"], "left_anti"
    ).count()
    missing_dis = g.join(
        m.withColumnRenamed("mesh_id", "dis_mesh"), ["doc_id", "dis_mesh"], "left_anti"
    ).count()
    assert missing_chem == 0 and missing_dis == 0
