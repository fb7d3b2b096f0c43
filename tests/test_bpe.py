"""BPE codec + tokenizer UDF (X1): round-trip, offsets, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from bran_spark.functions.bpe import EOW, full_text_col, load_codec, tokenize_words, with_tokens


def _codec(spark, fx_dir):
    return load_codec(spark, f"{fx_dir}/bpe_merges.parquet", f"{fx_dir}/vocab.parquet")


def test_roundtrip_words(spark, fx_dir):
    codec = _codec(spark, fx_dir)
    for w in ["nanolve", "guvolve", "spark", "customer", "zzzqqq", "a", "x9"]:
        toks = codec.encode_word(w)
        joined = "".join(t for t, _ in toks)
        assert joined == w + EOW
        assert all(tid >= 1 for _, tid in toks)  # never <pad>


def test_unknown_symbols_map_to_unk(spark, fx_dir):
    codec = _codec(spark, fx_dir)
    # tokenize_words strips non-alnum, so codec only ever sees [a-z0-9]
    assert tokenize_words("Hello, WORLD!") == [("hello", 0, 5), ("world", 7, 12)]


def test_tokens_offsets_align(spark, fx_dir):
    docs = spark.read.parquet(f"{fx_dir}/documents_interleaved.parquet").limit(50)
    codec_bc = spark.sparkContext.broadcast(_codec(spark, fx_dir))
    toks = with_tokens(docs.withColumn("full_text", full_text_col()), codec_bc)
    # every token's char range cuts a substring its word starts with
    bad = toks.selectExpr(
        "size(filter(tokens, t -> substring(full_text, t.start + 1, t.end - t.start)"
        " NOT RLIKE '^[a-z0-9]+$')) AS n_bad"
    ).agg(F.sum("n_bad")).head()[0]
    assert bad == 0
    # word sequence reconstructible: distinct word_idx count == words size
    mism = toks.selectExpr(
        "size(words) AS nw",
        "size(array_distinct(transform(tokens, t -> t.word_idx))) AS nwi",
    ).filter("nw != nwi")
    assert mism.count() == 0


def test_deterministic_across_runs(spark, fx_dir):
    docs = spark.read.parquet(f"{fx_dir}/documents_interleaved.parquet").limit(30)
    codec_bc = spark.sparkContext.broadcast(_codec(spark, fx_dir))
    d = docs.withColumn("full_text", full_text_col())
    a = with_tokens(d, codec_bc).select("doc_id", "tokens")
    b = with_tokens(d, codec_bc).select("doc_id", "tokens")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_token_arrays_match_struct_form(spark, fx_dir):
    """The lean scoring-path tokenizer (int arrays) must agree exactly with
    the full struct form: same ids, same char starts, same F4-cap prefix."""
    from bran_spark.functions.bpe import (
        full_text_col,
        load_codec,
        with_token_arrays,
        with_tokens,
    )
    import pyspark.sql.functions as F

    codec_bc = spark.sparkContext.broadcast(
        load_codec(spark, f"{fx_dir}/bpe_merges.parquet", f"{fx_dir}/vocab.parquet")
    )
    docs = (
        spark.read.parquet(f"{fx_dir}/documents_interleaved.parquet")
        .limit(100)
        .withColumn("full_text", full_text_col("spans"))
    )
    cap = 64
    full = with_tokens(docs, codec_bc).select(
        "doc_id",
        F.expr(f"transform(slice(tokens, 1, {cap}), t -> t.tok_id)").alias("tok_ids"),
        F.expr(f"transform(slice(tokens, 1, {cap}), t -> t.start)").alias("tok_starts"),
    )
    lean = with_token_arrays(docs, codec_bc, max_tokens=cap).select(
        "doc_id", "tok_ids", "tok_starts"
    )
    assert full.exceptAll(lean).count() == 0
    assert lean.exceptAll(full).count() == 0
