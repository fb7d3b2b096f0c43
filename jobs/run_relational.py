"""Relational corpus-operator battery for the scaling evidence.

Runs the pure-JVM operator set (dedup family, SimHash, text analysis,
top-k) over the fixture corpus at a given parallelism and prints one JSON
line — the whole-stage-codegen complement to the flagship KG job in
BENCH/BASELINE.md: these stages have no python workers, so their 8→32-core
scaling isolates the Spark-architecture contribution from the sandbox's
shared cache/DRAM ceiling on the numpy model kernel.

    python jobs/run_relational.py --sf 0.5 --master local[32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.5)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", default=None)
    args = ap.parse_args()

    from bran_spark.fixtures.gen import ensure, fixture_dir
    from bran_spark.functions.bpe import full_text_col
    from bran_spark.functions.text import lang_id, quality_score, token_count
    from bran_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_md5,
    )
    from bran_spark.session import get_spark

    import pyspark.sql.functions as F

    ensure(args.sf)
    spark = get_spark(
        "bran_relational",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = (
        spark.read.parquet(f"{fixture_dir(args.sf)}/documents_interleaved.parquet")
        .select("doc_id", full_text_col("spans").alias("text"))
    )

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def run(name, df, action="count"):
        t0 = time.time()
        # count() lets Catalyst prune unused aggregate expressions — right
        # for the data ops (the shuffle/hash work remains), but it would
        # optimize the cpu_dense hash chain away entirely, so single-row
        # results are collected instead
        rows[name] = len(df.collect()) if action == "collect" else df.count()
        timings[name] = round(time.time() - t0, 3)

    t_all = time.time()
    run("exact_dedup", exact_dedup_groups(docs, "doc_id", "text"))
    # xxhash64 = the scale configuration (8-byte long signatures through the
    # shuffle instead of 32-char md5 strings; md5 remains the oracle twin)
    run(
        "minhash_lsh",
        minhash_lsh_pairs(docs, "doc_id", "text", n=5, bands=8, hash_fn="xxhash64"),
    )
    run(
        "ngram_jaccard",
        ngram_jaccard_pairs(docs, "doc_id", "text", n=8, min_jaccard=0.5, max_df=100),
    )
    run("simhash_md5", simhash_md5(docs, "doc_id", "text", bits=32))
    run(
        "text_analysis",
        docs.select(
            "doc_id",
            token_count("text").alias("n_tokens"),
            F.round(quality_score("text") + F.lit(1e-9), 4).alias("quality"),
            lang_id("text").alias("lang"),
        ).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("quality"), 4).alias("avg_q"),
            F.sum("n_tokens").cast("long").alias("toks"),
        ),
    )
    run(
        "vocab_topn",
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(100),
    )
    # compute-dense control: whole-stage-codegen hash chain over range() —
    # ~zero data movement, so its 8→32-core ratio isolates the Spark
    # scheduling/codegen layer from the box's shared-DRAM ceiling (which
    # caps every data-streaming op on a single machine at the bandwidth
    # ratio, ~1.4× here — see BENCH/BASELINE.md substrate analysis)
    par = spark.sparkContext.defaultParallelism
    h = F.col("id")
    for i in range(24):
        h = F.xxhash64(h, F.lit(i))
    run(
        "cpu_dense",
        spark.range(0, 1_000_000_000, 1, par * 2)
        .select(h.alias("h"))
        .agg(F.sum(F.col("h") % 7).alias("s")),
        action="collect",
    )
    wall = round(time.time() - t_all, 3)

    print(
        json.dumps(
            {
                "wall_s": wall,
                "sf": args.sf,
                "master": args.master,
                "ops": timings,
                "rows": rows,
                "docs_per_sec": round(rows.get("simhash_md5", 0) * 5 / max(wall, 1e-9), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
