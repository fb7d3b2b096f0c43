"""spark-submit entry for the DATASET CARD — the governance datasheet
(Gebru et al., "Datasheets for Datasets") a training corpus ships with:

    composition (docs, sources, languages, length quantiles) →
    quality profile (score quantiles, token stats) →
    duplication (exact-dup rate) →
    governance (PII census, k-anonymity verdict, column profile) →
    one JSON document + one stats line.

    spark-submit --master local[8] jobs/run_datacard.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/datacard.json

Every section reuses a registered, oracle-checked operator (q32/q33
quality + token stats, q27 exact dedup, q230 pii_scan, q229 k-anonymity,
q238 column profile, q36 lang-id) — the card is a COMPOSITION, not new
math, so its numbers agree with the audits a reviewer would run
one-by-one. Each section is one aggregate over the corpus; sections are
independent (no chained lineage), so the job runs in a handful of scans
regardless of corpus size.
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
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    ap.add_argument("--out", default=None, help="JSON output path")
    ap.add_argument("--master", default=None)
    ap.add_argument("--k-anon", type=int, default=15)
    ap.add_argument(
        "--checkpoint-root", default=None,
        help="commit each card section's (tiny) result table as a "
             "manifest-parquet snapshot; a rerun recomputes only sections "
             "whose commit is missing or config-stale — each section is "
             "its own corpus pass, so a kill mid-card loses nothing done",
    )
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from bran_spark.functions.text import quality_score, token_count
    from bran_spark.operators.contracts import (
        k_anonymity_audit,
        pii_scan,
        profile_columns,
    )
    from bran_spark.operators.dedup import exact_dedup_groups
    from bran_spark.session import get_spark

    t0 = time.time()
    spark = get_spark(
        "bran_datacard", master=args.master or "local[8]",
        shuffle_partitions="16",
    )
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    # optional per-section checkpoint commits: every section is an
    # independent corpus pass producing a tiny result table, so each
    # commits separately and a rerun recomputes only what's missing or
    # config-stale (north_rule kill-safety for the composed card job)
    tio = None
    resumed_sections: list[str] = []
    if args.checkpoint_root:
        from bran_spark.sources.tableio import ManifestParquetTableIO

        tio = ManifestParquetTableIO(args.checkpoint_root)
    sec_cfg = {"sf_dir": args.sf_dir, "k_anon": args.k_anon}

    def _section(table, build):
        if tio is None:
            return build()
        if tio.exists_valid(table, sec_cfg):
            resumed_sections.append(table)
        else:
            tio.write(build(), table, stage=table, config=sec_cfg)
        return tio.read(spark, table)

    card: dict = {"sf_dir": args.sf_dir}

    comp = _section(
        "dc_composition",
        lambda: docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("lang").alias("n_langs"),
            F.expr(
                "percentile_approx(n_chars, array(0.5, 0.9, 0.99), 10000)"
            ).alias("len_q"),
            F.sum(token_count("text")).alias("n_tokens"),
        ),
    ).head()
    card["composition"] = {
        "n_docs": comp.n_docs,
        "n_sources": comp.n_sources,
        "n_langs": comp.n_langs,
        "len_chars_p50_p90_p99": [float(x) for x in (comp.len_q or [])],
        "n_tokens_ws": int(comp.n_tokens or 0),
    }
    card["mix"] = {
        r.source: r.n
        for r in _section(
            "dc_mix",
            lambda: docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")),
        ).collect()
    }

    qq = _section(
        "dc_quality",
        lambda: docs.select(quality_score("text").alias("q")).agg(
            F.expr(
                "percentile_approx(q, array(0.1, 0.5, 0.9), 10000)"
            ).alias("qq")
        ),
    ).head()
    card["quality_score_p10_p50_p90"] = [
        round(float(x), 6) for x in (qq.qq or [])
    ]

    dup = _section(
        "dc_dup",
        lambda: exact_dedup_groups(docs, "doc_id", "text").agg(
            F.sum(F.col("n_dups") - 1).alias("extra"),
            F.sum("n_dups").alias("total"),
        ),
    ).head()
    card["exact_dup_rate"] = round(
        float((dup.extra or 0) / dup.total) if dup.total else 0.0, 6
    )

    card["pii"] = sorted(
        (
            {
                "group": r.grp,
                "pattern": r.pattern,
                "n_docs_hit": r.n_docs_hit,
                "doc_rate": r.doc_rate,
            }
            for r in _section(
                "dc_pii", lambda: pii_scan(docs, "text", "source")
            ).collect()
        ),
        key=lambda d: (d["group"], d["pattern"]),
    )
    ka = _section(
        "dc_kanon",
        lambda: k_anonymity_audit(docs, ["lang", "source"], k=args.k_anon),
    ).head()
    card["k_anonymity"] = {
        "qi": ["lang", "source"],
        "k": args.k_anon,
        "min_group_size": ka.min_group_size,
        "violating_share": ka.violating_share,
        "satisfied": bool(ka.k_satisfied),
    }
    card["columns"] = sorted(
        (
            {
                "col": r.col,
                "null_rate": r.null_rate,
                "n_distinct": r.n_distinct,
                "top_value": r.top_value,
                "top_share": r.top_share,
            }
            for r in _section(
                "dc_columns", lambda: profile_columns(docs, ["lang", "source"])
            ).collect()
        ),
        key=lambda d: d["col"],
    )

    if tio is not None:
        card["resumed_sections"] = resumed_sections
    card["wall_sec"] = round(time.time() - t0, 3)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(card, f, indent=2, sort_keys=True)
    print(json.dumps({"metric": "datacard", **{
        "n_docs": card["composition"]["n_docs"],
        "exact_dup_rate": card["exact_dup_rate"],
        "k_anonymity_ok": card["k_anonymity"]["satisfied"],
        "wall_sec": card["wall_sec"],
    }}))
    spark.stop()


if __name__ == "__main__":
    main()
