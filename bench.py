"""Driver benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the full KG-construction DAG on the seeded CDR-shaped corpus at
the matching scale (the reference task), plus the heavy relational/corpus
operators over the driver testdata. Each query timed to completion of a
count() (full materialization of the plan).

The driver records only the LAST 2000 characters of stdout and parses the
final line as JSON (BENCH_r03/r04 show `parsed: null` because the full-name
queries dict outgrew that buffer). The printed line therefore uses the
unique `qNN` prefix as each query key (q01..q247 — prefixes are unique by
construction; see INDEX.md for the name mapping) and is asserted to fit the
buffer. The full-name timings are written to BENCH/bench_full.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_of(d: str) -> float:
    try:
        return float(d.rstrip("/").rsplit("/", 1)[-1].replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    from bran_spark.fixtures.gen import ensure, fixture_dir
    from bran_spark.plans.oracle_queries import QUERIES
    from bran_spark.plans.pipeline import flagship
    from bran_spark.session import get_spark

    sf = _sf_of(SF_DIR)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    ensure(sf)
    spark = get_spark(
        "bran_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(8, int(cpus) * 2)),
    )

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # headline: the flagship KG DAG on the CDR-shaped corpus at this scale.
    # One UNTIMED warm-up run then median-of-3: a single cold sample mixes
    # JVM/codegen warm-up and host-contention noise into the headline (round
    # 2's artifact reported a 39% "regression" that three controlled reruns
    # showed to be exactly that), while the median of warm runs tracks the
    # steady-state throughput a long job actually sees.
    # Median-of-5: the r4 driver sample's 3 runs spread 17.2–21.1 s under
    # host contention; two more samples stabilize the median for ~35 s cost.
    triples = flagship(spark, fixture_dir(sf)).count()  # warm-up, untimed
    flagship_runs = []
    for _ in range(5):
        t0 = time.time()
        triples = flagship(spark, fixture_dir(sf)).count()
        flagship_runs.append(round(time.time() - t0, 3))
    timings["kg_flagship"] = sorted(flagship_runs)[2]
    extras["kg_flagship_runs"] = flagship_runs
    extras["kg_triples"] = triples
    extras["kg_triples_per_sec"] = round(triples / timings["kg_flagship"], 1)

    bench_queries = [
        "q01_pricing_summary",
        "q03_star_join",
        "q06_topk_per_group",
        "q07_running_sum",
        "q16_time_window",
        "q18_lse_pooling",
        "q20_pair_generation",
        "q23_triple_dedup_support",
        "q28_dedup_ngram_jaccard",
        "q29_dedup_minhash_lsh",
        "q30_sim_topk_cosine",
        "q32_quality_score",
        "q37_salted_distinct",
        "q41_asof_join",
        "q42_sim_ivf",
        "q43_sessionize",
        "q44_percentiles",
        "q45_window_funcs",
        "q35_embedding_neardup",
        "q46_media_features",
        "q49_ivf_multiprobe",
        "q50_dedup_components",
        "q52_repetition_stats",
        "q53_bm25_search",
        "q54_token_packing",
        "q55_ann_knn_join",
        "q56_pagerank",
        "q57_triangle_counts",
        "q59_tfidf_terms",
        "q60_ngram_dup_stats",
        "q61_stratified_sample",
        "q66_ancestor_closure",
        "q67_merge_latest",
        "q72_entity_name_neardup",
        "q74_dedup_survivors",
        "q75_funnel",
        "q93_doc_chunking",
        "q95_containment_pairs",
        "q97_unigram_logprob",
        "q99_product_quantize",
        "q100_pq_adc_topk",
        "q101_bootstrap_prf",
        "q108_decontaminate",
        "q109_dup_span_removal",
        "q110_semantic_dedup",
        "q111_personalized_pagerank",
        "q112_weighted_sssp",
        "q113_chunk_neardup_profile",
        "q115_dsir_resample",
        "q116_winnow_fingerprints",
        "q117_adamic_adar",
        "q121_bigram_logprob",
        "q123_winnow_overlap",
        "q126_luby_mis",
        "q129_rrf_hybrid",
        "q131_rendezvous_shards",
        "q133_cluster_safe_split",
        "q138_rule_mining",
        "q144_truth_discovery",
        "q146_kg_constraints",
        "q148_entity_alignment",
        "q160_lin_similarity",
        "q161_hits",
        "q162_coalesce_intervals",
        "q165_fs_linkage",
        # session-6 families: integer Markov fixed point (corpus window +
        # 8 dimension-sized rounds), recency-decayed edge support
        # (lineitem-scale integer aggregate), exact embedding covariance
        # (45 agg expressions in one pass)
        "q219_stationary_mix",
        "q224_decayed_support",
        "q221_embedding_covariance",
        # r5 KG-representation-learning family: filtered TransE ranking
        # (broadcast candidate pools + window rank) and 2-hop feature
        # pre-propagation (edge self-join with hub df-cut)
        "q248_transe_eval",
        "q249_feature_propagation",
        # r5 session-2 families: Hearst extraction (regex scan-explode),
        # CCNet perplexity thirds (corpus unigram LM + per-lang ntile),
        # bipartite butterfly census (lineitem pivot self-join), SPARQL
        # BGP (cyclic 4-pattern join), node2vec (2 shuffles/step +
        # per-step checkpoint)
        "q257_hearst_hypernyms",
        "q263_ccnet_buckets",
        "q261_butterfly_count",
        "q262_bgp_match",
        "q266_node2vec_walks",
        # r5 session-3 families: per-entity fact summarization (two
        # vocabulary aggregates + per-subject top-k window over the
        # lifted KG), integer Katz (1 shuffle/round × 4), FW-BW-Trim SCC
        # peeling (iterative semi-joins on a shrinking subgraph), and
        # TextTiling (doc-keyed adjacent-block join + two windows)
        "q271_entity_summarization",
        "q273_katz_centrality",
        "q281_scc",
        "q282_texttiling",
        # r5 session-4 families: RDFS entailment closure (broadcast
        # ontology joins + ONE corpus shuffle), sameAs canonical rewrite
        # (components + two shuffle joins + provenance agg), and
        # gaps-and-islands temporal coalescing (one window per
        # high-cardinality key)
        "q292_rdfs_closure",
        "q294_sameas_rewrite",
        "q295_temporal_coalesce",
    ]
    for name in bench_queries:
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    # the MinHash scale path (xxhash64 long signatures — the operator
    # default; q29 above times the md5 oracle twin for comparison)
    from bran_spark.operators.dedup import minhash_lsh_pairs

    t0 = time.time()
    minhash_lsh_pairs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id", "text",
        n=4, bands=4,
    ).count()
    timings["minhash_lsh_xxhash64"] = round(time.time() - t0, 3)

    # exact top-k twins: JVM aggregate expressions (q30 above) vs the
    # Arrow/GEMM-batched form — the cost-model comparison for wide vectors
    from bran_spark.operators.similarity import cosine_topk_gemm

    t0 = time.time()
    cosine_topk_gemm(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), query_id=0, k=10
    ).count()
    timings["cosine_topk_gemm"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bran_spark_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        **extras,
    }
    # Full-name record for humans / BASELINE.md bookkeeping. The plain
    # bench_full.json name is reserved for the driver's sf0.1 record —
    # a smoke run at another SF (SPARK_GRAFT_SF_DIR override) writes an
    # sf-suffixed file instead of silently destroying it.
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    fname = (
        "bench_full.json" if abs(sf - 0.1) < 1e-9 else f"bench_full_sf{sf}.json"
    )
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", fname
    )
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)

    # Compact line for the driver's 2000-char stdout tail: qNN prefixes are
    # unique registry keys; fixed abbreviations for the two non-registry
    # extras. 2-decimal rounding — the driver artifact is a trend record,
    # not a microbenchmark.
    _abbrev = {"minhash_lsh_xxhash64": "mh_xx64", "cosine_topk_gemm": "gemm_topk"}

    def _short(name: str) -> str:
        if name in _abbrev:
            return _abbrev[name]
        head = name.split("_", 1)[0]
        return head if head.startswith("q") and head[1:].isdigit() else name

    compact = dict(out)
    compact["queries"] = {_short(k): round(v, 2) for k, v in timings.items()}
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # Never die (or regress to parsed:null) AFTER a multi-minute run:
        # drop the per-query dict — the headline metric, flagship runs and
        # throughput still reach the driver, and bench_full.json has the
        # rest. (An assert here would also vanish under python -O.)
        print(
            f"bench: compact line {len(line)} chars exceeds the driver's "
            "2000-char tail; dropping the queries dict from the stdout line "
            "(full record in BENCH/bench_full.json)",
            file=sys.stderr,
        )
        compact.pop("queries")
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
