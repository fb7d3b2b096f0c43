"""spark-submit entry for the PRIVACY/GOVERNANCE release gate — what sits
between a curated snapshot and anything row-level leaving the platform:

    k-anonymity → l-diversity → t-closeness over the release
    quasi-identifiers, PII-pattern census over the text corpus, and a
    group-fairness audit of the length-proxy quality filter —
    one JSON verdict line; --fail-on-violations exits non-zero when any
    gate fails (CI mode), else it reports (nightly-snapshot mode).

    spark-submit --master local[8] --py-files dist/bran_spark.zip \
        jobs/run_privacy_gate.py --sf-dir /root/testdata/sf0.01

Every stage is a registered, oracle-checked operator (q229 k, q252 l,
q253 t, q230 PII, q267 fairness), so the gate and the driver's
correctness harness can never disagree on what counts as a violation.
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--master", default=None)
    ap.add_argument("--out", default=None, help="JSON output path")
    ap.add_argument("--k-anon", type=int, default=15)
    ap.add_argument("--l-div", type=int, default=5)
    ap.add_argument("--t-close", type=float, default=0.35)
    ap.add_argument("--max-dp-gap", type=float, default=0.5)
    ap.add_argument("--fail-on-violations", action="store_true")
    ap.add_argument("--shuffle-partitions", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bran_spark.operators.contracts import (
        fairness_audit,
        k_anonymity_audit,
        l_diversity_audit,
        pii_scan,
        t_closeness_audit,
    )
    from bran_spark.session import get_spark

    spark = get_spark(
        "bran_privacy_gate",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.time()
    report: dict = {"sf_dir": args.sf_dir}

    cust = spark.read.parquet(f"{args.sf_dir}/customer.parquet")
    qi = ["c_nationkey", "c_mktsegment"]
    sens = F.floor(F.col("c_acctbal") / 1000.0).cast("long")

    k = k_anonymity_audit(cust, qi, k=args.k_anon).collect()[0]
    report["k_anonymity"] = {
        "k": args.k_anon,
        "min_group_size": k.min_group_size,
        "violating_share": k.violating_share,
        "satisfied": bool(k.k_satisfied),
    }
    l = l_diversity_audit(cust, qi, sens, l_min=args.l_div).collect()[0]
    report["l_diversity"] = {
        "l": args.l_div,
        "min_diversity": l.min_diversity,
        "violating_groups": l.n_violating_groups,
        "satisfied": bool(l.l_satisfied),
    }
    t = t_closeness_audit(cust, qi, sens, t=args.t_close).collect()[0]
    report["t_closeness"] = {
        "t": args.t_close,
        "max_tvd": t.max_tvd,
        "violating_groups": t.n_violating_groups,
        "satisfied": bool(t.t_satisfied),
    }

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    pii = pii_scan(docs).collect()
    n_pii = int(sum(r.n_matches for r in pii))
    report["pii"] = {
        "n_matches": n_pii,
        "patterns_hit": sorted({r.pattern for r in pii if r.n_matches > 0}),
        "satisfied": n_pii == 0,
    }

    fa = fairness_audit(
        docs.select(
            "lang",
            (F.col("n_chars") >= 500).cast("int").alias("y"),
            (
                F.size(F.split(F.trim(F.lower(F.col("text"))), " +")) >= 80
            ).cast("int").alias("p"),
        ),
        "lang", "y", "p",
    ).collect()
    max_dp = max((r.dp_gap for r in fa), default=0.0)
    report["fairness"] = {
        "max_dp_gap": max_dp,
        "n_groups": len(fa),
        "satisfied": max_dp <= args.max_dp_gap,
    }

    report["all_satisfied"] = all(
        report[s]["satisfied"]
        for s in ("k_anonymity", "l_diversity", "t_closeness", "pii",
                  "fairness")
    )
    report["wall_s"] = round(time.time() - t0, 3)
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if args.fail_on_violations and not report["all_satisfied"]:
        sys.exit(2)


if __name__ == "__main__":
    main()
