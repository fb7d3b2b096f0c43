"""Run any registered operator query by name via spark-submit — the
user-facing entry for ad-hoc execution of the SURVEY.md §2 corpus:

    python jobs/run_query.py --name q56_pagerank --sf-dir /root/testdata/sf0.01
    spark-submit --py-files dist/bran_spark.zip jobs/run_query.py --name q29_dedup_minhash_lsh

Prints one JSON line: {"name", "rows", "wall_s", "sf_dir"} and optionally
shows the first rows (--show N).
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
    ap.add_argument("--name", required=True, help="queries() entry, e.g. q01_pricing_summary")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--master", default=None)
    ap.add_argument("--show", type=int, default=0)
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    args = ap.parse_args()

    from bran_spark.plans.oracle_queries import QUERIES
    from bran_spark.session import get_spark

    if args.list:
        for n in sorted(QUERIES):
            print(n)
        return
    if args.name not in QUERIES:
        raise SystemExit(
            f"unknown query {args.name!r}; run with --list to see all "
            f"{len(QUERIES)} names"
        )
    spark = get_spark("bran_run_query", master=args.master)
    t0 = time.time()
    df = QUERIES[args.name](spark, args.sf_dir)
    rows = df.count()
    out = {
        "name": args.name,
        "rows": rows,
        "wall_s": round(time.time() - t0, 3),
        "sf_dir": args.sf_dir,
    }
    if args.show:
        df.show(args.show, truncate=80)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
