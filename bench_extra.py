"""Per-query measurement harness for optimization work (r06).

bench.py is FROZEN for driver measurement; this file is the sandbox for
solo per-query timing (guide §1.1/§1.4): same session config and count()
methodology as bench.py, but one query (or a list) at a time, N repeats,
optional formatted-plan dump to plans/r06/.

Usage:
    python bench_extra.py q138_rule_mining [q292_rdfs_closure ...] \
        [--n 3] [--plan plans/r06/q138_rule_mining_before.txt] [--noop]

--noop times a noop-sink write (materializes every column) instead of
count(); bench.py times count(), so count() is the default for
before/after comparability with the driver's numbers.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.abspath(__file__))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plan", default=None,
                    help="dump explain('formatted') of the FIRST query here")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    from bran_spark.plans.oracle_queries import QUERIES
    from bran_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bran_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(8, int(cpus) * 2)),
    )

    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = QUERIES[name]
        if args.plan and name == args.names[0]:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            _stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = _stdout
            os.makedirs(os.path.dirname(args.plan), exist_ok=True)
            with open(args.plan, "w") as f:
                f.write(buf.getvalue())
            print(f"plan -> {args.plan}", file=sys.stderr)
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(json.dumps({name: runs, "min": min(runs),
                          "median": sorted(runs)[len(runs) // 2]}))
    spark.stop()


if __name__ == "__main__":
    main()
