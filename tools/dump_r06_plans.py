"""Dump explain('formatted') for named registry queries to
plans/r06/<query>_<suffix>.txt (the r06 before/after plan evidence).

Usage: python tools/dump_r06_plans.py before q138_rule_mining q292_rdfs_closure ...
"""

from __future__ import annotations

import io
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from bran_spark.plans.oracle_queries import QUERIES
    from bran_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bran_plan_dump",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(8, int(cpus) * 2)),
    )
    outdir = os.path.join(_REPO_ROOT, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"{name} -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
