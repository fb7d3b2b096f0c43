"""Local mirror of the driver's correctness gate (CORRECTNESS_r{N}.json).

Runs every ``queries()`` entry against its ``oracle_sql()`` twin via DuckDB
on the same parquet tables: row-count + column-name + order-insensitive
value-hash comparison. Usage:

    python tools/oracle_check.py [--sf-dir /root/testdata/sf0.01] [--only q01...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

import duckdb

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
# python workers must also import bran_spark (pandas-UDF closures) — export
# it BEFORE the session forks so the check runs from any cwd
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style float canonicalization: repr of a round-trip float
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--skip-rows-only", action="store_true", default=True)
    ap.add_argument(
        "--chunk",
        default=None,
        help="'i/n' — run only the i-th of n equal registry slices "
        "(1-based); lets a wall-clock-capped harness sweep the full "
        "registry in a few bounded processes",
    )
    args = ap.parse_args()

    from bran_spark.plans.oracle_queries import ORACLE, QUERIES
    from bran_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    names = args.only or list(QUERIES)
    if args.chunk:
        if args.only:
            ap.error("--chunk and --only are mutually exclusive")
        try:
            i, n = (int(x) for x in args.chunk.split("/"))
        except ValueError:
            ap.error("--chunk must be 'i/n'")
        if n < 1 or not 1 <= i <= n:
            # an out-of-range slice would run ZERO queries and exit
            # green — the one failure mode a verification tool must not have
            ap.error(f"--chunk index out of range: {args.chunk}")
        per = (len(names) + n - 1) // n
        names = names[(i - 1) * per : i * per]
    failures = []
    for name in names:
        if name not in ORACLE:
            continue
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            o = con.execute(ORACLE[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            ok_rows = len(s_rows) == len(o_rows)
            ok_cols = sorted(s_cols) == sorted(o_cols)
            ok_hash = frame_hash(s_cols, s_rows) == frame_hash(o_cols, o_rows)
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
            detail = ""
            if not ok_rows:
                detail += f" rows spark={len(s_rows)} duck={len(o_rows)}"
            if not ok_cols:
                detail += f" cols spark={sorted(s_cols)} duck={sorted(o_cols)}"
            if ok_rows and ok_cols and not ok_hash:
                detail += " value-hash differs"
            print(f"{name:28s} {status:8s} n={len(s_rows):7d} {time.time()-t0:6.1f}s{detail}")
            if status != "OK":
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR    {type(e).__name__}: {str(e)[:160]}")
            failures.append(name)
    print(f"\n{len(names) and len([n for n in names if n in ORACLE])} checked, "
          f"{len(failures)} failing: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
