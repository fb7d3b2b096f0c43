"""Shuffle-partition sensitivity probe (round-3 closing item for the
scaling-evidence record in BENCH/BASELINE.md).

Question: could the measured 8→32-core efficiency be an artifact of
`spark.sql.shuffle.partitions` (e.g. the 32-core level starving on too-few
partitions, or the 8-core level drowning in too many)? Answer it by running
the IDENTICAL flagship job at sf0.5 with the partition count swept across
{1×, 2×, 4×} cores at BOTH core counts (fresh JVM per run, taskset-pinned,
same protocol as tools/scaling_bench.py). If the walls are flat across the
sweep at each level, the plan is partition-count-insensitive and the
efficiency ratio is a property of the box, not of a tuning choice.

    python tools/shuffle_sweep_probe.py [--sf 0.5] [--low 8] [--high 32]

Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_bench import run_once  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.5)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--mults", type=int, nargs="*", default=[1, 2, 4])
    args = ap.parse_args()

    from bran_spark.fixtures.gen import ensure

    ensure(args.sf)

    # one warm-up per level (discarded), then the sweep cells interleaved
    # across levels so host drift biases both levels equally
    for cores in (args.low, args.high):
        run_once(cores, args.sf)
    walls: dict[str, float] = {}
    thr: dict[str, float] = {}
    for mult in args.mults:
        for cores in (args.low, args.high):
            r = run_once(cores, args.sf, shuffle_partitions=cores * mult)
            key = f"local[{cores}]x{mult}"
            walls[key] = r["wall_s"]
            thr[key] = r["triples_per_sec"]
            print(f"{key}: sp={cores * mult} wall={r['wall_s']}s "
                  f"{r['triples_per_sec']} triples/s", flush=True)

    out = {"sf": args.sf, "walls": walls, "triples_per_sec": thr}
    for cores in (args.low, args.high):
        ws = [walls[f"local[{cores}]x{m}"] for m in args.mults]
        out[f"spread_local{cores}"] = round((max(ws) - min(ws)) / min(ws), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
