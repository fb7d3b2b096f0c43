"""Concurrent-isolation probe — the sharpest single-box test of whether the
flagship job ITSELF scales (north_rule ≥0.8 N→4N) or the box does not.

Four COMPLETELY INDEPENDENT 8-core flagship jobs (separate JVMs, separate
python workers, separate shuffle dirs, taskset-pinned to DISJOINT core
octets) run simultaneously. There is no Spark-level coupling of any kind
between them — no shared driver, no shared shuffle, no barrier, no skew.
The only shared resource is the hardware: one DRAM system, one disk.

Interpretation:
- per-job retention = concurrent per-job throughput / solo-8 throughput.
  On a real 4-node cluster each node IS the solo-8 configuration (its own
  memory system), so cluster N→4N efficiency ≈ retention measured THERE
  ≈ 1.0 by construction. Any retention loss measured HERE is pure
  hardware sharing.
- plan-serialization check: aggregate 4×8-concurrent throughput vs the
  single local[32] job. If the single 32-way job matches (or beats) four
  uncoordinated 8-way jobs, its internal structure (shuffles, barriers,
  stage graph) costs nothing — the measured 8→32 inefficiency lives
  entirely in the substrate both configurations share.

    python tools/concurrent_probe.py [--sf 0.5] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cmd(core_lo: int, core_hi: int, cores: int, sf: float) -> list[str]:
    return [
        "taskset", "-c", f"{core_lo}-{core_hi}",
        sys.executable,
        os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--sf", str(sf),
        "--master", f"local[{cores}]",
        "--no-checkpoint",
        "--shuffle-partitions", str(cores * 2),
        "--score-buckets", "1",
    ]


def _env() -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # 12g × 4 concurrent JVMs fits the 128 GiB box; solo runs use the same
    # setting so the comparison is apples-to-apples
    env["BRAN_SPARK_DRIVER_MEM"] = "12g"
    return env


def _parse(stdout: str) -> dict:
    return json.loads([ln for ln in stdout.splitlines() if ln.startswith("{")][-1])


def run_solo(cores: int, sf: float) -> dict:
    lo, hi = 0, cores - 1
    out = subprocess.run(
        _cmd(lo, hi, cores, sf), capture_output=True, text=True,
        env=_env(), cwd=REPO, check=True,
    )
    return _parse(out.stdout)


def run_wave(nprocs: int, cores: int, sf: float) -> list[dict]:
    procs = []
    for i in range(nprocs):
        lo, hi = i * cores, (i + 1) * cores - 1
        procs.append(
            subprocess.Popen(
                _cmd(lo, hi, cores, sf),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=_env(), cwd=REPO,
            )
        )
    results = []
    for p in procs:
        stdout, stderr = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(f"concurrent job failed: {stderr[-2000:]}")
        results.append(_parse(stdout))
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.5)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--nprocs", type=int, default=4)
    args = ap.parse_args()

    from bran_spark.fixtures.gen import ensure

    ensure(args.sf)

    # warm-ups (page cache, JIT profiles discarded with the JVM but the
    # parquet input and python imports stay warm)
    run_solo(args.cores, args.sf)

    solo8, solo32, waves = [], [], []
    for i in range(args.runs):
        r = run_solo(args.cores, args.sf)
        solo8.append(r["triples_per_sec"])
        print(f"solo local[{args.cores}] run {i+1}: {r['wall_s']}s "
              f"{r['triples_per_sec']} triples/s", flush=True)
        w = run_wave(args.nprocs, args.cores, args.sf)
        per_job = [x["triples_per_sec"] for x in w]
        waves.append(per_job)
        print(f"concurrent {args.nprocs}×local[{args.cores}] run {i+1}: "
              f"per-job {sorted(per_job)} agg {sum(per_job):.0f}", flush=True)
        r32 = run_solo(args.cores * args.nprocs, args.sf)
        solo32.append(r32["triples_per_sec"])
        print(f"solo local[{args.cores * args.nprocs}] run {i+1}: "
              f"{r32['wall_s']}s {r32['triples_per_sec']} triples/s", flush=True)

    med8 = statistics.median(solo8)
    med32 = statistics.median(solo32)
    agg = statistics.median(sum(w) for w in waves)
    per_job_med = statistics.median(x for w in waves for x in w)
    out = {
        "solo8_triples_per_sec": round(med8, 1),
        "solo32_triples_per_sec": round(med32, 1),
        "concurrent_agg_triples_per_sec": round(agg, 1),
        "concurrent_per_job_median": round(per_job_med, 1),
        "per_job_retention_vs_solo8": round(per_job_med / med8, 3),
        "single32_vs_concurrent_agg": round(med32 / agg, 3),
        "raw": {"solo8": solo8, "solo32": solo32, "waves": waves},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
