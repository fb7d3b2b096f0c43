#!/usr/bin/env python3
"""sf1.0 stress run of the flagship + curation job with cliff counters
(VERDICT r3 #5).

The 100×-scale cliffs — a driver-side collect that grew with the corpus, a
stage that starts spilling, one skewed task pinning a stage — are invisible
at sf0.1. This harness runs both composed jobs at the largest feasible
local scale and records per-stage spill/shuffle/skew plus peak process
memory (jobs' --metrics-out, backed by bran_spark/sources/metrics.py),
then appends an addendum to BENCH/BASELINE.md.

- Flagship: the seeded fixture corpus at --sf (default 1.0 → 500k docs),
  one subprocess, local[32], checkpoints off (pure compute).
- Curation: the driver's sf0.1 documents table tiled ×--tile (default 100
  → 500k docs) DETERMINISTICALLY: within each 20-replica stripe, replica 0
  keeps the original text (planted near-dup cluster of tile/20 copies —
  the dedup stack must sweat) and the rest get per-replica-distinct
  shingles via a word-prefix rewrite (no accidental corpus-scale clique,
  which would be a quadratic pair blowup no real corpus has).

    python tools/stress_run.py [--sf 1.0] [--tile 100] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRESS_DIR = "/tmp/bran_stress"


def _build_tiled_documents(tile: int, cores: int) -> str:
    """Tile the sf0.1 documents table ×tile into STRESS_DIR (idempotent)."""
    out = os.path.join(STRESS_DIR, f"tile{tile}")
    marker = os.path.join(out, "_SUCCESS_TILED")
    if os.path.exists(marker):
        return out
    from pyspark.sql import functions as F

    from bran_spark.session import get_spark

    spark = get_spark("bran_stress_gen", master=f"local[{cores}]")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(tile).select(F.col("id").alias("rep"))
    text = F.when(
        F.col("rep") % 20 == 0,
        # planted near-dup: same text + a 1-shingle suffix
        F.concat(F.col("text"), F.lit(" stripe"), (F.col("rep") / 20).cast("int")),
    ).otherwise(
        # distinct content: every word gets a replica-unique prefix, so no
        # shingle collides across replicas
        F.regexp_replace(
            F.concat(F.lit("r"), F.col("rep"), F.lit("_"), F.col("text")),
            " ",
            F.concat(F.lit(" r"), F.col("rep"), F.lit("_")),
        )
    )
    tiled = docs.crossJoin(reps).select(
        (F.col("doc_id") * tile + F.col("rep")).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast("long").alias("n_chars"),
    )
    os.makedirs(out, exist_ok=True)
    # 64 output partitions -> 64 files/row groups: a scan-splittable layout
    # (the first harness version wrote ONE 75 MB row group, which no
    # maxPartitionBytes can split — itself the first cliff this tool found)
    tiled.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    spark.stop()
    open(marker, "w").write("ok")
    return out


def _run_job(cmd: list[str], env_extra: dict[str, str]) -> tuple[dict, float]:
    env = {**os.environ, "PYTHONPATH": REPO, **env_extra}
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, *cmd], capture_output=True, text=True, env=env,
        cwd=REPO,
    )
    wall = time.time() - t0
    if r.returncode != 0:
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"job failed: {cmd}")
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line), round(wall, 1)


def _cliffs(metrics: dict) -> list[str]:
    """Flag the counters a 100× scale-up would trip over."""
    found = []
    tot = metrics.get("totals", {})
    spilled = tot.get("memoryBytesSpilled", 0) + tot.get("diskBytesSpilled", 0)
    if spilled:
        found.append(f"SPILL: {spilled / 2**20:.0f} MiB spilled")
    for s in metrics.get("top_stages", []):
        if (s.get("task_skew") or 0) >= 5 and (s.get("task_ms_max") or 0) > 10_000:
            found.append(
                f"SKEW: stage {s['stage']} (job={s.get('job')}) "
                f"max/p50 = {s['task_skew']}x, max {s['task_ms_max']} ms"
            )
    return found


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--tile", type=int, default=100)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    ap.add_argument("--no-flagship", action="store_true")
    ap.add_argument("--no-curation", action="store_true")
    args = ap.parse_args()
    env = {"BRAN_SPARK_DRIVER_MEM": "48g"}
    os.makedirs(STRESS_DIR, exist_ok=True)
    report: dict = {"sf": args.sf, "tile": args.tile, "cores": args.cores}

    if not args.no_flagship:
        m_path = os.path.join(STRESS_DIR, "flagship_metrics.json")
        res, wall = _run_job(
            [
                "jobs/run_pipeline.py", "--sf", str(args.sf),
                "--master", f"local[{args.cores}]", "--no-checkpoint",
                "--metrics-out", m_path,
            ],
            env,
        )
        metrics = json.load(open(m_path))
        report["flagship"] = {
            "result": res,
            "subprocess_wall_s": wall,
            "metrics": metrics,
            "cliffs": _cliffs(metrics),
        }
        print(json.dumps({"phase": "flagship", "wall_s": res["wall_s"],
                          "triples_per_sec": res["triples_per_sec"],
                          "cliffs": report["flagship"]["cliffs"]}), flush=True)

    if not args.no_curation:
        sf_dir = _build_tiled_documents(args.tile, args.cores)
        m_path = os.path.join(STRESS_DIR, "curation_metrics.json")
        res, wall = _run_job(
            [
                "jobs/run_curation.py", "--sf-dir", sf_dir,
                "--master", f"local[{args.cores}]", "--mask-dup-spans",
                "--metrics-out", m_path,
            ],
            env,
        )
        metrics = json.load(open(m_path))
        report["curation"] = {
            "result": res,
            "subprocess_wall_s": wall,
            "metrics": metrics,
            "cliffs": _cliffs(metrics),
        }
        print(json.dumps({"phase": "curation", "wall_s": res["wall_s"],
                          "input_docs": res["input_docs"],
                          "curated_docs": res["curated_docs"],
                          "cliffs": report["curation"]["cliffs"]}), flush=True)

    raw_path = os.path.join(STRESS_DIR, "stress_report.json")
    with open(raw_path, "w") as f:
        json.dump(report, f, indent=1)

    # APPEND the addendum (BENCH/BASELINE.md accumulates round history)
    with open(args.out, "a") as f:
        f.write("\n\n---\n\n## Stress run addendum (tools/stress_run.py)\n\n")
        f.write(
            f"cores=local[{args.cores}], flagship sf={args.sf}, curation = "
            f"sf0.1 documents tiled x{args.tile}; full counters in "
            f"`{raw_path}` (regenerate any time — deterministic).\n\n"
        )
        for phase in ("flagship", "curation"):
            if phase not in report:
                continue
            p = report[phase]
            m = p["metrics"]
            tot = m.get("totals", {})
            f.write(
                f"- **{phase}**: wall {p['result'].get('wall_s')} s"
                + (
                    f", {p['result'].get('triples_per_sec')} triples/s"
                    if phase == "flagship"
                    else f", {p['result'].get('input_docs')} -> "
                    f"{p['result'].get('curated_docs')} docs"
                )
                + f"; peak RSS py-driver {m.get('peak_rss_driver_py_mb')} MB"
                f" / children (JVM) {m.get('peak_rss_children_mb')} MB;"
                f" spill {((tot.get('memoryBytesSpilled', 0) + tot.get('diskBytesSpilled', 0)) / 2**20):.0f} MiB;"
                f" shuffle write {(tot.get('shuffleWriteBytes', 0) / 2**20):.0f} MiB"
                f" over {m.get('n_stages')} stages.\n"
            )
            if p["cliffs"]:
                for c in p["cliffs"]:
                    f.write(f"  - cliff: {c}\n")
            else:
                f.write("  - no spill, no >=5x task skew in the top stages.\n")
    print(json.dumps({"metric": "stress_run", "report": raw_path}))


if __name__ == "__main__":
    main()
