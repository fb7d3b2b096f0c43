"""Run-level executor/stage metrics via Spark's status REST API.

The 100×-scale cliffs (driver-side collects that grew, a stage that
spills, one skewed task pinning a stage) are invisible in a wall-clock
number — they live in per-stage counters. This module snapshots them at
the end of a run so the stress harness (tools/stress_run.py, VERDICT r3
#5) can record peak memory, spill and skew alongside throughput.

Requires ``spark.ui.enabled=true`` on the session (the factory default is
false for test hygiene — pass ``extra_conf={"spark.ui.enabled": "true"}``);
degrades to an ``{"error": ...}`` dict rather than failing the run."""

from __future__ import annotations

import json
import resource
import urllib.request

from pyspark.sql import SparkSession

_STAGE_FIELDS = (
    "executorRunTime",
    "memoryBytesSpilled",
    "diskBytesSpilled",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "inputBytes",
    "outputBytes",
)


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def collect_run_metrics(spark: SparkSession, top_n: int = 10) -> dict:
    """Stage totals + top-N stages by run time (with task-duration skew
    p50/max from taskSummary) + executor peak memory + process peak RSS.

    ru_maxrss(SELF) is this python driver; ru_maxrss(CHILDREN) is the peak
    of any exited child — after spark.stop() that includes the JVM, so the
    caller should collect BEFORE stop and stamp rusage at exit (we report
    both; children's value is only complete post-stop)."""
    out: dict = {
        "peak_rss_driver_py_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
        "peak_rss_children_mb": round(
            resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024, 1
        ),
    }
    base = spark.sparkContext.uiWebUrl
    if not base:
        out["error"] = "spark.ui.enabled is false - no REST metrics"
        return out
    app = spark.sparkContext.applicationId
    try:
        stages = _get(base, f"applications/{app}/stages?status=complete")
    except Exception as e:  # noqa: BLE001 - diagnostics must not fail a run
        out["error"] = f"stage metrics unavailable: {e}"
        return out

    # stage -> job-description map: jobs run under setJobDescription carry
    # the operator/stage name, the only reliable attribution for
    # AQE-materialized stages (whose own names are anonfun wrappers)
    stage_desc: dict[int, str] = {}
    try:
        for j in _get(base, f"applications/{app}/jobs"):
            d = j.get("description") or j.get("name", "")
            for sid in j.get("stageIds", []):
                stage_desc[sid] = d[:80]
    except Exception:  # noqa: BLE001
        pass

    out["n_stages"] = len(stages)
    out["totals"] = {
        f: int(sum(s.get(f, 0) for s in stages)) for f in _STAGE_FIELDS
    }
    top = sorted(
        stages, key=lambda s: s.get("executorRunTime", 0), reverse=True
    )[:top_n]
    rows = []
    for s in top:
        row = {
            "stage": s["stageId"],
            "name": s.get("name", "")[:80],
            "job": stage_desc.get(s["stageId"]),
            "tasks": s.get("numTasks"),
            **{f: int(s.get(f, 0)) for f in _STAGE_FIELDS},
        }
        try:
            q = _get(
                base,
                f"applications/{app}/stages/{s['stageId']}/"
                f"{s.get('attemptId', 0)}/taskSummary"
                "?quantiles=0.5,1.0",
            )
            p50, mx = q["duration"]
            row["task_ms_p50"] = int(p50)
            row["task_ms_max"] = int(mx)
            row["task_skew"] = round(mx / p50, 2) if p50 else None
        except Exception:  # noqa: BLE001
            pass
        rows.append(row)
    out["top_stages"] = rows
    try:
        execs = _get(base, f"applications/{app}/executors")
        out["executor_peaks"] = [
            {
                "id": e.get("id"),
                "peakJvmHeapMb": round(
                    e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0)
                    / 2**20
                ),
                "peakOffHeapMb": round(
                    e.get("peakMemoryMetrics", {}).get("JVMOffHeapMemory", 0)
                    / 2**20
                ),
                "maxMemoryMb": round(e.get("maxMemory", 0) / 2**20),
            }
            for e in execs
        ]
    except Exception:  # noqa: BLE001
        pass
    return out
