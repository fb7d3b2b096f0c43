"""Checkpoint/lineage/resume idempotency (SURVEY.md §4.3, §5.2.4)."""

from __future__ import annotations

import json
import os
import shutil

from bran_spark.plans.pipeline import Pipeline, PipelineConfig


def _run(spark, fx_dir, root):
    cfg = PipelineConfig(fixture_dir=fx_dir, checkpoint_root=root, score_buckets=4)
    return Pipeline(spark, cfg).run(evaluate=False)


def test_kill_and_rerun_idempotent(spark, fx_dir, tmp_path):
    root = str(tmp_path / "ck")
    r1 = _run(spark, fx_dir, root)

    # simulated kill: lose half the score buckets and all downstream tables
    for b in (1, 3):
        shutil.rmtree(f"{root}/pair_scores/buckets/bucket-{b}")
    shutil.rmtree(f"{root}/triples")
    shutil.rmtree(f"{root}/edges")

    r2 = _run(spark, fx_dir, root)
    for k in ("mentions", "pair_scores", "triples", "edges"):
        assert r1[k] == r2[k], k


def test_manifests_carry_lineage_and_counters(spark, fx_dir, tmp_path):
    root = str(tmp_path / "ck")
    r = _run(spark, fx_dir, root)
    man = json.load(open(f"{root}/triples/manifest-0.json"))
    assert man["rows"] == r["triples"]
    assert man["stage"] and man["config_hash"]
    assert man["n_files"] >= 1 and sum(man["partition_counts"].values()) == man["rows"]
    # bucket manifests for the expensive stage
    buckets = os.listdir(f"{root}/pair_scores/buckets")
    assert len([b for b in buckets if b.startswith("bucket-")]) == 4
    bman = json.load(open(f"{root}/pair_scores/buckets/bucket-0/_MANIFEST.json"))
    assert bman["rows"] >= 0 and bman["stage"] == "encode+score"


def test_resume_skips_committed_stages(spark, fx_dir, tmp_path):
    """Second run must not write new snapshots (pure read path)."""
    root = str(tmp_path / "ck")
    _run(spark, fx_dir, root)
    snap_before = open(f"{root}/triples/_current").read()
    _run(spark, fx_dir, root)
    assert open(f"{root}/triples/_current").read() == snap_before
