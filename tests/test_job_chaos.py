"""Kill-and-rerun chaos tests for the composed jobs (VERDICT r3 #4).

Each test runs a job with --checkpoint-root, then simulates a mid-run kill
by deleting the LATER HALF of its stage commits (a killed linear job leaves
a prefix of commits) plus the final output, and reruns. Asserts:

- the surviving stages are RESUMED (the job reports them; recompute of a
  committed stage would be a silent idempotence bug),
- funnel counters / report numbers are identical to the uninterrupted run,
- the final output is content-identical (sorted-row sha256 over the
  parquet — Spark embeds task-attempt UUIDs in part-file names, so
  byte-identical directories are impossible by construction; the content
  hash is the meaningful invariant).

The flagship pipeline's finer-grained (per-bucket) kill-rerun gate lives in
tests/test_resume.py; these cover jobs/run_curation.py,
jobs/run_experiment.py and jobs/run_datacard.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str]) -> dict:
    r = subprocess.run(
        [sys.executable, *cmd],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def _parquet_content_hash(path: str, order_by: str) -> str:
    rows = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{path}/*.parquet') ORDER BY {order_by}"
    ).fetchall()
    return hashlib.sha256(repr(rows).encode()).hexdigest()


def _drop(ck_root: str, tables: list[str]) -> None:
    for t in tables:
        shutil.rmtree(os.path.join(ck_root, t))


def test_curation_job_kill_rerun(tmp_path, testdata_dir):
    ck = str(tmp_path / "ck")
    out1, out2 = str(tmp_path / "out1"), str(tmp_path / "out2")
    base = [
        "jobs/run_curation.py", "--sf-dir", testdata_dir,
        "--master", "local[4]", "--checkpoint-root", ck,
        "--mask-dup-spans",
    ]
    funnel1 = _run([*base, "--out", out1])
    assert funnel1["resumed_stages"] == []
    h1 = _parquet_content_hash(out1, "doc_id")

    # kill simulation: the job died after committing the first two of four
    # stages — the later-half commits and the final output never happened
    _drop(ck, ["cur_neardup", "cur_masked"])
    shutil.rmtree(out1)

    funnel2 = _run([*base, "--out", out2])
    assert funnel2["resumed_stages"] == ["cur_quality", "cur_exact"]
    for k in ("input_docs", "after_quality", "after_exact_dedup",
              "after_neardup_dedup", "span_edited_docs", "curated_docs"):
        assert funnel2[k] == funnel1[k], k
    assert _parquet_content_hash(out2, "doc_id") == h1


def test_curation_tail_knob_change_resumes_head(tmp_path, testdata_dir):
    """Per-stage config hashing (ADVICE r4): changing a TAIL-only knob
    (--dsir-k) must resume every upstream stage from its commit — one
    shared all-knobs hash would invalidate the whole funnel and force a
    full recompute on exactly the tune-the-tail workflow resume is for."""
    ck = str(tmp_path / "ck")
    base = [
        "jobs/run_curation.py", "--sf-dir", testdata_dir,
        "--master", "local[4]", "--checkpoint-root", ck,
        "--dsir-target", "src0",
    ]
    funnel1 = _run([*base, "--dsir-k", "50"])
    assert funnel1["resumed_stages"] == []
    assert funnel1["after_dsir"] == 50

    funnel2 = _run([*base, "--dsir-k", "30"])
    assert funnel2["resumed_stages"] == [
        "cur_quality", "cur_exact", "cur_neardup"
    ]
    assert funnel2["after_dsir"] == 30
    for k in ("input_docs", "after_quality", "after_exact_dedup",
              "after_neardup_dedup"):
        assert funnel2[k] == funnel1[k], k


def test_experiment_job_kill_rerun(tmp_path, testdata_dir):
    ck = str(tmp_path / "ck")
    base = [
        "jobs/run_experiment.py", "--sf-dir", testdata_dir,
        "--master", "local[4]", "--checkpoint-root", ck,
    ]
    out1, out2, out3 = (str(tmp_path / f"exp{i}.json") for i in (1, 2, 3))
    _run([*base, "--out", out1])
    rep1 = json.load(open(out1))
    assert rep1["units_resumed"] is False

    # clean rerun resumes the committed units table
    _run([*base, "--out", out2])
    rep2 = json.load(open(out2))
    assert rep2["units_resumed"] is True

    # kill simulation: died mid-commit — manifest never landed (data may
    # have); the rerun must recompute, not trust the orphan data dir
    for f in os.listdir(os.path.join(ck, "exp_units")):
        if f.startswith("manifest-"):
            os.remove(os.path.join(ck, "exp_units", f))
    _run([*base, "--out", out3])
    rep3 = json.load(open(out3))
    assert rep3["units_resumed"] is False

    for rep in (rep1, rep2, rep3):
        rep.pop("wall_sec")
        rep.pop("units_resumed")
    assert rep1 == rep2 == rep3


def test_datacard_job_kill_rerun(tmp_path, testdata_dir):
    ck = str(tmp_path / "ck")
    out1, out2 = str(tmp_path / "card1.json"), str(tmp_path / "card2.json")
    base = [
        "jobs/run_datacard.py", "--sf-dir", testdata_dir,
        "--master", "local[4]", "--checkpoint-root", ck,
    ]
    _run([*base, "--out", out1])
    card1 = json.load(open(out1))
    assert card1["resumed_sections"] == []

    # kill simulation: the later half of the seven section commits (and
    # the card itself) were lost
    _drop(ck, ["dc_dup", "dc_pii", "dc_kanon", "dc_columns"])

    _run([*base, "--out", out2])
    card2 = json.load(open(out2))
    assert card2["resumed_sections"] == [
        "dc_composition", "dc_mix", "dc_quality"
    ]
    for c in (card1, card2):
        c.pop("wall_sec")
        c.pop("resumed_sections")
    assert card1 == card2
