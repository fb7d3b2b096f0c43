"""Standalone scorer-kernel concurrency microbench (no Spark).

Spawns N worker processes, each encoding the same seeded document set with
the NumPy transformer, and reports aggregate docs/s at two process counts —
isolating the python-side scaling (allocator/kernel/cache contention) from
the Spark machinery. Knobs under test ride in env vars:

    MALLOC_MMAP_THRESHOLD_ / MALLOC_TRIM_THRESHOLD_  glibc malloc tuning
    BRAN_BENCH_BATCH                                 encode batch size

    python tools/encoder_concurrency_bench.py [--docs 2000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(n_docs: int, batch: int, seed: int, q) -> None:
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    import numpy as np

    from bran_spark.fixtures.gen import fixture_dir
    from bran_spark.model.encoder import Weights, encode_batch, encode_one

    w = Weights.load(os.path.join(fixture_dir(0.001), "model_weights.npz"))
    rng = np.random.default_rng(seed)
    vocab_n = w["embed"].shape[0]
    lengths = rng.integers(20, min(128, w.max_len), size=n_docs)
    docs = [rng.integers(2, vocab_n, size=int(L)).astype(np.int64) for L in lengths]
    t0 = time.time()
    if batch <= 1:
        for d in docs:
            encode_one(d, w)
    else:
        by_len: dict[int, list] = {}
        for d in docs:
            by_len.setdefault(len(d), []).append(d)
        for group in by_len.values():
            for i in range(0, len(group), batch):
                encode_batch(group[i : i + batch], w)
    q.put(n_docs / (time.time() - t0))


def run_level(procs: int, docs_per_proc: int, batch: int) -> float:
    q = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(docs_per_proc, batch, 1000 + i, q))
        for i in range(procs)
    ]
    t0 = time.time()
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    return procs * docs_per_proc / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BRAN_BENCH_BATCH", "1")))
    args = ap.parse_args()

    from bran_spark.fixtures.gen import ensure

    ensure(0.001)
    lo = run_level(args.low, args.docs, args.batch)
    hi = run_level(args.high, args.docs, args.batch)
    eff = (hi / lo) / (args.high / args.low)
    print(
        json.dumps(
            {
                "batch": args.batch,
                "mmap_thresh": os.environ.get("MALLOC_MMAP_THRESHOLD_"),
                f"docs_s_{args.low}p": round(lo, 1),
                f"docs_s_{args.high}p": round(hi, 1),
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
