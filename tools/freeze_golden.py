"""Freeze the golden triples for the parity gate (SURVEY.md §5.1).

The in-sandbox substitute for the reference's emitted predictions: the
flagship DAG's output on the seeded sf0.001 corpus with the seeded weights,
frozen once and committed under tests/golden/. Regenerate ONLY with an
explicit rerun of this script (a deliberate decision, not a test side
effect).

    python tools/freeze_golden.py
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bran_spark.fixtures.gen import ensure, fixture_dir  # noqa: E402
from bran_spark.plans.pipeline import flagship  # noqa: E402
from bran_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "triples_sf0.001.csv")


def main() -> None:
    ensure(0.001)
    spark = get_spark("freeze_golden", master="local[8]")
    df = flagship(spark, fixture_dir(0.001))
    rows = sorted(
        (r.subj, r.pred, r.obj, r.doc_id, round(r.score, 6))
        for r in df.select("subj", "pred", "obj", "doc_id", "score").collect()
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["subj", "pred", "obj", "doc_id", "score"])
        w.writerows(rows)
    print(f"froze {len(rows)} golden triples -> {os.path.abspath(OUT)}")
    spark.stop()


if __name__ == "__main__":
    main()
