"""Property-based tests (hypothesis): the distributed operators against
tiny exact local references over RANDOM inputs — catching the edge shapes
(self-loops, stars, chains, duplicate rows, ties) that hand-picked fixtures
miss. Example counts are small because every example runs Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random small edge lists over a bounded node universe
_edges_st = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0,
    max_size=25,
)


def _local_components(edges: list[tuple[int, int]]) -> dict[str, str]:
    """Union-find reference: node → min-id component representative."""
    parent: dict[str, str] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        u, v = f"n{a}", f"n{b}"
        for x in (u, v):
            parent.setdefault(x, x)
        ra, rb = find(u), find(v)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # skip isolated self-loop-only nodes the operator also drops
    nodes = {f"n{a}" for a, b in edges if a != b} | {
        f"n{b}" for a, b in edges if a != b
    }
    return {x: find(x) for x in nodes}


@given(edges=_edges_st)
@_SET
def test_connected_components_matches_union_find(spark, edges):
    from bran_spark.operators.components import connected_components

    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges] or [("z", "z")],
        "id_a string, id_b string",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _local_components(edges)


@given(edges=_edges_st)
@_SET
def test_pagerank_mass_bounded_and_total(spark, edges):
    """Integer PageRank: every node emitted exactly once, ranks positive,
    total mass ≤ N·scale (floor loss only ever shrinks it)."""
    from bran_spark.operators.graphalgo import (
        PR_SCALE,
        pagerank_fixed_point,
        symmetric_edges,
    )

    real = [(f"n{a}", f"n{b}") for a, b in edges if a != b]
    if not real:
        return
    sym = symmetric_edges(
        spark.createDataFrame(real, "subj string, obj string")
    )
    rows = pagerank_fixed_point(sym, iters=3).collect()
    nodes = {x for e in real for x in e}
    assert {r["entity"] for r in rows} == nodes
    assert all(r["rank_fp"] > 0 for r in rows)
    assert sum(r["rank_fp"] for r in rows) <= len(nodes) * PR_SCALE


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 5), st.integers(0, 3)),
        min_size=1,
        max_size=20,
    )
)
@_SET
def test_merge_latest_idempotent_and_single_per_key(spark, rows):
    """merge(merge(b,u), ∅) == merge(b,u), and exactly one row per key."""
    from bran_spark.operators.asof import merge_latest

    df = spark.createDataFrame(
        [(i, f"k{k}", ts, float(i)) for i, (k, ts, _) in enumerate(rows)],
        "event_id long, k string, ts long, value double",
    )
    empty = df.where(F.lit(False))
    once = merge_latest(df, empty, ["k"], "ts", "event_id")
    twice = merge_latest(once, empty, ["k"], "ts", "event_id")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    keys = [r[1] for r in a]
    assert len(keys) == len(set(keys))
    # winner per key is the max (ts, event_id) — local reference
    import collections

    best: dict[str, tuple] = {}
    for i, (k, ts, _) in enumerate(rows):
        cur = (ts, i)
        if f"k{k}" not in best or cur > best[f"k{k}"]:
            best[f"k{k}"] = cur
    assert {r[1]: r[0] for r in a} == {k: v[1] for k, v in best.items()}


@given(s=st.text(alphabet="ab c", min_size=0, max_size=20), n=st.integers(2, 4))
@_SET
def test_char_shingles_count_and_reconstruction(spark, s, n):
    from bran_spark.functions.text import char_shingles

    df = spark.createDataFrame([(s,)], "s string")
    sh = df.select(char_shingles("s", n).alias("sh")).head()["sh"]
    low = s.lower()
    assert len(sh) == max(len(low) - n, 0) + 1
    if len(low) >= n:
        # overlapping shingles reconstruct the string
        assert sh[0] + "".join(x[-1] for x in sh[1:]) == low
        assert all(len(x) == n for x in sh)


_texts_st = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=6
)


@given(texts=_texts_st, size=st.integers(2, 6), stride=st.integers(1, 5))
@_SET
def test_chunking_covers_every_word_exactly(spark, texts, size, stride):
    """Property: chunk starts are 0, stride, 2·stride… < n; every word
    position is covered by ≥1 chunk when stride ≤ size; chunk word counts
    are exact; reassembling chunk 0 of a doc gives its first `size` words."""
    from bran_spark.operators.packing import chunk_documents

    stride = min(stride, size)  # overlap regime (the training default)
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    rows = chunk_documents(docs, size=size, stride=stride).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        words = t.strip().lower().split()
        words = words if words else [""]  # split(" +") of "" is [""]
        got = sorted(by_doc.get(str(i), []), key=lambda r: r.chunk_idx)
        n = len(words)
        assert [r.start_tok for r in got] == list(range(0, n, stride))
        covered = set()
        for r in got:
            assert r.n_chunk_toks == min(size, n - r.start_tok)
            covered |= set(range(r.start_tok, r.start_tok + r.n_chunk_toks))
        assert covered == set(range(n))
        if got:
            assert got[0].chunk_text == " ".join(words[:size])


@given(texts=_texts_st)
@_SET
def test_containment_identities(spark, texts):
    """Property: containments lie in (0, 1]; the two directions agree on
    the common-shingle count (c_a·n_a == c_b·n_b within rounding); a doc
    paired with itself never appears (id_a < id_b)."""
    from bran_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = containment_pairs(
        docs, "doc_id", "text", n=2, min_containment=0.01, max_df=50
    ).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.0 < r.containment_a <= 1.0
        assert 0.0 < r.containment_b <= 1.0


@given(
    toks=st.lists(st.integers(1, 50), min_size=1, max_size=30),
    budget=st.integers(5, 100),
)
@_SET
def test_packing_bins_monotone_and_exact(spark, toks, budget):
    """Property vs a local exact prefix sum: offsets equal the running sum
    in id order, bin ids are non-decreasing, and every bin boundary is
    exactly offset // budget."""
    from bran_spark.operators.packing import pack_token_bins

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(toks)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        pack_token_bins(df, "doc_id", "n_tokens", budget=budget).collect(),
        key=lambda r: r.id,
    )
    acc = 0
    prev_bin = 0
    for r, n in zip(rows, toks):
        assert r.offset == acc
        assert r.bin_id == acc // budget
        assert r.bin_id >= prev_bin
        prev_bin = r.bin_id
        acc += n


def test_isotonic_calibration_matches_reference_pava(spark):
    """Property: the minimax-identity fit equals the classic sequential
    pool-adjacent-violators algorithm on random binned data."""
    import random

    from bran_spark.operators.evaluate import isotonic_calibration

    rnd = random.Random(23)
    for trial in range(4):
        n_bins = rnd.randint(3, 8)
        rows = []
        weights, rates = [], []
        for b in range(n_bins):
            n = rnd.randint(1, 12)
            pos = rnd.randint(0, n)
            weights.append(n)
            rates.append(pos / n)
            p = (b + 0.5) / n_bins  # lands exactly in bin b
            rows += [(p, 1)] * pos + [(p, 0)] * (n - pos)
        df = spark.createDataFrame(rows, "p double, label int")
        got = {
            r.bin: r.rate_iso
            for r in isotonic_calibration(df, n_bins=n_bins).collect()
        }
        # reference: sequential PAVA with weight pooling
        blocks = [[rates[i], weights[i]] for i in range(n_bins)]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] > blocks[i + 1][0] + 1e-15:
                r1, w1 = blocks[i]
                r2, w2 = blocks[i + 1]
                blocks[i] = [(r1 * w1 + r2 * w2) / (w1 + w2), w1 + w2]
                del blocks[i + 1]
                i = max(i - 1, 0)
            else:
                i += 1
        # expand pooled-block means back to per-bin values by weight
        iso = []
        bi = 0
        for r, w in blocks:
            spanned = 0
            while spanned < w - 1e-9:
                spanned += weights[bi]
                iso.append(r)
                bi += 1
        assert len(iso) == n_bins, (trial, iso, weights)
        for b in range(n_bins):
            assert abs(got[b] - round(iso[b], 6)) < 5e-6, (
                trial, b, got[b], iso[b],
            )


def test_maximal_matching_random_graphs_valid_and_maximal(spark):
    import random

    from bran_spark.operators.graphalgo import maximal_matching

    rnd = random.Random(31)
    for trial in range(3):
        n = rnd.randint(6, 12)
        edges = set()
        while len(edges) < n + 4:
            a, b = rnd.sample(range(n + 5), 2)
            u, v = sorted([f"n{a}", f"n{b}"])
            edges.add((u, v, rnd.randint(1, 9)))
        df = spark.createDataFrame(
            list(edges), "u string, v string, w long"
        )
        got = maximal_matching(df, max_rounds=len(edges)).collect()
        used = [x for r in got for x in (r.u, r.v)]
        assert len(used) == len(set(used)), f"trial {trial}: not a matching"
        for u, v, _ in edges:
            assert u in used or v in used, (
                f"trial {trial}: edge ({u},{v}) untouched -> not maximal"
            )
