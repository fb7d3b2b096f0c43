"""Deterministic CDR-shaped fixture generator (FIXTURES.md, seed=42).

Synthesizes, with NO external data, the tables the KG-construction pipeline
consumes (shapes mandated by BASELINE.json ``input_hint`` / FIXTURES.md):

- ``documents_interleaved(doc_id, spans array<struct<kind,text,media_ref,offset>>)``
- ``mentions(doc_id, mention_id, type, mesh_id, start, end, text)``
- ``gold_relations(doc_id, rel_type, chem_mesh, dis_mesh)``
- ``mesh_dict(mesh_id, canonical_name, type, synonyms, parents, ancestors)``
- ``bpe_merges(rank, lhs, rhs)`` + ``vocab(tok_id, tok)``
- ``model_weights.npz`` (seeded transformer/bi-affine weights, FIXTURES.md §6)

Reference parity: the real bran consumes the BioCreative V CDR PubTator corpus
(SURVEY.md §2 S1, paper §3). That corpus is unavailable offline, so this
grammar embeds entity surface forms drawn from ``mesh_dict`` into generated
abstracts so that mentions, candidate pairs and CID relations exist by
construction, with char offsets that are correct *by construction* — which is
what makes the span-alignment property tests exact.

Determinism: entity dictionary, BPE and model weights use seed 42 and are
identical across scales; per-document content uses a seed derived from
(42, sf) so each scale is itself reproducible.

Document text convention (used consistently by every pipeline stage):
``full_text`` = the ``text`` of all text spans, in ``offset`` order, joined by
a single space. Each span's ``offset`` is the char position of its first char
in ``full_text``; media spans carry ``text=''`` and the offset at which they
sit. ``mentions.start/end`` index into ``full_text``.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_CHEM = 1000
N_DIS = 1000
N_FILLER = 150
N_MERGES = 400
ZIPF_EXP = 1.1

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "na",
    "pe", "qui", "ro", "sa", "ti", "ve", "wo", "xy", "za", "bri",
    "cle", "dro", "fla", "gri", "pla", "ska", "tru", "vol", "mer", "nol",
]


def _write(table: pa.Table, path: str) -> None:
    """Small row groups so Spark scans split into many tasks — a single
    row group serializes every downstream stage onto one core (scan tasks
    split at row-group boundaries)."""
    pq.write_table(table, path, row_group_size=2048)


def scale_rows(sf: float) -> int:
    """Doc counts per FIXTURES.md §1: sf0.001≈500, sf0.01≈5k, sf0.1≈50k."""
    return max(50, int(round(sf * 500_000)))


def _make_words(n: int, rng: np.random.Generator, min_syll: int = 2, max_syll: int = 3) -> list[str]:
    """n globally-unique pronounceable words from the syllable inventory."""
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n:
        k = int(rng.integers(min_syll, max_syll + 1))
        w = "".join(_SYLLABLES[int(i)] for i in rng.integers(0, len(_SYLLABLES), k))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


@dataclass
class Dictionary:
    """The seeded entity world: mesh ids, surfaces, hierarchy, filler words."""

    mesh_ids: list[str]
    types: list[str]
    canonical: list[str]
    synonyms: list[list[str]]
    parents: list[list[str]]
    ancestors: list[list[str]]
    fillers: list[str]
    chem_idx: np.ndarray
    dis_idx: np.ndarray
    zipf_chem: np.ndarray
    zipf_dis: np.ndarray


def build_dictionary() -> Dictionary:
    """mesh_dict + filler vocabulary; fixed seed, identical across scales.

    Hierarchy: within each type, entity i>root gets a parent among indices
    < i (biased toward low/hot indices), giving a forest of depth <= ~4;
    ``ancestors`` is the transitive closure used by the hypernym anti-join
    (SURVEY.md §2 J3 — reference: filter_hypernyms.py).
    """
    rng = np.random.default_rng(SEED)
    n_ent = N_CHEM + N_DIS
    # one global unique word pool: fillers first, then entity surfaces
    n_surface = n_ent * 5  # canonical + up to 4 synonyms
    words = _make_words(N_FILLER + n_surface, rng)
    fillers = words[:N_FILLER]
    pool = words[N_FILLER:]

    mesh_ids, types, canonical, synonyms = [], [], [], []
    w = 0
    for i in range(n_ent):
        is_chem = i < N_CHEM
        mesh_ids.append(f"{'C' if is_chem else 'D'}{i if is_chem else i - N_CHEM:06d}")
        types.append("Chemical" if is_chem else "Disease")
        canonical.append(pool[w])
        n_syn = int(rng.integers(1, 5))
        synonyms.append([pool[w]] + pool[w + 1 : w + 1 + n_syn])
        w += 5

    parents: list[list[str]] = [[] for _ in range(n_ent)]
    for base, n in ((0, N_CHEM), (N_CHEM, N_DIS)):
        for i in range(1, n):
            if rng.random() < 0.7:  # 30% roots
                # bias toward hot (low-index) parents => realistic MeSH-ish DAG
                p = int(rng.integers(0, i) * rng.random())
                parents[base + i] = [mesh_ids[base + p]]
    id_to_idx = {m: i for i, m in enumerate(mesh_ids)}
    ancestors: list[list[str]] = []
    for i in range(n_ent):
        seen: list[str] = []
        cur = parents[i]
        depth = 0
        while cur and depth < 8:
            nxt: list[str] = []
            for m in cur:
                if m not in seen:
                    seen.append(m)
                    nxt.extend(parents[id_to_idx[m]])
            cur = nxt
            depth += 1
        ancestors.append(seen)

    def zipf(n: int) -> np.ndarray:
        p = 1.0 / np.power(np.arange(1, n + 1), ZIPF_EXP)
        return p / p.sum()

    return Dictionary(
        mesh_ids=mesh_ids,
        types=types,
        canonical=canonical,
        synonyms=synonyms,
        parents=parents,
        ancestors=ancestors,
        fillers=fillers,
        chem_idx=np.arange(0, N_CHEM),
        dis_idx=np.arange(N_CHEM, N_CHEM + N_DIS),
        zipf_chem=zipf(N_CHEM),
        zipf_dis=zipf(N_DIS),
    )


# ---------------------------------------------------------------------------
# BPE (SURVEY.md §2 X1): plain pair-merge trainer over the seeded vocabulary,
# frozen once; identical across scales (FIXTURES.md §5).
# ---------------------------------------------------------------------------

EOW = "</w>"


def train_bpe(d: Dictionary, n_merges: int = N_MERGES) -> tuple[list[tuple[str, str]], list[str]]:
    """Learn merge list + vocab from the fixed word pool, Zipf-weighted."""
    freq: dict[str, float] = {w: 1.0 for w in d.fillers}
    for i, syns in enumerate(d.synonyms):
        wt = float(
            d.zipf_chem[i] * N_CHEM if i < N_CHEM else d.zipf_dis[i - N_CHEM] * N_DIS
        )
        for s in syns:
            freq[s] = freq.get(s, 0.0) + 10.0 * wt
    words: dict[tuple[str, ...], float] = {
        tuple(list(w) + [EOW]): f for w, f in freq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], float] = {}
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0.0) + f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], float] = {}
        for sym, f in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0.0) + f
        words = new_words
    toks: set[str] = set()
    for sym in words:
        toks.update(sym)
    for a, b in merges:
        toks.update((a, b))
    toks.update(list("abcdefghijklmnopqrstuvwxyz0123456789"))
    vocab = ["<pad>", "<unk>"] + sorted(toks)
    return merges, vocab


# ---------------------------------------------------------------------------
# Corpus grammar
# ---------------------------------------------------------------------------

_CONNECT = ["induces", "treats", "causes", "with", "after", "during", "reduces"]


def generate(sf: float, out_dir: str, docs: int | None = None) -> dict[str, str]:
    """Generate all fixture tables for scale ``sf`` into ``out_dir``.

    Returns {table_name: path}. Idempotent: skips if a _SUCCESS marker with
    the same (seed, sf, n_docs) signature already exists.
    """
    n_docs = docs if docs is not None else scale_rows(sf)
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_SUCCESS")
    sig = f"seed={SEED} sf={sf} docs={n_docs} v4"
    names = [
        "documents_interleaved", "mentions", "gold_relations",
        "mesh_dict", "bpe_merges", "vocab",
    ]
    paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in names}
    paths["model_weights"] = os.path.join(out_dir, "model_weights.npz")
    if os.path.exists(marker) and open(marker).read() == sig:
        return paths

    d = build_dictionary()
    merges, vocab = train_bpe(d)
    rng = np.random.default_rng([SEED, int(sf * 100000)])

    # --- pre-sample everything vectorized where it pays ------------------
    doc_rows, mention_rows, gold_rows = [], [], []
    n_chem_per = rng.integers(1, 4, n_docs)
    n_dis_per = rng.integers(1, 4, n_docs)
    n_body = rng.integers(2, 9, n_docs)
    n_media = rng.integers(0, 3, n_docs)

    for di in range(n_docs):
        doc_id = f"PM{di:07d}"
        chems = rng.choice(d.chem_idx, size=n_chem_per[di], replace=False, p=d.zipf_chem)
        diss = rng.choice(d.dis_idx, size=n_dis_per[di], replace=False, p=d.zipf_dis)
        ents = list(chems) + list(diss)

        # sentences: each a word list; surfaces are globally-unique words, so
        # occurrences are recovered exactly by scanning the final word lists.
        sents: list[list[str]] = []
        surf2ent: dict[str, int] = {}

        def emit_sentence(with_ents: list[int]) -> None:
            n_fill = int(rng.integers(3, 9))
            wlist = [d.fillers[int(i)] for i in rng.integers(0, N_FILLER, n_fill)]
            for e in with_ents:
                surf = d.synonyms[e][int(rng.integers(0, len(d.synonyms[e])))]
                surf2ent[surf] = e
                pos = int(rng.integers(0, len(wlist) + 1))
                if wlist and rng.random() < 0.5:
                    wlist.insert(min(pos, len(wlist) - 1), _CONNECT[int(rng.integers(0, len(_CONNECT)))])
                wlist.insert(pos, surf)
            sents.append(wlist)

        # title mentions the hottest chem; body sentences mention the rest
        emit_sentence([int(chems[0])])
        for bi in range(int(n_body[di])):
            mention_here = [int(e) for e in ents if rng.random() < 0.35]
            if bi < len(ents):  # guarantee every entity appears at least once
                mention_here.append(int(ents[bi]))
            emit_sentence(mention_here)
        seen_e = {e for e in surf2ent.values()}
        missing = [int(e) for e in ents if e not in seen_e]
        if missing:
            emit_sentence(missing)
        occs = [
            (si, wi, surf2ent[w], w)
            for si, wlist in enumerate(sents)
            for wi, w in enumerate(wlist)
            if w in surf2ent
        ]

        # ---- lay out spans & offsets (full_text convention, module doc) --
        spans: list[dict] = []
        full_parts: list[str] = []
        offset = 0
        media_slots = set(
            int(i) for i in rng.integers(1, len(sents) + 1, int(n_media[di]))
        )
        sent_char_start: list[int] = []
        for si, wlist in enumerate(sents):
            kind = "title" if si == 0 else "body"
            text = " ".join(wlist)
            sent_char_start.append(offset)
            spans.append({"kind": kind, "text": text, "media_ref": "", "offset": offset})
            full_parts.append(text)
            offset += len(text) + 1  # the joining single space
            if si + 1 in media_slots:
                mk = "image" if rng.random() < 0.7 else "table"
                spans.append({
                    "kind": mk, "text": "",
                    "media_ref": f"blob://media/{doc_id}/{si}", "offset": offset,
                })
        full_text = " ".join(full_parts)

        # ---- mentions with exact char offsets ----------------------------
        per_doc_mentions = []
        for mi, (si, wpos, e, surf) in enumerate(sorted(occs)):
            wlist = sents[si]
            prefix = " ".join(wlist[:wpos])
            start = sent_char_start[si] + (len(prefix) + 1 if prefix else 0)
            end = start + len(surf)
            assert full_text[start:end] == surf, (full_text[start:end], surf)
            per_doc_mentions.append(
                (doc_id, f"{doc_id}#{mi}", d.types[e], d.mesh_ids[e], start, end, surf)
            )
        mention_rows.extend(per_doc_mentions)

        # ---- gold CID relations (rate ≈ 0.3 over present pairs) ----------
        for c in chems:
            for dd in diss:
                if rng.random() < 0.3:
                    gold_rows.append((doc_id, "CID", d.mesh_ids[int(c)], d.mesh_ids[int(dd)]))

        doc_rows.append((doc_id, spans))

    # --- write parquet ----------------------------------------------------
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    _write(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in doc_rows], pa.string()),
                "spans": pa.array([r[1] for r in doc_rows], pa.list_(span_t)),
            }
        ),
        paths["documents_interleaved"],
    )
    m_cols = list(zip(*mention_rows)) if mention_rows else [[]] * 7
    _write(
        pa.table(
            {
                "doc_id": pa.array(m_cols[0], pa.string()),
                "mention_id": pa.array(m_cols[1], pa.string()),
                "type": pa.array(m_cols[2], pa.string()),
                "mesh_id": pa.array(m_cols[3], pa.string()),
                "start": pa.array(m_cols[4], pa.int32()),
                "end": pa.array(m_cols[5], pa.int32()),
                "text": pa.array(m_cols[6], pa.string()),
            }
        ),
        paths["mentions"],
    )
    g_cols = list(zip(*gold_rows)) if gold_rows else [[]] * 4
    _write(
        pa.table(
            {
                "doc_id": pa.array(g_cols[0], pa.string()),
                "rel_type": pa.array(g_cols[1], pa.string()),
                "chem_mesh": pa.array(g_cols[2], pa.string()),
                "dis_mesh": pa.array(g_cols[3], pa.string()),
            }
        ),
        paths["gold_relations"],
    )
    _write(
        pa.table(
            {
                "mesh_id": pa.array(d.mesh_ids, pa.string()),
                "canonical_name": pa.array(d.canonical, pa.string()),
                "type": pa.array(d.types, pa.string()),
                "synonyms": pa.array(d.synonyms, pa.list_(pa.string())),
                "parents": pa.array(d.parents, pa.list_(pa.string())),
                "ancestors": pa.array(d.ancestors, pa.list_(pa.string())),
            }
        ),
        paths["mesh_dict"],
    )
    _write(
        pa.table(
            {
                "rank": pa.array(range(len(merges)), pa.int32()),
                "lhs": pa.array([m[0] for m in merges], pa.string()),
                "rhs": pa.array([m[1] for m in merges], pa.string()),
            }
        ),
        paths["bpe_merges"],
    )
    _write(
        pa.table(
            {
                "tok_id": pa.array(range(len(vocab)), pa.int32()),
                "tok": pa.array(vocab, pa.string()),
            }
        ),
        paths["vocab"],
    )
    save_model_weights(paths["model_weights"], vocab_size=len(vocab))
    with open(marker, "w") as f:
        f.write(sig)
    return paths


def save_model_weights(
    path: str,
    vocab_size: int,
    d_model: int = 64,
    n_blocks: int = 2,
    n_heads: int = 4,
    d_ff: int = 128,
    max_len: int = 512,
    n_rels: int = 2,
    n_ner: int = 3,
) -> None:
    """Seeded weights per FIXTURES.md §6 (paper §2 shapes; SURVEY.md D6)."""
    rng = np.random.default_rng(SEED)
    s = 0.02
    w: dict[str, np.ndarray] = {
        "embed": rng.normal(0, s, (vocab_size, d_model)),
        "pos": rng.normal(0, s, (max_len, d_model)),
        "head_mlp": rng.normal(0, s, (d_model, d_model)),
        "tail_mlp": rng.normal(0, s, (d_model, d_model)),
        "biaffine": rng.normal(0, s, (d_model, n_rels, d_model)),
        "ner": rng.normal(0, s, (d_model, n_ner)),
    }
    for b in range(n_blocks):
        for nm in ("Wq", "Wk", "Wv", "Wo"):
            w[f"b{b}.{nm}"] = rng.normal(0, s, (d_model, d_model))
        w[f"b{b}.conv1"] = rng.normal(0, s, (1, d_model, d_ff))   # width-1
        w[f"b{b}.conv2"] = rng.normal(0, s, (5, d_ff, d_model))   # width-5 (paper §2.1)
        for ln in ("ln1", "ln2"):
            w[f"b{b}.{ln}.g"] = np.ones(d_model)
            w[f"b{b}.{ln}.b"] = np.zeros(d_model)
    meta = np.array([d_model, n_blocks, n_heads, d_ff, max_len, n_rels, n_ner])
    np.savez(path, __meta__=meta, **{k: v.astype(np.float32) for k, v in w.items()})


DEFAULT_FIXTURE_ROOT = os.environ.get(
    "BRAN_SPARK_FIXTURES", os.path.join(os.path.dirname(__file__), "..", "..", "fixtures_data")
)


def fixture_dir(sf: float) -> str:
    return os.path.abspath(os.path.join(DEFAULT_FIXTURE_ROOT, f"sf{sf}"))


def ensure(sf: float) -> dict[str, str]:
    """Generate-if-missing; the standard accessor used by tests/jobs/bench."""
    return generate(sf, fixture_dir(sf))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--out", type=str, default=None)
    a = ap.parse_args()
    out = a.out or fixture_dir(a.sf)
    p = generate(a.sf, out)
    print({k: v for k, v in p.items()})
