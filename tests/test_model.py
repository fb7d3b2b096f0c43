"""NumPy encoder/scorer kernels (P1/P2/P4): determinism, batch invariance,
masking correctness — the properties the parallelism-invariance gate needs."""

from __future__ import annotations

import numpy as np

from bran_spark.fixtures.gen import ensure, fixture_dir
from bran_spark.model.encoder import Weights, encode_batch, ner_logits, score_pairs


def _weights() -> Weights:
    ensure(0.001)
    return Weights.load(f"{fixture_dir(0.001)}/model_weights.npz")


def test_encode_deterministic():
    w = _weights()
    ids = [np.arange(2, 40) % (w["embed"].shape[0] - 2) + 2]
    a = encode_batch(ids, w)[0]
    b = encode_batch(ids, w)[0]
    assert a.shape == (38, w.d_model)
    np.testing.assert_array_equal(a, b)


def test_batch_composition_invariance():
    """Padding/masking must not change per-doc outputs: encode docs of very
    different lengths together vs alone — identical results (this is what
    makes results invariant to Arrow batch composition and parallelism)."""
    w = _weights()
    rng = np.random.default_rng(7)
    docs = [
        rng.integers(2, 100, size=n).astype(np.int64) for n in (5, 37, 81, 12)
    ]
    together = encode_batch(docs, w)
    alone = [encode_batch([d], w)[0] for d in docs]
    for t, a in zip(together, alone):
        np.testing.assert_allclose(t, a, rtol=0, atol=2e-5)


def test_truncation_at_max_len():
    w = _weights()
    long = np.ones(w.max_len + 100, dtype=np.int64) * 3
    out = encode_batch([long], w)[0]
    assert out.shape[0] == w.max_len


def test_score_pairs_shapes_and_determinism():
    w = _weights()
    enc = encode_batch([np.arange(2, 60, dtype=np.int64)], w)[0]
    heads = [(0, 3), (10, 12)]
    tails = [(20, 22), (30, 31), (40, 45)]
    s1 = score_pairs(enc, heads, tails, w)
    s2 = score_pairs(enc, heads, tails, w)
    assert s1.shape == (2, 3)
    np.testing.assert_array_equal(s1, s2)
    assert np.isfinite(s1).all()


def test_ner_head():
    w = _weights()
    enc = encode_batch([np.arange(2, 30, dtype=np.int64)], w)[0]
    logits = ner_logits(enc, w)
    assert logits.shape == (28, w.n_ner)
