"""Property tests for the hashing kernels (MinHash accuracy, LSH recall on
planted near-duplicates, SimHash locality, embedding determinism)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from driftmind_spark.kernels import hashing as hk
from driftmind_spark.kernels.vocab import ENTITY_SURFACES


def test_stable_hash_is_stable():
    assert hk.stable_hash64("acme") == hk.stable_hash64("acme")
    assert hk.stable_hash64("acme") != hk.stable_hash64("acmf")


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=0, max_size=200), st.text(min_size=0, max_size=200))
def test_minhash_estimates_jaccard(a, b):
    mh = hk.MinHasher(num_perm=256)
    sa = set(hk.char_shingles(a))
    sb = set(hk.char_shingles(b))
    if not sa or not sb:
        return
    true_j = hk.jaccard(sa, sb)
    est = float((mh.signature(list(sa)) == mh.signature(list(sb))).mean())
    assert abs(est - true_j) < 0.25  # 256 perms -> se ~ 0.03; generous bound


def test_minhash_identical_inputs():
    mh = hk.MinHasher()
    s = hk.char_shingles("identical text")
    assert (mh.signature(s) == mh.signature(list(s))).all()


def test_lsh_recall_on_planted_near_duplicates():
    """Every planted surface-variant pair with Jaccard >= 0.4 must share at
    least one LSH band (b=32, r=4 -> P(collide) at j=0.4 is ~1-(1-0.4^4)^32
    ~ 0.57; we check the aggregate recall over the vocabulary instead of
    per-pair, with normalized lowercase shingles as the pipeline does)."""
    mh = hk.MinHasher(num_perm=128)
    hits = 0
    total = 0
    for canon, surfaces in ENTITY_SURFACES.items():
        base = hk.char_shingles(surfaces[0].lower(), k=3)
        sig_base = mh.signature(base)
        bands_base = set(mh.band_hashes(sig_base))
        for variant in surfaces[1:]:
            vs = hk.char_shingles(variant.lower(), k=3)
            if hk.jaccard(set(base), set(vs)) < 0.4:
                continue
            total += 1
            sig_v = mh.signature(vs)
            if bands_base & set(mh.band_hashes(sig_v)):
                hits += 1
    assert total >= 20
    assert hits / total >= 0.9, f"LSH recall {hits}/{total}"


def test_simhash_locality():
    a = hk.simhash64("the quick brown fox jumps over the dog".split())
    b = hk.simhash64("the quick brown fox leaps over the dog".split())
    c = hk.simhash64("entirely different content about spark shuffles".split())
    assert hk.hamming64(a, b) < hk.hamming64(a, c)


def test_rolling_fingerprint_deterministic():
    assert hk.rolling_fingerprint("abc") == hk.rolling_fingerprint("abc")
    assert hk.rolling_fingerprint("abc") != hk.rolling_fingerprint("abd")


def test_embedding_properties():
    e = hk.hashed_ngram_embedding("acme corp acquired beta", dim=128)
    assert e.shape == (128,) and e.dtype == np.float32
    assert abs(float(np.linalg.norm(e)) - 1.0) < 1e-5
    e2 = hk.hashed_ngram_embedding("acme corp acquired beta", dim=128)
    assert (e == e2).all()
    # empty text -> zero vector, no NaN
    z = hk.hashed_ngram_embedding("", dim=128)
    assert float(np.linalg.norm(z)) == 0.0


def test_word_ngrams():
    assert hk.word_ngrams("a b c d", 3) == {"a b c", "b c d"}
    assert hk.word_ngrams("a", 3) == {"a"}
    assert hk.word_ngrams("", 3) == set()


@given(st.lists(st.text(max_size=40), max_size=30))
@settings(max_examples=40, deadline=None)
def test_batch_embedding_bit_identical_to_scalar(texts):
    """The vectorized batch kernel must be BIT-identical to the scalar
    kernel (sums of ±1 are exact in float64, so the different
    accumulation path changes nothing)."""
    batch = hk.hashed_ngram_embeddings_batch(texts, 32)
    assert batch.shape == (len(texts), 32)
    for i, t in enumerate(texts):
        assert np.array_equal(batch[i], hk.hashed_ngram_embedding(t, 32))
