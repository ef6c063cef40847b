"""Deterministic hashing kernels: MinHash, LSH banding, SimHash, rolling
fingerprints, and the hashed-ngram embedding.

These generalize the reference's exact-key embedding cache
(``Services/EmbeddingService.cs:33-34``) to near-duplicate detection at
scale (SURVEY.md K2/K3), and replace the opaque ada-002 embedder
(``Services/EmbeddingService.cs:45-46``) with a deterministic local kernel:
the reference treats embeddings purely as cosine-comparable vectors
(``Services/SearchService.cs:88``), so any fixed deterministic embedding
preserves every downstream operator's semantics.

Everything is numpy-vectorized per document and seeded — no randomness at
call time, no dependencies beyond numpy/hashlib.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE_61 = (1 << 61) - 1
_MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# Version of the numpy MinHash construction (char_shingles + MinHasher).
# The streaming near-dup gate persists these signatures in its rep state
# (streaming/ingest.py) — signatures from different versions are
# mutually incomparable, so any change to char_shingles/MinHasher MUST
# bump this, making mixed-version state resumes fail loudly instead of
# silently losing recall.  v1: blake2b shingle hashes, Mersenne-61
# affine permutations (unchanged since round 1).
MINHASH_KERNEL_VERSION = 1


def stable_hash64(s: str | bytes) -> int:
    """Deterministic 64-bit hash (blake2b), stable across processes and
    Python versions — never use built-in ``hash`` (PYTHONHASHSEED)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def char_shingles(text: str, k: int = 5) -> list[int]:
    """Distinct k-character shingle hashes of a (pre-normalized) string."""
    if len(text) < k:
        return [stable_hash64(text)] if text else []
    seen = {text[i:i + k] for i in range(len(text) - k + 1)}
    return [stable_hash64(sh) for sh in seen]


class MinHasher:
    """128-permutation MinHash using the multiply-shift family
    ``h_i(x) = a_i * x + b_i (mod 2^64)`` with odd ``a_i`` — native uint64
    wraparound arithmetic, fully vectorized (shingles × perms matrix per
    document), parameters drawn from a seeded RNG so signatures are
    reproducible everywhere."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        a = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
        self.a = (a << np.uint64(1)) | np.uint64(1)  # odd multipliers
        self.b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)

    def signature(self, shingle_hashes: list[int]) -> np.ndarray:
        """Signature as ``uint64[num_perm]``; empty input -> all MAX."""
        if not shingle_hashes:
            return np.full(self.num_perm, _MAX_U64, dtype=np.uint64)
        x = np.asarray(shingle_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = x[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def band_hashes(self, signature: np.ndarray, bands: int = 32) -> list[int]:
        """LSH banding (K3): split the signature into ``bands`` rows-per-band
        groups and hash each band to one 64-bit bucket key."""
        rows = self.num_perm // bands
        out = []
        for b in range(bands):
            seg = signature[b * rows:(b + 1) * rows]
            out.append(stable_hash64(seg.tobytes()))
        return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token multiset."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = stable_hash64(tok)
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, base: int = 31) -> int:
    """Polynomial rolling hash mod 2^61-1 over code points — a cheap
    whole-document fingerprint (training-data pipeline op)."""
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % _MERSENNE_61
    return h


# ---------------------------------------------------------------------------
# Deterministic hashed-ngram embedding (ada-002 stand-in, SURVEY.md §7.3)
# ---------------------------------------------------------------------------


# Per-worker memo of feature -> 64-bit hash.  Natural-language token
# frequencies are Zipfian, so the hit rate is high and the blake2b cost
# collapses; bounded so a pathological vocabulary cannot OOM a worker.
_FEATURE_HASH_CACHE: dict[str, int] = {}
_FEATURE_HASH_CACHE_MAX = 1_000_000


def _feature_hash(f: str) -> int:
    h = _FEATURE_HASH_CACHE.get(f)
    if h is None:
        h = stable_hash64(f)
        if len(_FEATURE_HASH_CACHE) < _FEATURE_HASH_CACHE_MAX:
            _FEATURE_HASH_CACHE[f] = h
    return h


def hashed_ngram_embeddings_batch(texts: list[str], dim: int = 256) -> np.ndarray:
    """Batch variant of :func:`hashed_ngram_embedding`: ONE bincount over
    every document's features instead of one numpy call per text —
    removes the per-call allocation overhead that dominated the fused
    chunk kernel (measured ~50 µs/chunk scalar vs ~15 µs/chunk batched).

    Bit-identical to the scalar kernel: the accumulated values are sums
    of ±1.0 (small integers, exactly associative in float64), so the
    different accumulation path (bincount vs add.at) produces the same
    float64 matrix, and norm/divide/cast follow the same expressions.
    Returns float32[n, dim]."""
    n = len(texts)
    mat = np.zeros((n, dim), dtype=np.float64)
    feats: list[str] = []
    counts = np.zeros(n, dtype=np.int64)
    for i, text in enumerate(texts):
        toks = text.lower().split()
        if not toks:
            continue
        fs = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        feats.extend(fs)
        counts[i] = len(fs)
    if feats:
        # inline the memo hit path (dict.get bound once, list comp): the
        # per-feature generator + function call + double dict lookup of
        # the fromiter(_feature_hash(f)) form was ~20% of the whole fused
        # chunk kernel; same values, same cache, same bound.
        cache_get = _FEATURE_HASH_CACHE.get
        hs = np.array(
            [h if (h := cache_get(f)) is not None else _feature_hash(f)
             for f in feats],
            dtype=np.uint64,
        )
        buckets = (hs % np.uint64(dim)).astype(np.int64)
        signs = np.where((hs >> np.uint64(63)) & np.uint64(1), 1.0, -1.0)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        mat = np.bincount(
            rows * dim + buckets, weights=signs, minlength=n * dim
        ).reshape(n, dim)
    norms = np.linalg.norm(mat, axis=1)
    nz = norms > 0
    mat[nz] /= norms[nz, None]
    return mat.astype(np.float32)


def hashed_ngram_embedding(text: str, dim: int = 256) -> np.ndarray:
    """Signed feature-hashing of unigrams + word bigrams, L2-normalized
    float32[dim].  Deterministic; similar texts get high cosine."""
    toks = text.lower().split()
    if not toks:
        return np.zeros(dim, dtype=np.float32)
    feats = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    hs = np.fromiter((_feature_hash(f) for f in feats),
                     dtype=np.uint64, count=len(feats))
    buckets = (hs % np.uint64(dim)).astype(np.int64)
    signs = np.where((hs >> np.uint64(63)) & np.uint64(1), 1.0, -1.0)
    vec = np.zeros(dim, dtype=np.float64)
    np.add.at(vec, buckets, signs)
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec /= norm
    return vec.astype(np.float32)
