"""Vectorized pandas UDFs (Arrow-batched) wrapping the pure kernels.

Every UDF here is the *slow path* by design policy (SURVEY.md §2.10): it
exists only where built-in ``pyspark.sql.functions`` cannot express the
reference's exact semantics (byte-parity extraction/chunking, MinHash,
OpenIE).  No per-row Python UDFs anywhere (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernels import hashing as hk
from ..kernels.extract import extract_main_text
from ..kernels.openie import extract_triples
from ..kernels.textproc import (
    calculate_relevance_score,
    chunk_text,
    is_follow_up_question,
    normalize_for_caching,
    truncate_content,
)

# ---------------------------------------------------------------------------
# Extraction (S4/S5): html binary -> boilerplate-stripped main text
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_main_text)


# ---------------------------------------------------------------------------
# Chunking (F1/F2): text -> array<string> of chunks; chunk indices come from
# posexplode (W4), so no window shuffle is ever needed for numbering.
# ---------------------------------------------------------------------------


def make_chunk_udf(chunk_size: int = 300, overlap: int = 20):
    @pandas_udf(ArrayType(StringType()))
    def chunk_udf(text: pd.Series) -> pd.Series:
        return text.map(lambda t: chunk_text(t, chunk_size, overlap))

    return chunk_udf


chunk_text_udf = make_chunk_udf()


# ---------------------------------------------------------------------------
# Normalization for embed-dedupe (F3) — byte-parity variant of the column
# expression in functions/text.py (used where the C# single-pass
# double-space replace must hold exactly).
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def normalize_for_caching_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: normalize_for_caching(t) if t is not None else None)


# ---------------------------------------------------------------------------
# Deterministic embedding (ada-002 stand-in, SURVEY.md §7.3)
# ---------------------------------------------------------------------------


def make_embed_udf(dim: int = 256):
    """Round 4: batched — ONE ``hashed_ngram_embeddings_batch`` call over
    the batch's DISTINCT texts (bit-identical to the scalar kernel; see
    its docstring) instead of a per-row ``text.map``.  Link-scoring
    batches repeat surfaces heavily (LSH pairs over a Zipf dictionary),
    so the distinct-dedup does most of the work reduction."""

    @pandas_udf(ArrayType(FloatType()))
    def embed_udf(text: pd.Series) -> pd.Series:
        vals = ["" if t is None else t for t in text]
        uniq = list(dict.fromkeys(vals))
        mat = hk.hashed_ngram_embeddings_batch(uniq, dim)
        idx = {t: i for i, t in enumerate(uniq)}
        take = np.fromiter((idx[t] for t in vals), dtype=np.int64,
                           count=len(vals))
        return pd.Series(list(mat[take]))

    return embed_udf


embed_udf = make_embed_udf()


# ---------------------------------------------------------------------------
# OpenIE triples (K1): text -> array<struct<subj,pred,obj,conf>>
# ---------------------------------------------------------------------------

TRIPLE_SCHEMA = ArrayType(
    StructType(
        [
            StructField("subj", StringType()),
            StructField("pred", StringType()),
            StructField("obj", StringType()),
            StructField("conf", FloatType()),
        ]
    )
)


@pandas_udf(TRIPLE_SCHEMA)
def triples_udf(text: pd.Series, lang: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [
                {"subj": s, "pred": p, "obj": o, "conf": c}
                for (s, p, o, c) in extract_triples(t, lg or "en")
            ]
            for t, lg in zip(text, lang)
        ]
    )


# ---------------------------------------------------------------------------
# MinHash signature + LSH band keys (K2/K3).  Signatures are uint64 viewed
# as int64 (opaque keys; sign is irrelevant).
# ---------------------------------------------------------------------------


def make_minhash_bands_udf(num_perm: int = 128, bands: int = 32,
                           shingle_k: int = 3, seed: int = 42):
    mh = hk.MinHasher(num_perm=num_perm, seed=seed)

    @pandas_udf(ArrayType(LongType()))
    def minhash_bands_udf(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sh = hk.char_shingles((t or "").lower(), k=shingle_k)
            sig = mh.signature(sh)
            out.append([int(np.int64(np.uint64(h))) for h in
                        np.array(mh.band_hashes(sig, bands), dtype=np.uint64)])
        return pd.Series(out)

    return minhash_bands_udf


def make_minhash_sig_udf(num_perm: int = 128, shingle_k: int = 3, seed: int = 42):
    mh = hk.MinHasher(num_perm=num_perm, seed=seed)

    @pandas_udf(ArrayType(LongType()))
    def minhash_sig_udf(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: mh.signature(
                hk.char_shingles((t or "").lower(), k=shingle_k)
            ).view(np.int64).tolist()
        )

    return minhash_sig_udf


# ---------------------------------------------------------------------------
# SimHash (dedup family) + rolling fingerprint
# ---------------------------------------------------------------------------


@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return text.map(
        lambda t: int(np.int64(np.uint64(hk.simhash64((t or "").lower().split()))))
    )


@pandas_udf(LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: hk.rolling_fingerprint(t or ""))


# ---------------------------------------------------------------------------
# Relevance scoring (F5) — exact-port variant for fixture parity; the
# SQL-expressible blend lives in functions/text.py.
# ---------------------------------------------------------------------------


def make_relevance_udf(query: str):
    @pandas_udf(DoubleType())
    def relevance_udf(content: pd.Series, vector_score: pd.Series) -> pd.Series:
        return pd.Series(
            [
                calculate_relevance_score(c or "", query,
                                          None if pd.isna(v) else float(v))
                for c, v in zip(content, vector_score)
            ]
        )

    return relevance_udf


@pandas_udf(BooleanType())
def follow_up_udf(query: pd.Series) -> pd.Series:
    return query.map(is_follow_up_question)


def make_truncate_udf(max_length: int = 150):
    @pandas_udf(StringType())
    def truncate_udf(content: pd.Series) -> pd.Series:
        return content.map(lambda c: truncate_content(c, max_length))

    return truncate_udf
