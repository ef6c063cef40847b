"""Deduplication operators for training-data pipelines: exact,
n-gram-Jaccard, portable-MinHash-LSH, SimHash, embedding-cosine.

Scale design: every variant is blocked — no unblocked O(n^2) pair
generation anywhere.  Exact dedup is one hash aggregation; Jaccard and
cosine near-dup run inside LSH/length blocks; SimHash pairs join on
rotated prefix bands (Manku et al., WWW'07 style).

The md5-based MinHash here is deliberately *portable SQL* (same
arithmetic runs in the DuckDB oracle); the high-throughput numpy MinHash
for the KG path lives in kernels/hashing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import cosine_sim
from ..functions.udfs import simhash_udf

NORM = lambda c: F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")  # noqa: E731


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicates by normalized-text hash: one row per distinct
    content with the keeper (min doc_id) and copy count."""
    return (
        docs.select("doc_id", F.md5(NORM(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


def _word_ngrams_col(toks: F.Column, n: int) -> F.Column:
    """Word n-grams via zip_with over shifted slices — stays inside
    whole-stage codegen (an element_at-per-index transform lambda was
    measured 12x slower: it drops to interpreted eval per element)."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    out = F.slice(toks, 1, length)
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, length)
        out = F.zip_with(out, shifted, lambda acc, t: F.concat_ws(" ", acc, t))
    return out


def _shingles(text_col: F.Column, k: int = 5) -> F.Column:
    """Distinct k-char shingles as an array column (JVM-side)."""
    n = F.greatest(F.length(text_col) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.substring(text_col, i, k)
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str = "source",
    max_gram_df: int = 1000,
) -> DataFrame:
    """Word-n-gram Jaccard near-dup pairs within blocks.

    Blocking on ``block_col`` keeps the pair space linear per block; at
    web scale the block key is an LSH band or URL host.  Word n-grams are
    built with sequence+transform (pure codegen).

    ``max_gram_df`` caps the document frequency of a gram WITHIN its
    block: the postings join costs O(Σ_g df_g²), so one boilerplate gram
    shared by every document ("all rights reserved") alone turns a block
    into O(n²) pairs.  Grams above the cap carry no discriminative
    signal and are dropped from the SHARED count (the |A|/|B| sizes stay
    exact, so capped jaccard only under-counts pairs held together by
    ubiquitous grams).  The cap is mirrored in the DuckDB oracle, and
    the dropped-gram count is observable via ``hot_gram_stats``."""
    toks = F.filter(F.split(NORM(F.col(text_col)), " "), lambda t: t != "")
    grams = F.when(
        F.size(toks) >= n, F.array_distinct(_word_ngrams_col(toks, n))
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    base = docs.select(
        F.col("doc_id"), F.col(block_col).alias("block"), grams.alias("grams")
    )
    # Inverted-index shape instead of pairwise array_intersect: explode to
    # (block, gram, doc, |grams|) postings, equi-join postings on
    # (block, gram) to count shared grams per pair, then
    # jaccard = shared/(|A|+|B|-shared).  Pairwise array ops cost
    # O(pairs x |grams|); the postings join costs O(sum_g df_g^2) per
    # block, which is what actually scales (and what a gram-frequency cap
    # would bound at web scale).  |grams| rides along in the postings so
    # grams are computed exactly once per self-join side.
    postings = base.select(
        "block", "doc_id", F.size("grams").alias("n"),
        F.explode("grams").alias("gram"),
    )
    if max_gram_df is not None:
        # anti-join against the HOT grams only: the over-cap list is tiny
        # by construction (few ubiquitous boilerplate grams), so it
        # broadcasts — joining postings against the full below-cap gram
        # dictionary would shuffle the whole postings stream instead
        hot = (
            postings.groupBy("block", "gram")
            .agg(F.count("*").alias("gram_df"))
            .filter(F.col("gram_df") > max_gram_df)
            .select("block", "gram")
        )
        postings = postings.join(F.broadcast(hot), ["block", "gram"], "left_anti")
    a, b = postings.alias("a"), postings.alias("b")
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        a.join(b, ["block", "gram"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("shared"),
            F.first(F.col("a.n")).alias("n_a"),
            F.first(F.col("b.n")).alias("n_b"),
        )
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


_MINHASH_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def hot_gram_stats(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    block_col: str = "source",
    max_gram_df: int = 1000,
) -> DataFrame:
    """Observability for the gram-df cap (no silent truncation): the
    grams ``ngram_jaccard_pairs`` dropped, with their block and df."""
    toks = F.filter(F.split(NORM(F.col(text_col)), " "), lambda t: t != "")
    grams = F.when(
        F.size(toks) >= n, F.array_distinct(_word_ngrams_col(toks, n))
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    postings = docs.select(
        F.col(block_col).alias("block"), F.explode(grams).alias("gram")
    )
    return (
        postings.groupBy("block", "gram")
        .agg(F.count("*").alias("gram_df"))
        .filter(F.col("gram_df") > max_gram_df)
    )


def minhash_params(num_perm: int = 16, seed: int = 7) -> list[tuple[int, int]]:
    """Fixed (a_i, b_i) universal-hash constants shared by the Spark
    operator and the DuckDB oracle SQL (both embed them as literals)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MINHASH_P, size=num_perm)
    b = rng.randint(0, _MINHASH_P, size=num_perm)
    return list(zip(a.tolist(), b.tolist()))


def minhash_lsh_pairs_sql(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """Portable MinHash-LSH candidate pairs, ONE md5 per shingle:
    ``x = hex32(md5(sh)[:8]) mod P`` and slot i = ``min((a_i*x+b_i) mod
    P)`` over the doc's sampled shingles (P = 2^31-1, fixed seeded a/b) —
    identical arithmetic in Spark (``conv``) and the DuckDB oracle
    (``'0x'||substr`` cast), all JVM-side, no Python.

    The previous variant computed 16 independent ``md5(i || sh)`` per
    exploded shingle row; that md5 x16 was 42% of the whole round-1
    bench.  Deriving all 16 permutations from one md5 via a universal
    hash family keeps the oracle-portable arithmetic at ~1/10 the cost.
    ANSI-overflow-safe: (x mod P) < 2^31 and a_i < 2^31, so a_i*x+b_i
    < 2^62.  The 32-bit truncation of the md5 is fine at sf scale
    (collision odds ~1e-7 per million shingles); the production 64-bit
    numpy MinHash (kernels/hashing.py) remains the web-scale path.

    Returns candidate (doc_a, doc_b) pairs sharing >= 1 band.

    Shingles are mod-sampled (Broder's modded shingling): only shingles
    whose md5 ends in 0-3 survive — a consistent 1/4 sample that cuts the
    per-permutation aggregation volume 4x with the SAME rule on both
    engines, so the oracle still matches exactly."""
    rows_per_band = num_perm // bands
    params = minhash_params(num_perm)
    # Shingle generation is row-explode, NOT transform(sequence, i ->
    # substring(norm, i, k)): inside a HOF lambda the normalized-text
    # expression is re-evaluated PER ELEMENT (no loop-invariant hoisting
    # in Catalyst), i.e. one full-document regexp_replace per shingle —
    # measured 13s of the 19s query at sf0.1.  Exploding positions first
    # evaluates NORM once per document; the generator and the substring
    # projection fuse into one codegen stage, so the normalized text is
    # never copied per shingle either.  (array_distinct was dropped: a
    # min-aggregation is insensitive to duplicate shingles, so distinct
    # only added a per-doc hash set.)
    norm = docs.select("doc_id", NORM(F.col(text_col)).alias("t"))
    sh = (
        norm.select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("t") - F.lit(shingle_k - 1), F.lit(1)),
                )
            ).alias("i"),
        )
        .select("doc_id", F.md5(F.substring(F.col("t"), F.col("i"), F.lit(shingle_k))).alias("h"))
        .filter(F.substring("h", 32, 1).isin("0", "1", "2", "3"))
        .select(
            "doc_id",
            F.pmod(
                F.conv(F.substring("h", 1, 8), 16, 10).cast("long"),
                F.lit(_MINHASH_P),
            ).alias("x"),
        )
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(F.lit(a) * F.col("x") + F.lit(b), F.lit(_MINHASH_P))
            ).alias(f"s{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    band_cols = []
    for b in range(bands):
        cols = [
            F.col(f"s{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.md5(F.concat_ws("|", *cols)).alias(f"band{b}")
        )
    banded = sig.select("doc_id", *band_cols)
    melted = banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("bh"),
    ).select("doc_id", "bh.band_idx", "bh.band_hash")
    a, b_ = melted.alias("a"), melted.alias("b")
    return (
        a.join(b_, ["band_idx", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_near_dups(
    docs: DataFrame, text_col: str = "text", prefix_bits: int = 16,
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit SimHash (vectorized UDF), blocked on
    the high ``prefix_bits`` (one band of the Manku rotation scheme),
    verified by exact Hamming distance via bit_count(xor)."""
    sh = docs.select(
        "doc_id", simhash_udf(F.col(text_col)).alias("simhash")
    ).withColumn("prefix", F.shiftrightunsigned("simhash", 64 - prefix_bits))
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, "prefix")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_buckets: int = 8,
    n_probes: int = 1,
) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by dominant-dimension
    bucket (cheap LSH: argmax |component| index mod n_buckets); exact
    cosine verification inside buckets.

    ``n_probes=2`` (the recall upgrade for the single-probe weakness):
    each vector also enters the bucket of its SECOND-largest |component|
    — near-duplicates whose top two dimensions are close can disagree on
    the argmax, and the second probe catches exactly that failure mode
    at 2x candidate cost (still bucketed, never all-pairs).  Tie rule is
    by VALUE (the runner-up magnitude, first position), mirrored exactly
    in the DuckDB oracle."""
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    abs_v = F.transform(vec_d, lambda x: F.abs(x))
    m1 = F.array_max(abs_v)
    p1 = F.array_position(abs_v, m1)
    keys = F.array(F.pmod(p1.cast("int"), F.lit(n_buckets)))
    if n_probes >= 2:
        m2 = F.array_max(F.filter(abs_v, lambda x: x != m1))
        p2 = F.coalesce(F.array_position(abs_v, m2), p1)
        keys = F.array_distinct(
            F.array(
                F.pmod(p1.cast("int"), F.lit(n_buckets)),
                F.pmod(p2.cast("int"), F.lit(n_buckets)),
            )
        )
    base = embeddings.select(
        F.col("vec_id"), vec_d.alias("vec"), F.explode(keys).alias("bucket_key")
    )
    a, b = base.alias("a"), base.alias("b")
    cos = cosine_sim(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(b, "bucket_key")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["vec_a", "vec_b"])
    )
