"""Similarity search over an embedding column (ARRAY<FLOAT>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  set against the corpus, per-query window top-k.  The correctness
  baseline; O(|corpus| * |queries|) but embarrassingly parallel and
  scan-bound — the right thing when queries are few.
- ``lsh_topk``: the scale path — random-hyperplane signs (computed
  JVM-side from deterministic per-dimension coefficients) bucket the
  corpus; candidates share a bucket in >= 1 of ``n_tables`` tables, then
  exact cosine re-rank.  Probe cost drops from full-scan to bucket-scan;
  recall is tested against the brute-force baseline in pytest.

  Parameter guidance: hyperplane LSH recall depends on how separated the
  true neighbors are.  On tightly clustered corpora 8 planes x 4 tables
  keeps buckets small with high recall; on weakly separated data (near-
  uniform cosines, like the synthetic ``embeddings`` fixture at ~0.37
  top-cosine) fewer planes + more tables (4 x 8, the defaults here)
  trade bucket size for recall — measured 0.62 vs 0.04 on that fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import cosine_sim
from ..kernels.hashing import stable_hash64


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10
) -> DataFrame:
    """(query_id, embedding) x (vec_id, embedding) -> top-k neighbors per
    query by cosine, ranked (ties broken by vec_id asc)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    c = corpus.select(F.col("vec_id"), _as_double("embedding").alias("cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "vec_id",
        cosine_sim(F.col("qv"), F.col("cv")).alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("cos_raw", 4).alias("cosine"),
            "rank",
        )
    )


def _hyperplane_sign_cols(dim: int, n_planes: int, seed: int, vec_col):
    """Deterministic random-hyperplane signature as a bit-packed long,
    computed with built-in expressions: plane p's coefficient for
    dimension d is a fixed +-1 from stable_hash64 (seeded) — JVM-side
    dot product via aggregate over zipped literal arrays."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        coeffs = F.array(*[
            F.lit(1.0 if (stable_hash64(f"{seed}:{p}:{d}") & 1) else -1.0)
            for d in range(dim)
        ])
        dot = F.aggregate(
            F.zip_with(vec_col, coeffs, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Hyperplane-LSH-bucketed approximate top-k: candidates = union over
    tables of same-bucket vectors, exact cosine re-rank."""
    qd = queries.select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    cd = corpus.select("vec_id", _as_double("embedding").alias("cv"))
    cand = None
    for t in range(n_tables):
        qb = qd.withColumn("bucket", _hyperplane_sign_cols(dim, n_planes, seed + t, F.col("qv")))
        cb = cd.withColumn("bucket", _hyperplane_sign_cols(dim, n_planes, seed + t, F.col("cv")))
        pairs = F.broadcast(qb).join(cb, "bucket").select("query_id", "qv", "vec_id", "cv")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "vec_id"])
    scored = cand.select(
        "query_id", "vec_id", cosine_sim(F.col("qv"), F.col("cv")).alias("cos_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos_raw", 4).alias("cosine"), "rank")
    )
