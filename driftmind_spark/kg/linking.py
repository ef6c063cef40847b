"""K4/K5 — entity-link scoring over LSH candidate pairs + broadcast
alias-dictionary linking.

Link evidence, in decreasing precision order:
1. alias dictionary (J7): both surfaces map to the same canonical entity
   via a broadcast hash join against the (small) alias table;
2. shingle-Jaccard >= ``jaccard_threshold`` on the normalized surfaces
   (verifies the LSH candidates — LSH recalls, Jaccard confirms);
3. embedding cosine >= ``cosine_threshold`` on the hashed-ngram vectors
   (catches word-level paraphrases char-shingles miss).

All three produce (src, dst) mention-id edges consumed by K6.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..functions.text import cosine_sim
from ..functions.udfs import make_embed_udf


def make_jaccard_udf(shingle_k: int = 3):
    """Shingle-Jaccard scorer.  Round-3 rework of the per-row version:
    (a) shingle sets are built ONCE per distinct surface per batch — LSH
    buckets repeat the same surfaces across many candidate pairs, so the
    memo hit rate is high by construction; (b) the sets hold the k-char
    substrings directly instead of blake2b hashes of them (one hashlib
    call per shingle was the dominant cost; Jaccard only needs set
    identity, and the substring sets are exactly as exact).  Same edge
    semantics as kernels.hashing.jaccard: both-empty -> 1.0,
    one-empty -> 0.0."""

    @pandas_udf(DoubleType())
    def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        cache: dict[str, frozenset] = {}

        def shingles(s) -> frozenset:
            t = s or ""
            r = cache.get(t)
            if r is None:
                if not t:
                    r = frozenset()
                elif len(t) < shingle_k:
                    r = frozenset((t,))
                else:
                    r = frozenset(
                        t[i:i + shingle_k]
                        for i in range(len(t) - shingle_k + 1)
                    )
                cache[t] = r
            return r

        out = []
        for x, y in zip(a, b):
            sx, sy = shingles(x), shingles(y)
            if not sx and not sy:
                out.append(1.0)
            elif not sx or not sy:
                out.append(0.0)
            else:
                inter = len(sx & sy)
                out.append(inter / (len(sx) + len(sy) - inter))
        return pd.Series(out)

    return jaccard_udf


def score_candidate_pairs(
    pairs: DataFrame,
    jaccard_threshold: float = 0.5,
    cosine_threshold: float = 0.85,
    embedding_dim: int = 128,
    shingle_k: int = 3,
) -> DataFrame:
    """K4: verified link edges (src, dst, jaccard, cosine, evidence)."""
    jac = make_jaccard_udf(shingle_k)
    embed = make_embed_udf(embedding_dim)
    scored = (
        pairs.withColumn("jaccard", jac("norm_a", "norm_b"))
        .withColumn("emb_a", embed("norm_a"))
        .withColumn("emb_b", embed("norm_b"))
        .withColumn("cosine", cosine_sim(F.col("emb_a"), F.col("emb_b")))
        .drop("emb_a", "emb_b")
    )
    return (
        scored.filter(
            (F.col("jaccard") >= jaccard_threshold)
            | (F.col("cosine") >= cosine_threshold)
        )
        .select(
            F.col("id_a").alias("src"),
            F.col("id_b").alias("dst"),
            "jaccard",
            "cosine",
            F.when(F.col("jaccard") >= jaccard_threshold, F.lit("jaccard"))
            .otherwise(F.lit("cosine"))
            .alias("evidence"),
        )
    )


def alias_link_edges(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """K5 (J7): broadcast alias-dictionary links.  Surfaces resolving to
    the same canonical entity are linked star-wise through the entity's
    minimum mention id (keeps edge count linear in members, not
    quadratic)."""
    resolved = mentions.join(
        F.broadcast(aliases),
        F.lower(F.col("surface")) == F.lower(F.col("alias")),
        "inner",
    ).select("mention_id", "entity")
    hubs = resolved.groupBy("entity").agg(F.min("mention_id").alias("hub_id"))
    return (
        resolved.join(F.broadcast(hubs), "entity")
        .filter(F.col("mention_id") != F.col("hub_id"))
        .select(
            F.col("hub_id").alias("src"),
            F.col("mention_id").alias("dst"),
            F.lit(1.0).alias("jaccard"),
            F.lit(1.0).alias("cosine"),
            F.lit("alias").alias("evidence"),
        )
    )


def all_link_edges(
    mentions: DataFrame,
    aliases: DataFrame | None,
    pairs: DataFrame,
    jaccard_threshold: float = 0.5,
    cosine_threshold: float = 0.85,
    embedding_dim: int = 128,
) -> DataFrame:
    edges = score_candidate_pairs(
        pairs, jaccard_threshold, cosine_threshold, embedding_dim
    )
    if aliases is not None:
        edges = edges.unionByName(alias_link_edges(mentions, aliases))
    return edges
