"""K2/K3 — mention normalization, MinHash signatures, LSH banding and
candidate-pair generation with explicit skew handling.

Generalizes the reference's exact-key embedding cache
(``Services/EmbeddingService.cs:33-34``) to near-duplicate surface
blocking.  Scale design:

- mentions are first aggregated per distinct surface (the surface
  dictionary is orders of magnitude smaller than the mention stream at
  10^12 docs — Zipf), so MinHash runs once per distinct surface;
- candidate pairs come from an equi-join on ``(band_idx, band_hash)`` —
  a shuffle hash/sort-merge join Catalyst can plan, never a cross join;
- hot buckets (a band-hash shared by a huge cluster, the LSH analog of
  head-entity skew) are CAPPED at ``max_bucket_size``: membership above
  the cap means the bucket key carries no discriminative information and
  the pair explosion would be O(n^2); AQE skew-join splitting handles the
  moderate ones, the cap removes the pathological ones.  The dropped
  buckets are observable via ``hot_bucket_stats`` (no silent truncation:
  surfaces in a dropped bucket still meet in their other 31 bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import make_minhash_bands_udf


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """Distinct entity surfaces with mention counts:
    (mention_id, surface, norm, n_mentions).  One hash-agg shuffle;
    partial aggregation eats the Zipf skew map-side."""
    # one scan, not a unionAll of two selects (which plans two scans of
    # the triples table — 2.8M rows re-read at the 100k-page scale)
    surfaces = triples.select(
        F.explode(F.array("subj", "obj")).alias("surface")
    )
    return (
        surfaces.groupBy("surface")
        .agg(F.count("*").alias("n_mentions"))
        .withColumn("norm", F.lower(F.trim(F.col("surface"))))
        .withColumn("mention_id", F.xxhash64("surface"))
    )


def banded_mentions(
    mentions: DataFrame,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    bands_udf = make_minhash_bands_udf(num_perm, bands, shingle_k, seed)
    return mentions.select(
        "mention_id",
        "surface",
        "norm",
        F.posexplode(bands_udf("norm")).alias("band_idx", "band_hash"),
    )


def candidate_pairs(
    mentions: DataFrame,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket_size: int = 256,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b), deduped across bands."""
    banded = banded_mentions(mentions, num_perm, bands, shingle_k, seed)
    # anti-join against the HOT buckets only (same pattern as
    # operators/dedup.py): the over-cap list is tiny by construction — a
    # few degenerate surface clusters — so it broadcasts, instead of the
    # round-2 inner join that shuffled the FULL bucket-size dictionary
    # alongside the banded stream.
    hot = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
        .select("band_idx", "band_hash")
    )
    banded = banded.join(
        F.broadcast(hot), ["band_idx", "band_hash"], "left_anti"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a.mention_id") < F.col("b.mention_id"))
        .select(
            F.col("a.mention_id").alias("id_a"),
            F.col("a.surface").alias("surface_a"),
            F.col("a.norm").alias("norm_a"),
            F.col("b.mention_id").alias("id_b"),
            F.col("b.surface").alias("surface_b"),
            F.col("b.norm").alias("norm_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def hot_bucket_stats(
    mentions: DataFrame,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Observability for the skew cap: buckets that exceeded the cap."""
    banded = banded_mentions(mentions, num_perm, bands, shingle_k, seed)
    return (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )
