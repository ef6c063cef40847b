"""Incremental KG snapshot rebuild — delta-linking + component-touch CC.

The full rebuild (streaming/ingest.py::rebuild_kg_snapshot) re-runs the
whole linking lineage over the ACCUMULATED triples table every time:
O(corpus) mention aggregation, O(dictionary) banding + pair scoring,
CC from scratch, and an O(corpus) edge re-resolution.  Fine per rebuild,
a scale-killer over a crawl's lifetime (round-7 verdict).  This module
makes the per-snapshot cost O(delta + dictionary):

1. **Delta mentions** — only the batches since the previous snapshot are
   scanned (`batch_id` partition pruning on the triples store).
2. **Delta banding/scoring** — MinHash bands are computed for NEW
   distinct surfaces only and joined against the PERSISTED band
   dictionary (carried in the snapshot's ``state/bands`` table), so
   candidate pairs involve at least one new surface.  Old-old pairs
   cannot appear (band sets of old surfaces never change), so their
   edges from previous snapshots are already folded into the persisted
   canonical mapping.
3. **Contracted (component-touch) CC** — new link edges are mapped onto
   the previous CANONICAL ids (each previous component contracts to its
   canonical representative, which is by construction the component's
   minimum mention id); CC runs on the contracted graph of previous
   representatives + new surfaces + new edges, which is O(delta).  The
   resulting label is min over (prev canonicals ∪ new ids) = the global
   minimum mention id — exactly what a from-scratch CC elects, so the
   published mapping is IDENTICAL to the full rebuild's (pinned by
   tests/test_kg_incremental.py).
4. **Edges as a read-time view** — an incremental snapshot materializes
   only the dictionary-sized ``nodes`` table; ``read_kg_snapshot(...,
   "edges")`` resolves the append-only triples store (``batch_id <=
   snapshot version``) through the snapshot's canonical map with the
   SAME ``kg/graph.py::build_edges`` dataflow the batch stage runs —
   identical rows, but the rebuild never rewrites O(corpus) edge data.
   The canonical map is broadcastable (dictionary-sized under Zipf), so
   the view costs two map-side hash joins over the scan a reader would
   do anyway — the normalized-fact/mutable-dimension split, with the
   triples store as the immutable fact table.  (A consumer that wants a
   materialized denormalized copy can compact one explicitly; Iceberg
   row-level updates are the long-term seam, sources/tables.py.)

Exactness guard — **hot-bucket cap crossing**: the full path drops ALL
pairs of an LSH band bucket whose membership exceeds ``max_bucket_size``
(kg/blocking.py).  If new surfaces push a bucket that previously held
>=2 members (i.e. had generated pairs) over the cap, a from-scratch run
would drop those old pairs while the incremental state has already
folded their edges into components — the two could diverge.  That
transition is detected from the persisted band dictionary (old vs new
bucket sizes) and triggers a FULL rebuild for that snapshot (which also
refreshes the state), so published snapshots always equal the
from-scratch result.  Cap crossings are rare by construction (a bucket
past 256 members is a degenerate template cluster).

Reference analog: per-document upsert into the live index instead of a
corpus-wide re-index (`Services/SearchService.cs:210-233`) — here
generalized to upserting into a canonicalized entity graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocking import banded_mentions, mentions_from_triples
from .cc import connected_components
from .linking import score_candidate_pairs

# Bump on ANY change to the incremental dataflow that makes persisted
# state (bands / alias_hubs / canonical mapping) incomparable with what
# the current code would derive — a mismatched resume falls back to ONE
# full rebuild (self-healing: unlike dedup-rep state, KG state is fully
# derivable from the triples store).
KG_STATE_VERSION = 1

# The linking parameters the full path uses implicitly via defaults
# (kg/blocking.py candidate_pairs, kg/linking.py all_link_edges).  The
# incremental path must band/score EXACTLY like the full path or the
# accumulated pair set diverges from a from-scratch run's.
_NUM_PERM = 128
_BANDS = 32
_SHINGLE_K = 3
_SEED = 42
_MAX_BUCKET = 256
_JACCARD_T = 0.5
_COSINE_T = 0.85

_BAND_KEY = ["band_idx", "band_hash"]


def _alias_fingerprint(aliases: DataFrame | None) -> str:
    """Order-insensitive content hash of the alias dictionary — alias
    edits between snapshots change linking evidence, which the
    incremental path cannot replay, so they must force a full rebuild."""
    if aliases is None:
        return "none"
    row = aliases.agg(
        F.count("*"),
        F.coalesce(F.bit_xor(F.xxhash64("alias", "entity")), F.lit(0)),
    ).first()
    return f"{row[0]}:{row[1]}"


def state_params(embedding_dim: int, aliases: DataFrame | None) -> str:
    return (
        f"kgstate={KG_STATE_VERSION};num_perm={_NUM_PERM};bands={_BANDS};"
        f"shingle_k={_SHINGLE_K};seed={_SEED};cap={_MAX_BUCKET};"
        f"jaccard={_JACCARD_T};cosine={_COSINE_T};"
        f"embedding_dim={embedding_dim};aliases={_alias_fingerprint(aliases)}"
    )


def derive_state_from_nodes(
    nodes: DataFrame, aliases: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """(bands, alias_hubs) for a snapshot built by the FULL path —
    derived from the MATERIALIZED nodes table, so bootstrapping
    incremental state never re-runs the corpus-scale linking lineage.
    The band dictionary is a pure function of the surface set (same
    construction candidate_pairs uses), and alias hubs re-derive the
    min-mention-id election of kg/linking.py::alias_link_edges."""
    mentions_like = nodes.select(
        "mention_id", "surface",
        F.lower(F.trim(F.col("surface"))).alias("norm"),
    )
    bands = banded_mentions(
        mentions_like, _NUM_PERM, _BANDS, _SHINGLE_K, _SEED
    )
    if aliases is None:
        spark = nodes.sparkSession
        hubs = spark.createDataFrame([], "entity string, hub_id bigint")
    else:
        hubs = (
            nodes.join(
                F.broadcast(aliases),
                F.lower(F.col("surface")) == F.lower(F.col("alias")),
            )
            .groupBy("entity")
            .agg(F.min("mention_id").alias("hub_id"))
        )
    return bands, hubs


def incremental_nodes(
    prev_nodes: DataFrame,
    prev_bands: DataFrame,
    prev_hubs: DataFrame,
    delta_triples: DataFrame,
    aliases: DataFrame | None = None,
    embedding_dim: int = 64,
    n_buckets: int = 8,
) -> tuple[DataFrame, DataFrame, DataFrame, tuple[DataFrame, ...]] | None:
    """Delta-linking + contracted CC.  Returns ``(nodes, new_bands,
    alias_hubs, caches)`` — the new snapshot's nodes table, the NEW
    surfaces' band rows (a DELTA: the band dictionary is append-only,
    the caller persists only this next to the previous deltas), and the
    updated alias hubs — or **None** when a hot-bucket cap crossing
    makes the incremental result potentially diverge from a
    from-scratch run (caller must fall back to the full rebuild).
    ``caches`` must be unpersisted by the caller AFTER materializing
    the outputs."""
    dm = mentions_from_triples(delta_triples).cache()
    new_surf = dm.join(
        prev_nodes.select("mention_id"), "mention_id", "left_anti"
    ).cache()
    new_bands = banded_mentions(
        new_surf, _NUM_PERM, _BANDS, _SHINGLE_K, _SEED
    ).cache()

    # --- cap-crossing guard + hot-bucket filter (updated sizes) -------
    prev_sizes = prev_bands.groupBy(*_BAND_KEY).agg(
        F.count("*").alias("prev_size")
    )
    delta_sizes = new_bands.groupBy(*_BAND_KEY).agg(
        F.count("*").alias("delta_size")
    )
    sizes = (
        prev_sizes.join(delta_sizes, _BAND_KEY, "full")
        .select(
            *_BAND_KEY,
            F.coalesce("prev_size", F.lit(0)).alias("prev_size"),
            F.coalesce("delta_size", F.lit(0)).alias("delta_size"),
        )
        .withColumn("total", F.col("prev_size") + F.col("delta_size"))
    )
    crossing = sizes.filter(
        (F.col("prev_size") >= 2)
        & (F.col("prev_size") <= _MAX_BUCKET)
        & (F.col("total") > _MAX_BUCKET)
    )
    if crossing.limit(1).count() > 0:
        for c in (new_bands, new_surf, dm):
            c.unpersist()
        return None
    # buckets over the cap (all of them old-only over-cap or fresh
    # over-cap — crossings were just excluded) generate no new pairs,
    # exactly like the full path's anti-join in candidate_pairs
    hot = sizes.filter(F.col("total") > _MAX_BUCKET).select(*_BAND_KEY)
    nb = new_bands.join(F.broadcast(hot), _BAND_KEY, "left_anti")
    ab = (
        prev_bands.unionByName(new_bands)
        .join(F.broadcast(hot), _BAND_KEY, "left_anti")
    )

    # --- candidate pairs: at least one NEW side ------------------------
    a, b = nb.alias("a"), ab.alias("b")
    lt = F.col("a.mention_id") < F.col("b.mention_id")
    pairs = (
        a.join(b, _BAND_KEY)
        .filter(F.col("a.mention_id") != F.col("b.mention_id"))
        .select(
            F.when(lt, F.col("a.mention_id"))
            .otherwise(F.col("b.mention_id")).alias("id_a"),
            F.when(lt, F.col("a.surface"))
            .otherwise(F.col("b.surface")).alias("surface_a"),
            F.when(lt, F.col("a.norm"))
            .otherwise(F.col("b.norm")).alias("norm_a"),
            F.when(lt, F.col("b.mention_id"))
            .otherwise(F.col("a.mention_id")).alias("id_b"),
            F.when(lt, F.col("b.surface"))
            .otherwise(F.col("a.surface")).alias("surface_b"),
            F.when(lt, F.col("b.norm"))
            .otherwise(F.col("a.norm")).alias("norm_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    scored = score_candidate_pairs(
        pairs, _JACCARD_T, _COSINE_T, embedding_dim
    ).select("src", "dst")

    # --- alias edges for new surfaces ----------------------------------
    if aliases is not None:
        resolved_new = new_surf.join(
            F.broadcast(aliases),
            F.lower(F.col("surface")) == F.lower(F.col("alias")),
        ).select("mention_id", "entity")
        # hubs persist their FIRST election: linking new members through
        # the persisted hub keeps them in the entity's existing
        # component; re-electing a smaller new member as hub would star
        # the newcomers around a vertex with no edge back to the old
        # cluster and split it.  (The hub id is connectivity plumbing,
        # not the canonical id — canonicals stay min-per-component.)
        new_entity_hubs = (
            resolved_new.join(prev_hubs, "entity", "left_anti")
            .groupBy("entity")
            .agg(F.min("mention_id").alias("hub_id"))
        )
        hubs_new = prev_hubs.unionByName(new_entity_hubs).cache()
        alias_edges = (
            resolved_new.join(F.broadcast(hubs_new), "entity")
            .filter(F.col("mention_id") != F.col("hub_id"))
            .select(
                F.col("hub_id").alias("src"),
                F.col("mention_id").alias("dst"),
            )
        )
        new_edges = scored.unionByName(alias_edges)
    else:
        hubs_new = prev_hubs
        new_edges = scored

    # --- contracted CC --------------------------------------------------
    # Previous components contract to their canonical representative
    # (the component's min mention id); only vertices touched by new
    # edges do any work — everything else labels itself.
    prev_map = prev_nodes.select("mention_id", "canonical_id")
    src_map = prev_map.withColumnRenamed("mention_id", "src").withColumnRenamed(
        "canonical_id", "src_c"
    )
    dst_map = prev_map.withColumnRenamed("mention_id", "dst").withColumnRenamed(
        "canonical_id", "dst_c"
    )
    # NO broadcast hint on the canonical map: it is dictionary-sized
    # (fine today, 100M+ rows over a crawl's lifetime), and an explicit
    # hint would force a driver-side broadcast regardless — AQE already
    # picks broadcast when the map is genuinely small and a shuffle
    # join when it is not, and the probe side (new edges) is
    # delta-sized either way.
    contracted = (
        new_edges.join(src_map, "src", "left")
        .join(dst_map, "dst", "left")
        .select(
            F.coalesce("src_c", F.col("src")).alias("src"),
            F.coalesce("dst_c", F.col("dst")).alias("dst"),
        )
    )
    vertices = (
        prev_nodes.select(F.col("canonical_id").alias("mention_id"))
        .distinct()
        .unionByName(new_surf.select("mention_id"))
    )
    comp = connected_components(vertices, contracted).cache()

    # --- final canonical surfaces (min over merged member sets) --------
    surf_members = (
        prev_nodes.select(
            F.col("canonical_id").alias("id"),
            F.col("canonical_surface").alias("msurf"),
        )
        .distinct()
        .unionByName(
            new_surf.select(
                F.col("mention_id").alias("id"),
                F.col("surface").alias("msurf"),
            )
        )
    )
    final_surf = (
        surf_members.join(comp, "id")
        .groupBy("component")
        .agg(F.min("msurf").alias("canonical_surface"))
    )

    # --- final nodes -----------------------------------------------------
    delta_counts = dm.select("mention_id", F.col("n_mentions").alias("dn"))
    prev_rows = (
        prev_nodes.select("mention_id", "surface", "n_mentions", "canonical_id")
        .join(delta_counts, "mention_id", "left")
        .withColumn(
            "n_mentions", F.col("n_mentions") + F.coalesce("dn", F.lit(0))
        )
        .drop("dn")
        .join(
            comp.withColumnRenamed("id", "canonical_id"),
            "canonical_id",
        )
        .select(
            "mention_id", "surface", "n_mentions",
            F.col("component").alias("canonical_id"),
        )
    )
    new_rows = (
        new_surf.select("mention_id", "surface", "n_mentions")
        .join(comp.withColumnRenamed("id", "mention_id"), "mention_id")
        .select(
            "mention_id", "surface", "n_mentions",
            F.col("component").alias("canonical_id"),
        )
    )
    nodes = (
        prev_rows.unionByName(new_rows)
        .join(
            final_surf.withColumnRenamed("component", "canonical_id"),
            "canonical_id",
        )
        .select(
            "mention_id", "surface", "n_mentions", "canonical_id",
            "canonical_surface",
        )
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("canonical_id"), F.lit(n_buckets)).cast("int"),
        )
    )
    # the band dictionary is APPEND-ONLY (old surfaces' band sets never
    # change), so only the NEW surfaces' bands are returned — the caller
    # persists them as a delta file next to the previous deltas instead
    # of rewriting the whole dictionary per rebuild.  Rewriting the union
    # was the incremental path's scaling floor: O(|dictionary| x bands)
    # rows written per snapshot — 3.2G rows/rebuild at a 100M-surface
    # crawl dictionary, and measured parity-with-full at just 120k
    # surfaces (BENCH/kg_incremental_dict_r8.json, first run).
    caches = (dm, new_surf, new_bands, comp) + (
        (hubs_new,) if aliases is not None else ()
    )
    return nodes, new_bands, hubs_new, caches
