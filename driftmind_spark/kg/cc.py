"""K6 — connected components as iterative DataFrame joins (no GraphFrames
jar in the sandbox; SURVEY.md §7.1).

Min-label propagation: every vertex repeatedly adopts the minimum label
among itself and its neighbors until a fixpoint.  Convergence is
O(component diameter) rounds; entity-surface clusters are small stars, so
2-4 rounds in practice.  Each round:

  msgs  = labels(src)->dst  ∪  labels(dst)->src  ∪  labels
  labels' = min(label) group by id

``localCheckpoint`` truncates the lineage each round (iterative-join DAGs
otherwise grow exponentially); convergence is detected by the round's
total label-change count from a single aggregate.  For web-scale giant
components swap in the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — same DataFrame
skeleton, fewer rounds; the planted clusters here never need it.

Deterministic canonical-id election (north_rule): component label = the
minimum 64-bit mention id, and the canonical *surface* = the
lexicographically smallest surface in the component — both total orders,
so re-runs at any parallelism elect identical canonicals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "mention_id",
    max_iter: int = 25,
) -> DataFrame:
    """(id) + (src, dst) -> (id, component) with component = min id."""
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()
    e = edges.select("src", "dst").distinct().localCheckpoint()

    for _ in range(max_iter):
        via_src = e.join(labels, e.src == labels.id).select(
            F.col("dst").alias("id"), "component"
        )
        via_dst = e.join(labels, e.dst == labels.id).select(
            F.col("src").alias("id"), "component"
        )
        new_labels = (
            labels.unionByName(via_src)
            .unionByName(via_dst)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # never pass silently: min-label propagation needs O(diameter)
        # rounds, so a chain longer than max_iter would otherwise return
        # SPLIT components as if they were correct
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter or use a lower-round algorithm for "
            "high-diameter graphs"
        )
    return labels


def canonical_mapping(mentions: DataFrame, components: DataFrame) -> DataFrame:
    """(mention_id, surface, n_mentions) x (id, component) ->
    (mention_id, surface, canonical_id, canonical_surface).

    Canonical surface election: min(surface) per component —
    deterministic under any execution order (min over a total order)."""
    labeled = mentions.join(
        components, mentions.mention_id == components.id, "left"
    ).withColumn(
        "canonical_id", F.coalesce(F.col("component"), F.col("mention_id"))
    ).drop("id", "component")
    canon_surfaces = labeled.groupBy("canonical_id").agg(
        F.min("surface").alias("canonical_surface")
    )
    return labeled.join(canon_surfaces, "canonical_id").select(
        "mention_id", "surface", "n_mentions", "canonical_id", "canonical_surface"
    )
