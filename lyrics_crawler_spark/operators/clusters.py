"""Near-dup cluster assignment: candidate pairs → connected components →
canonical keeper per cluster.

Pair-producing operators (MinHash+LSH `textdedup.lsh_candidate_pairs`,
SimHash bands, embedding LSH `similarity.cosine_neardup_pairs`) leave the
pipeline one step short of usable dedup: a 100 TB corpus needs "keep ONE
document per duplicate *cluster*", and near-dup similarity is not
transitive-closed at the pair level (A~B, B~C but A̸~C still means A, B, C
are one redundancy cluster). This module closes that step.

Scale notes (the part Spark has no built-in for):
- :func:`connected_components` is iterative min-label propagation: each
  round is ONE shuffle (edges ⋈ labels keyed by node id, then a
  map-side-combinable min agg), and the round count is the graph
  diameter, not |V| — dedup graphs are unions of small dense clusters,
  so 2-4 rounds in practice. For adversarial long-chain graphs the
  classic fix is alternating large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14), which
  squares path lengths per round; not needed for the dedup shape.
- lineage is truncated every round with an eager ``localCheckpoint`` —
  an iterative DataFrame loop otherwise builds an O(rounds)-deep plan
  that blows up analysis time and, worse, re-executes the whole history
  on every action. (On a production cluster with an HDFS checkpoint dir,
  ``checkpoint()`` is the durable variant; localCheckpoint keeps the
  sandbox dependency-free.)
- convergence is detected with one count per round on the *changed*
  labels only (anti-equality join on the id key — no full-table compare).

The reference has no counterpart (URL-level dedup only — SURVEY.md §2.3);
this extends its D1 "seen" idea from exact URL identity to similarity
clusters, per SURVEY.md §2.11's training-data charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Drop a localCheckpoint's cached blocks NOW instead of waiting for
    the JVM ContextCleaner (which only fires after both the Python and
    JVM references are garbage-collected). Without this, an iterative
    loop accumulates O(rounds) copies of its state table in
    block-manager memory for the session lifetime — fine at sandbox
    scale, hostile at 100 TB label-table sizes. The checkpointed
    DataFrame's analyzed plan is a LogicalRDD holding exactly the
    persisted RDD; best-effort (a private accessor) with the
    ContextCleaner as the unchanged fallback."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # non-classic backends / future Spark: cleaner handles it


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over an undirected pair list.

    ``pairs`` carries one row per edge (any extra columns ignored).
    Returns ``(id, component)`` for every node that appears in a pair,
    where ``component`` is the minimum node id reachable from ``id`` —
    a deterministic, engine-independent canonical label (a DuckDB
    recursive CTE computes the identical labeling for the oracle).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "comp", F.col("id")
    )
    # eager materialization so every round starts from a flat plan
    labels = labels.localCheckpoint()
    try:
        for _ in range(max_iter):
            # min label over {self} ∪ neighbors: one shuffle (the agg),
            # the edge join is keyed on src = a plain equi-join.
            neighbor = edges.join(
                labels.withColumnRenamed("id", "src"), "src"
            ).select(F.col("dst").alias("id"), "comp")
            new_labels = (
                labels.unionByName(neighbor)
                .groupBy("id")
                .agg(F.min("comp").alias("comp"))
                .localCheckpoint()
            )
            n_changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            # the old round's checkpointed blocks are dead the moment the
            # convergence count (the only reader) finishes — release them
            # so memory stays O(1) rounds, not O(rounds) (ADVICE r03).
            _release_checkpoint(labels)
            labels = new_labels
            if n_changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds the bound — raise max_iter or switch "
            "to large-star/small-star)"
        )
    finally:
        edges.unpersist()


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment + canonical keeper: one row per node in the
    pair graph with its component label, the cluster size, and
    ``is_keeper`` = 1 for the single minimum-id member (the document a
    dedup pass retains; 0 = droppable duplicate). Documents that appear
    in no pair are implicitly their own keeper and are not emitted —
    the caller unions them in if a full-corpus verdict column is needed
    (left join + coalesce keeps that an O(corpus) broadcast-free pass).
    """
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("n_members"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("id").alias("doc_id"),
            F.col("comp").alias("component"),
            "n_members",
            (F.col("id") == F.col("comp")).cast("bigint").alias("is_keeper"),
        )
    )
