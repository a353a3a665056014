"""Single-linkage clustering as distributed connected components.

Reference C6/C7 (``cluster.clj:4-57``, incremental leaf clustering
``crawl.clj:1014-1050``): iterate over points, merge into the first
cluster containing any similar member — i.e. the connected components of
the similarity graph, computed sequentially. Distributed equivalent:
large-star/small-star style label propagation over the edge list —
each iteration is two joins + a min-aggregate, converging in
O(log diameter) rounds; cluster id = min member id, which also
reproduces the reference's deterministic "first cluster wins" labeling
under ascending id order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """edges (id_a, id_b) undirected → (id, component) with component =
    min id reachable. Label propagation to fixpoint; each round is one
    shuffle on id. Checkpoint-free for the bounded iteration counts of
    similarity graphs (diameter shrinks geometrically)."""
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # propagate: each node adopts min(label of self, labels of neighbors)
        neigh = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("n_min"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .withColumn("new_c", F.least(F.col("component"), F.coalesce("n_min", F.col("component"))))
            .select("id", F.col("new_c").alias("component"))
        )
        # pointer jump (path doubling): also adopt the label OF one's
        # label — every label is itself a node id, so one extra
        # self-join doubles the propagation distance per round. With
        # the one-hop neighbor step alone this loop was O(diameter)
        # (a >max_iter-long chain raised); combined it is O(log d).
        # Labels only ever decrease within the component, so the
        # fixpoint (= component min) is unchanged.
        lbl2 = new_labels.select(
            F.col("id").alias("l_id"), F.col("component").alias("l_comp")
        )
        new_labels = (
            new_labels.join(lbl2, new_labels["component"] == lbl2["l_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("l_comp", F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # truncate plan
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
        # min-label propagation advances one hop per round (O(diameter));
        # exiting with changes pending would silently return wrong
        # component ids on long-chain graphs — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(supports diameter ~2^max_iter via pointer jumping); raise max_iter"
        )
    return labels


def cluster_pages_by_similarity(pairs: DataFrame, all_ids: DataFrame) -> DataFrame:
    """(id_a, id_b) similar pairs + the full id set → (id, cluster_id);
    singletons keep their own id as cluster (reference: new cluster per
    unmatched point, cluster.clj:42-49)."""
    comp = connected_components(pairs)
    return (
        all_ids.join(comp, "id", "left")
        .withColumn("cluster_id", F.coalesce("component", F.col("id")))
        .select("id", "cluster_id")
    )


def cluster_size_ranks(assign: DataFrame) -> DataFrame:
    """A11: clusters ranked by size desc (largest-leaf-cluster-wins,
    discussion_forum.clj:16-26; utils.clj:166-177)."""
    return (
        assign.groupBy("cluster_id")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), F.asc("cluster_id"))
    )
