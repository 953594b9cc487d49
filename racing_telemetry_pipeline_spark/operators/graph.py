"""Distributed connected-components kernels over an edge DataFrame.

Two interchangeable implementations (identical output labels):

- ``cc_minlabel``: iterative min-label propagation — simple, O(diameter)
  rounds, carries a full label table through every round. Fine for the
  blocked near-dup graphs the dedup pipeline produces (small components),
  the default in dd6.
- ``cc_bigstar``: alternating large-star / small-star rounds (Kiveris et
  al., "Connected Components in MapReduce and Beyond") — O(log^2 n)
  rounds, every step a co-partitioned groupBy/join on node id, no state
  besides the contracting edge set. The 10^12-edge scale path (dd7).

Both take an edge DataFrame with integer columns (src, dst) and return
(doc_id, cluster_id) with cluster_id = min node id of the component.
Nodes not present in any edge are absent from the result (callers treat
them as singletons). ``localCheckpoint`` truncates lineage each round —
without it Catalyst re-analyzes an exponentially growing plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def cc_minlabel(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Min-label propagation to a fixpoint."""
    sym = _symmetrize(edges).cache()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        neigh = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster_id").alias("neigh_min"))
        )
        updated = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("neigh_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        ).localCheckpoint()
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


def _min_neighbor(df: DataFrame) -> DataFrame:
    # m(u) = min(neighbors(u) + {u}); same partitioning as the later join
    return df.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )


def cc_bigstar(edges: DataFrame, max_rounds: int = 32) -> DataFrame:
    """Alternating large-star / small-star rounds to a fixpoint."""
    e = _symmetrize(edges).localCheckpoint()
    for _round in range(max_rounds):
        # large-star: attach every LARGER neighbor to u's min
        m = _min_neighbor(e)
        large = (
            e.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        ls = _symmetrize(large).localCheckpoint()
        # small-star: attach every smaller-or-equal neighbor to the min
        m2 = _min_neighbor(ls)
        small = (
            ls.join(m2, "src")
            .filter(F.col("dst") <= F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(m2.select(F.col("src"), F.col("m").alias("dst")))
        )
        e_next = _symmetrize(small).localCheckpoint()
        if (
            e_next.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(e_next).limit(1).count() == 0
        ):
            e = e_next
            break
        e = e_next
    # at the fixpoint every node is directly connected to its component min
    return _min_neighbor(e).select(
        F.col("src").alias("doc_id"), F.col("m").alias("cluster_id")
    )
