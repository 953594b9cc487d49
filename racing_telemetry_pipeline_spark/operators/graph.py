"""Distributed connected-components kernels over an edge DataFrame.

Two interchangeable implementations (identical output labels):

- ``cc_minlabel``: iterative min-label propagation — simple, O(diameter)
  rounds, carries a full label table through every round. Fine for the
  blocked near-dup graphs the dedup pipeline produces (small components);
  kept as the independently-implemented cross-check kernel.
- ``cc_bigstar``: alternating large-star / small-star rounds (Kiveris et
  al., "Connected Components in MapReduce and Beyond") — O(log^2 n)
  rounds, every step a co-partitioned groupBy/join on node id, no state
  besides the contracting edge set. The 10^12-edge scale path and (since
  round 3) the default kernel in dd6_dedup_clusters.

Both raise ``ConvergenceError`` instead of silently returning unconverged
(wrong) labels when max_rounds is exhausted before the fixpoint.

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


class ConvergenceError(RuntimeError):
    """A CC kernel exhausted max_rounds before reaching its fixpoint.

    Returning the unconverged labels silently would yield WRONG clusters
    (min-label needs O(diameter) rounds, so a near-dup chain longer than
    max_rounds docs would split); failing loudly is the only safe exit."""


def cc_minlabel(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Min-label propagation to a fixpoint."""
    sym = _symmetrize(edges).cache()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    converged = False
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
            converged = True
            break
    if not converged:
        raise ConvergenceError(
            f"cc_minlabel: no fixpoint after {max_rounds} rounds "
            "(component diameter exceeds max_rounds; raise max_rounds or "
            "use cc_bigstar)"
        )
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
        # fixpoint test as ONE action: the symmetric difference is empty
        # iff the edge sets are equal (both sides are distinct sets after
        # _symmetrize, so exceptAll == except). One job per round instead
        # of two — at 10^12 edges with ~20 rounds that's 20 saved jobs.
        sym_diff = e_next.exceptAll(e).union(e.exceptAll(e_next))
        if sym_diff.limit(1).count() == 0:
            converged = True
            e = e_next
            break
        e = e_next
    else:
        converged = False
    if not converged:
        raise ConvergenceError(
            f"cc_bigstar: no fixpoint after {max_rounds} rounds"
        )
    # at the fixpoint every node is directly connected to its component min
    return _min_neighbor(e).select(
        F.col("src").alias("doc_id"), F.col("m").alias("cluster_id")
    )
