"""Bucketed ANN retrieval: plan-shape + recall gates.

Round-2 requirement (VERDICT.md #3/#4): the only search paths must be
bucketed, never all-pairs — sim5's candidates come from the banded LSH
equi-join and sim7/sim8 probe buckets/cells — and the approximate top-k
must demonstrably agree with sim1's exact answer on the test data.
"""

from __future__ import annotations

from racing_telemetry_pipeline_spark.queries.similarity import (
    TOP_K,
    sim1_cosine_topk,
    sim5_embedding_neardup_pairs,
    sim7_ann_topk,
    sim8_ivf_topk,
)

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sim5_no_cartesian_product(spark):
    plan = _plan(sim5_embedding_neardup_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sim7_no_cartesian_product(spark):
    plan = _plan(sim7_ann_topk(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sim7_recall_vs_exact(spark):
    """LSH-bucketed top-k must recover most of the exact top-k. The data
    is deterministic, so the measured recall is a constant; the floor is
    set below it to leave slack only for engine-version jitter."""
    exact = {
        (r.qid, r.nid) for r in sim1_cosine_topk(spark, SF).collect()
    }
    approx = {(r.qid, r.nid) for r in sim7_ann_topk(spark, SF).collect()}
    assert exact, "exact baseline returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.60, f"sim7 recall {recall:.3f} too low"


def test_sim8_recall_vs_exact(spark):
    exact = {
        (r.qid, r.nid) for r in sim1_cosine_topk(spark, SF).collect()
    }
    approx = {(r.qid, r.nid) for r in sim8_ivf_topk(spark, SF).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.60, f"sim8 recall {recall:.3f} too low"


def test_kmeans_refinement_improves_objective(spark):
    """Two Lloyd iterations must not worsen the clustering objective:
    total cosine-to-assigned-centroid >= the seeded (first-K) assignment,
    and the cells still partition the corpus exactly."""
    from pyspark.sql import functions as F

    from racing_telemetry_pipeline_spark.queries.similarity import (
        _ivf_scored,
        _kmeans_cells,
    )

    seeded = (
        _ivf_scored(spark, SF)
        .filter(F.col("rn") == 1)
        .agg(F.sum("cos_c").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )
    refined_cells = _kmeans_cells(spark, SF)
    refined = refined_cells.agg(
        F.sum("cos_c").alias("s"), F.count("*").alias("n")
    ).collect()[0]
    assert refined["n"] == seeded["n"]  # every vector in exactly one cell
    assert refined["s"] >= seeded["s"] - 1e-6
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert refined["n"] == n_vecs


def test_sim7_ranks_are_dense_topk(spark):
    rows = sim7_ann_topk(spark, SF).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r.rank)
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), qid
        assert len(ranks) <= TOP_K
