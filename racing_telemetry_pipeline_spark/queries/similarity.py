"""Similarity search over the ``embeddings`` table (array<float> column).

- brute-force cosine top-k (the exactness baseline)
- LSH-bucketed ANN via random-hyperplane signs (the scale path: candidates
  share a signature bucket; at 10^12 rows the bucket join replaces the
  O(n^2) cross join)
- vector norms / array ops coverage

Dot products stay JVM-side via ``aggregate``/``zip_with`` on cast-to-double
arrays; ranking uses ROUNDED similarity (4 dp) with a doc-id tiebreak so
the two engines' sub-ulp dot-product differences cannot flip ranks.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from .common import t

N_QUERY = 20  # vec_ids < N_QUERY are the query set
TOP_K = 3

# deterministic pseudo-random hyperplanes: sign of sum over dims of
# weight(i, d) * x_d with weight = ((1103515245 * (d + 64 * i) + 12345) % 9973) - 4986
N_PLANES = 6


def _emb_double(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sim1_cosine_topk(spark, sf_dir):
    e = _emb_double(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
    pairs = q.crossJoin(c).filter(F.col("qid") != F.col("nid"))
    cos = _dot(F.col("qv"), F.col("nv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("nv"), F.col("nv")))
    )
    ranked = pairs.withColumn("cos_sim", F.round(cos, 4)).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
        ),
    )
    return ranked.filter(F.col("rank") <= TOP_K).select("qid", "nid", "cos_sim", "rank")


SIM1_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS nid,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               4) AS cos_sim
  FROM e q JOIN e c ON q.vec_id < {N_QUERY} AND q.vec_id <> c.vec_id
)
SELECT qid, nid, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
  FROM pairs
) WHERE rank <= {TOP_K}
"""


def _plane_weight(i: int):
    # weight expression for plane i as a function of dim index d (0-based)
    def w(d):
        return (
            (F.lit(1103515245).cast("long") * (d.cast("long") + 64 * i) + 12345) % 9973
            - 4986
        ).cast("double")

    return w


def sim2_lsh_signatures(spark, sf_dir):
    """Random-hyperplane LSH signature per vector (the ANN bucketing key)."""
    e = _emb_double(spark, sf_dir)
    sig = None
    for i in range(N_PLANES):
        w = _plane_weight(i)
        # proj_i = sum_d weight(i,d) * v[d]  — rounded to 6 dp before the
        # sign test so cross-engine sum-order ulps cannot flip a sign
        proj = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.sequence(F.lit(0), F.size("v") - 1),
                lambda x, d: x * w(d),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(F.round(proj, 6) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return e.select("vec_id", "label", sig.cast("long").alias("lsh_bucket"))


SIM2_SQL = f"""
SELECT vec_id, label,
       cast({' + '.join(
           f"(CASE WHEN round(proj{i}, 6) >= 0 THEN {2**i} ELSE 0 END)"
           for i in range(N_PLANES))} AS bigint) AS lsh_bucket
FROM (
  SELECT vec_id, label,
         {', '.join(
             f"(SELECT sum(x * (((1103515245 * ((d - 1) + 64 * {i}) + 12345) % 9973 - 4986)::double))"
             f" FROM (SELECT unnest(embedding::DOUBLE[]) AS x,"
             f" generate_subscripts(embedding, 1) AS d)) AS proj{i}"
             for i in range(N_PLANES))}
  FROM embeddings
)
"""


def sim3_lsh_bucket_stats(spark, sf_dir):
    """Bucket-size profile — the skew check for the ANN path."""
    sig = sim2_lsh_signatures(spark, sf_dir)
    return sig.groupBy("lsh_bucket").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
    )


SIM3_SQL = f"""
SELECT lsh_bucket, count(*) AS n_vectors, count(DISTINCT label) AS n_labels
FROM ({SIM2_SQL}) GROUP BY lsh_bucket
"""


def sim4_vector_norms(spark, sf_dir):
    e = _emb_double(spark, sf_dir)
    norm = F.round(F.sqrt(_dot(F.col("v"), F.col("v"))), 6)
    return e.withColumn("norm", norm).groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.sum(norm.cast("decimal(24,6)")).cast("double"), 4).alias("sum_norm"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


SIM4_SQL = """
SELECT label, count(*) AS n_vectors,
       round(cast(sum(cast(norm as decimal(24,6))) as double), 4) AS sum_norm,
       round(min(norm), 6) AS min_norm, round(max(norm), 6) AS max_norm
FROM (SELECT label, round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm
      FROM embeddings)
GROUP BY label
"""




# --- embedding-cosine near-duplicate pairs ------------------------------------
# (dedup family: near-dup detection in embedding space)
NEARDUP_MIN = 0.35


def sim5_embedding_neardup_pairs(spark, sf_dir):
    e = _emb_double(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.withColumn("cos_sim", F.round(cos, 4))
        .filter(F.col("cos_sim") >= NEARDUP_MIN)
        .select("id_a", "id_b", "cos_sim")
    )


SIM5_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             4) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
            4) >= {NEARDUP_MIN}
"""


# --- IVF-style ANN: centroid cells = the scale path ----------------------------
# centroids are the first K vectors (deterministic "training"); every vector
# is assigned to its nearest centroid cell; search only touches one cell.
N_CENTROIDS = 8


def sim6_ivf_assign(spark, sf_dir):
    e = _emb_double(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    j = e.crossJoin(F.broadcast(cents))
    cos = _dot(F.col("v"), F.col("cv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    ranked = j.withColumn("cos_c", F.round(cos, 6)).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cent_id"))
        ),
    )
    cells = ranked.filter(F.col("rn") == 1)
    return cells.groupBy("cent_id").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
        F.round(F.sum(F.col("cos_c").cast("decimal(24,6)")).cast("double"), 4)
        .alias("sum_cos_to_centroid"),
    )


SIM6_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, e.label, c.cent_id,
         round(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))),
               6) AS cos_c
  FROM e CROSS JOIN c
), cells AS (
  SELECT * FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cent_id) = 1
)
SELECT cent_id, count(*) AS n_vectors, count(DISTINCT label) AS n_labels,
       round(cast(sum(cast(cos_c as decimal(24,6))) as double), 4) AS sum_cos_to_centroid
FROM cells GROUP BY cent_id
"""


QUERIES = {
    "sim1_cosine_topk": (sim1_cosine_topk, SIM1_SQL),
    "sim2_lsh_signatures": (sim2_lsh_signatures, SIM2_SQL),
    "sim3_lsh_bucket_stats": (sim3_lsh_bucket_stats, SIM3_SQL),
    "sim4_vector_norms": (sim4_vector_norms, SIM4_SQL),
    "sim5_embedding_neardup_pairs": (sim5_embedding_neardup_pairs, SIM5_SQL),
    "sim6_ivf_assign": (sim6_ivf_assign, SIM6_SQL),
}
