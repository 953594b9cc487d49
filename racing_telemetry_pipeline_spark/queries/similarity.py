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

from .common import t, t_fanout

N_QUERY = 20  # vec_ids < N_QUERY are the query set
TOP_K = 3

# deterministic pseudo-random hyperplanes: sign of sum over dims of
# weight(i, d) * x_d. Weight family (round-3 rework): a 2-round
# multiply-xor-shift mix of k = d + 64*i + 1,
#   h1 = (k * 2654435761) % 1000003
#   w  = ((h1 xor (h1 >> 7)) * 48271) % 9973 - 4986
# — SQL-expressible in both engines (xor/>>/% only), and unlike the old
# single affine LCG its plane vectors are decorrelated: an affine-in-k
# family makes every plane an arithmetic progression shifted by a
# constant, so sign bits correlate across planes and buckets stop
# splitting as planes are added (measured max-bucket at 12 planes on a
# 4k isotropic corpus: 900 affine vs 358 mixed; tests/test_ann_widths.py
# locks the ~2x-per-plane shrink).
#
# DEFAULT widths (toy-sized, matched to the tiny test corpora so the DuckDB
# oracles stay readable). They are PARAMETERS, not structure: every Spark
# path below takes n_planes / n_bands / planes_per_band / centroid-count
# arguments, and ``ann_widths(n_vectors)`` picks production values that keep
# the expected bucket size near a target as the corpus grows (each added
# plane per band halves the expected bucket: tests/test_ann_widths.py proves
# this on a 4k-vector fixture while holding recall).
N_PLANES = 6


def ann_widths(n_vectors: int, target_bucket: int = 1024, n_bands: int = 3) -> dict:
    """Index widths for a corpus of ``n_vectors``: per band the key space
    is 2^planes_per_band buckets, so planes_per_band = ceil(log2(n /
    target_bucket)) keeps the expected bucket near ``target_bucket`` rows
    (10^9 vectors, 1k target -> 20 planes/band, 60 planes total); IVF
    centroid count grows as sqrt(n) (10^9 -> ~32k ~ the 2^16 the sim8
    docstring cites), past IVF_BROADCAST_MAX_K the two-level assignment
    path below avoids broadcasting the centroid table altogether."""
    import math

    ppb = max(
        PLANES_PER_BAND,
        math.ceil(math.log2(max(n_vectors / target_bucket, 2.0))),
    )
    return {
        "n_bands": n_bands,
        "planes_per_band": ppb,
        "n_planes": n_bands * ppb,
        "n_centroids": max(N_CENTROIDS, int(round(math.sqrt(n_vectors)))),
    }


def _emb_double(spark, sf_dir, fanout: bool = False):
    e = (t_fanout if fanout else t)(spark, sf_dir, "embeddings")
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
    # fan the (tiny, unsplittable at bench scale) scan out so the O(n^2)
    # scoring — all of which happens before any exchange — uses every
    # core; see queries/common.py t_fanout (no-op at real scale)
    e = _emb_double(spark, sf_dir, fanout=True)
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
        k = d.cast("long") + F.lit(64 * i + 1)
        h1 = (k * F.lit(2654435761)) % F.lit(1000003)
        h2 = (h1.bitwiseXOR(F.shiftright(h1, 7)) * F.lit(48271)) % F.lit(9973)
        return (h2 - 4986).cast("double")

    return w


def lsh_signatures(e, n_planes: int = N_PLANES):
    """Random-hyperplane LSH signature over an (vec_id, label, v) frame —
    the width-parameterized core behind sim2."""
    sig = None
    for i in range(n_planes):
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


def sim2_lsh_signatures(spark, sf_dir):
    """Random-hyperplane LSH signature per vector (the ANN bucketing key)."""
    return lsh_signatures(_emb_double(spark, sf_dir))


SIM2_SQL = f"""
SELECT vec_id, label,
       cast({' + '.join(
           f"(CASE WHEN round(proj{i}, 6) >= 0 THEN {2**i} ELSE 0 END)"
           for i in range(N_PLANES))} AS bigint) AS lsh_bucket
FROM (
  SELECT vec_id, label,
         {', '.join(
             f"(SELECT sum(x * (((xor(((d - 1 + {64 * i + 1}) * 2654435761) % 1000003,"
             f" (((d - 1 + {64 * i + 1}) * 2654435761) % 1000003) >> 7)"
             f" * 48271) % 9973 - 4986)::double))"
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
#
# SCALE PATH (round-2 rework): candidates come from a BANDED hyperplane-LSH
# equi-join — 3 bands x 2 planes over the sim2 signature, exactly the shape
# dd4 uses for MinHash text dedup — never from a cross join. At 10^9
# vectors the old all-pairs crossJoin was 10^18 comparisons; the band join
# touches only same-band-key buckets (P[candidate] ~ 0.76 at cos 0.35 vs
# 1-(1-(1-theta/pi)^2)^3 analytics), then verifies exact cosine on the
# candidate set only.
NEARDUP_MIN = 0.35
N_BANDS = 3
PLANES_PER_BAND = 2  # N_PLANES == N_BANDS * PLANES_PER_BAND


def _banded_keys(sig, n_bands: int = N_BANDS, planes_per_band: int = PLANES_PER_BAND):
    """Explode a signature into (vec_id, band, key) rows: band b's key is
    bits [ppb*b, ppb*(b+1)) of the signature — 2^ppb possible keys per
    band, so each added plane per band halves the expected bucket size."""
    width = 2**planes_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (F.floor(F.col("lsh_bucket") / F.lit(width**b)).cast("long") % width)
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("vec_id", F.explode(bands).alias("bk")).select(
        "vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


_BANDS_SQL_ROWS = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, ((lsh_bucket // {4**b}) % 4) AS key FROM sig"
    for b in range(N_BANDS)
)


def sim5_embedding_neardup_pairs(spark, sf_dir):
    e = _emb_double(spark, sf_dir)
    banded = _banded_keys(sim2_lsh_signatures(spark, sf_dir))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()  # a pair can collide in >1 band
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = cand.join(ea, "id_a").join(eb, "id_b")
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.withColumn("cos_sim", F.round(cos, 4))
        .filter(F.col("cos_sim") >= NEARDUP_MIN)
        .select("id_a", "id_b", "cos_sim")
    )


SIM5_SQL = f"""
WITH sig AS ({SIM2_SQL}),
bands AS ({_BANDS_SQL_ROWS}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.vec_id < b.vec_id
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT id_a, id_b,
       round(list_dot_product(ea.v, eb.v)
             / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))),
             4) AS cos_sim
FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
WHERE round(list_dot_product(ea.v, eb.v)
            / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))),
            4) >= {NEARDUP_MIN}
"""


def sim7_ann_topk(spark, sf_dir):
    """End-to-end bucketed ANN retrieval: each query probes only the
    vectors sharing at least one LSH band key with it (sim2's index side),
    ranks candidates by exact cosine, keeps top-k. The scale replacement
    for sim1's exhaustive scan — per query it touches O(corpus / 4) rows
    per band instead of the whole corpus. Recall vs the exact sim1 answer
    is asserted in tests/test_similarity_ann.py.

    Reference-capability analog: broadcast lookup enrich at scale
    (/root/reference/src/transform/position.py:40-57) — here the "lookup"
    is the LSH bucket index."""
    return ann_topk(spark, sf_dir)


def ann_topk(
    spark,
    sf_dir,
    n_bands: int = N_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
    n_query: int = N_QUERY,
    top_k: int = TOP_K,
):
    """Width-parameterized LSH-bucketed ANN core behind sim7; production
    widths come from ``ann_widths(n_vectors)``."""
    e = _emb_double(spark, sf_dir)
    sig = lsh_signatures(e, n_planes=n_bands * planes_per_band)
    banded = _banded_keys(sig, n_bands=n_bands, planes_per_band=planes_per_band)
    q = banded.filter(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("qid"), "band", "key"
    )
    cand = (
        q.join(banded, ["band", "key"])
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", F.col("vec_id").alias("nid"))
        .distinct()
    )
    eq = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    en = e.select(F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
    pairs = cand.join(eq, "qid").join(en, "nid")
    cos = _dot(F.col("qv"), F.col("nv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("nv"), F.col("nv")))
    )
    ranked = pairs.withColumn("cos_sim", F.round(cos, 4)).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
        ),
    )
    return ranked.filter(F.col("rank") <= top_k).select("qid", "nid", "cos_sim", "rank")


SIM7_SQL = f"""
WITH sig AS ({SIM2_SQL}),
bands AS ({_BANDS_SQL_ROWS}),
cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
  FROM bands q JOIN bands c ON q.band = c.band AND q.key = c.key
  WHERE q.vec_id < {N_QUERY} AND q.vec_id <> c.vec_id
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT qid, nid,
         round(list_dot_product(eq.v, en.v)
               / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(en.v, en.v))),
               4) AS cos_sim
  FROM cand JOIN e eq ON eq.vec_id = qid JOIN e en ON en.vec_id = nid
)
SELECT qid, nid, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# --- IVF-style ANN: centroid cells = the scale path ----------------------------
# centroids are the first K vectors (deterministic "training"); every vector
# is assigned to its nearest centroid cell; search only touches one cell.
N_CENTROIDS = 8


def sim6_ivf_assign(spark, sf_dir):
    cells = _ivf_scored(spark, sf_dir).filter(F.col("rn") == 1)
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


NPROBE = 2


def _ivf_scored(spark, sf_dir):
    """Every vector scored against every centroid (broadcast — centroids
    are tiny by construction) with its per-vector rank; rn=1 is the cell
    assignment (sim6), rn<=NPROBE is the query-side probe set (sim8)."""
    e = _emb_double(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    j = e.crossJoin(F.broadcast(cents))
    cos = _dot(F.col("v"), F.col("cv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    return j.withColumn("cos_c", F.round(cos, 6)).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cent_id"))
        ),
    )


def sim8_ivf_topk(spark, sf_dir):
    """IVF cell-probed ANN retrieval (nprobe=2): each query searches only
    the vectors assigned to its 2 nearest centroid cells — the second
    bucketed retrieval path (sim7 is the LSH one). Cells partition the
    corpus, so probe-join candidates are already unique; no distinct
    needed. At scale K grows as sqrt(n) (ann_widths) and past
    IVF_BROADCAST_MAX_K the assignment switches to the two-level
    ``ivf_assign`` path below, which never broadcasts the full centroid
    table; the corpus-side join stays a plain shuffle on cent_id."""
    scored = _ivf_scored(spark, sf_dir)
    cells = scored.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("nid"), "cent_id", F.col("v").alias("nv")
    )
    probes = scored.filter(
        (F.col("vec_id") < N_QUERY) & (F.col("rn") <= NPROBE)
    ).select(F.col("vec_id").alias("qid"), "cent_id", F.col("v").alias("qv"))
    pairs = probes.join(cells, "cent_id").filter(F.col("qid") != F.col("nid"))
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


SIM8_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.cent_id, e.v,
         round(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))),
               6) AS cos_c,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))),
               6) DESC, c.cent_id) AS rn
  FROM e CROSS JOIN c
),
cells AS (SELECT vec_id AS nid, cent_id, v AS nv FROM scored WHERE rn = 1),
probes AS (SELECT vec_id AS qid, cent_id, v AS qv FROM scored
           WHERE vec_id < {N_QUERY} AND rn <= {NPROBE}),
pairs AS (
  SELECT qid, nid,
         round(list_dot_product(qv, nv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))),
               4) AS cos_sim
  FROM probes JOIN cells USING (cent_id) WHERE qid <> nid
)
SELECT qid, nid, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
  FROM pairs
) WHERE rank <= {TOP_K}
"""


# --- IVF assignment at scale: two-level coarse->fine dispatch ------------------
# sim6/sim8's flat assignment broadcasts the whole centroid table — right
# up to a few thousand centroids, wrong at the K ~ sqrt(n) a 10^9-vector
# index needs (ann_widths: ~32k centroids x dim doubles won't broadcast).
# ``ivf_assign`` dispatches: past IVF_BROADCAST_MAX_K it goes two-level —
# (1) broadcast only ~sqrt(K) COARSE centroids, (2) map fine centroids and
# vectors each to their nearest coarse cell (two tiny broadcast scorings),
# (3) equi-join vectors to fine centroids ON coarse_id (a plain shuffle
# join that never materializes all K centroids on any executor), (4) best
# fine centroid per vector. The coarse level is a partition of the fine
# set, so for cluster-shaped data the two-level answer agrees with flat
# assignment (tests/test_ann_widths.py measures >= 90% agreement and
# asserts the fine join is NOT a broadcast join).
IVF_BROADCAST_MAX_K = 4096


def _best_by_cos(scored, part_col: str, id_col: str):
    rn = F.row_number().over(
        Window.partitionBy(part_col).orderBy(F.col("cos_c").desc(), F.col(id_col))
    )
    return scored.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")


def ivf_assign_flat(e, cents):
    """(vec_id, cent_id, cos_c): nearest centroid by broadcast scoring."""
    j = e.select("vec_id", "v").crossJoin(F.broadcast(cents))
    cos = _dot(F.col("v"), F.col("cv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    scored = j.withColumn("cos_c", F.round(cos, 6))
    return _best_by_cos(scored, "vec_id", "cent_id").select(
        "vec_id", "cent_id", "cos_c"
    )


def ivf_assign_two_level(e, cents, coarse_k: int):
    """(vec_id, cent_id, cos_c) without ever broadcasting the full centroid
    table. Convention: ``cents`` has (cent_id, cv) with cent_id in [0, K);
    the coarse level is cent_id < coarse_k (any fixed subset works — the
    coarse cells only need to partition the fine set deterministically)."""
    coarse = cents.filter(F.col("cent_id") < coarse_k).select(
        F.col("cent_id").alias("coarse_id"), F.col("cv").alias("coarse_v")
    )

    def to_coarse(df, id_col, vec_col):
        j = df.crossJoin(F.broadcast(coarse))
        cos = _dot(F.col(vec_col), F.col("coarse_v")) / (
            F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
            * F.sqrt(_dot(F.col("coarse_v"), F.col("coarse_v")))
        )
        rn = F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.round(cos, 6).desc(), F.col("coarse_id")
            )
        )
        return j.withColumn("rn", rn).filter(F.col("rn") == 1).select(
            id_col, vec_col, "coarse_id"
        )

    cent2coarse = to_coarse(cents, "cent_id", "cv")
    v2coarse = to_coarse(e.select("vec_id", "v"), "vec_id", "v")
    # the K-sized side arrives via a SHUFFLE on coarse_id — hinted so AQE
    # cannot "helpfully" broadcast it in small tests and hide the scale shape
    cand = v2coarse.join(cent2coarse.hint("shuffle_hash"), "coarse_id")
    cos = _dot(F.col("v"), F.col("cv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    scored = cand.withColumn("cos_c", F.round(cos, 6))
    return _best_by_cos(scored, "vec_id", "cent_id").select(
        "vec_id", "cent_id", "cos_c"
    )


def ivf_assign(e, cents, k: int, coarse_k: int | None = None):
    """Nearest-centroid assignment, dispatched on centroid count: flat
    broadcast scoring up to IVF_BROADCAST_MAX_K, two-level beyond."""
    import math

    if k <= IVF_BROADCAST_MAX_K:
        return ivf_assign_flat(e, cents)
    return ivf_assign_two_level(e, cents, coarse_k or math.isqrt(k))


# --- k-means (Lloyd) refinement of the IVF centroids ---------------------------
# sim6/sim8 seed cells from the first K vectors; a real index trains the
# centroids. Two Lloyd iterations, pure DataFrame ops: assign = broadcast
# centroid scoring (as sim6), update = element-wise mean via posexplode ->
# per-(cell, dim) ORDER-INDEPENDENT decimal mean rounded to 6 dp (so both
# engines produce bit-identical centroids) -> rebuild the array sorted by
# dim. At 10^9 vectors each iteration is one broadcast-scored pass plus a
# (K x dim)-sized aggregate — no shuffle of the corpus by cell needed.
KMEANS_ITERS = 2


def _kmeans_cells(spark, sf_dir, iters: int = KMEANS_ITERS):
    e = _emb_double(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )

    def assign(cents_df):
        j = e.crossJoin(F.broadcast(cents_df))
        cos = _dot(F.col("v"), F.col("cv")) / (
            F.sqrt(_dot(F.col("v"), F.col("v")))
            * F.sqrt(_dot(F.col("cv"), F.col("cv")))
        )
        return (
            j.withColumn("cos_c", F.round(cos, 6))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy(
                        F.col("cos_c").desc(), F.col("cent_id")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
        )

    for _ in range(iters):
        cells = assign(cents)
        comp = cells.select("cent_id", F.posexplode("v").alias("d", "x"))
        dim_mean = comp.groupBy("cent_id", "d").agg(
            F.round(
                F.sum(F.col("x").cast("decimal(28,10)")).cast("double")
                / F.count("x"),
                6,
            ).alias("cx")
        )
        cents = dim_mean.groupBy("cent_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cx"))),
                lambda s: s["cx"],
            ).alias("cv")
        )
    return assign(cents)


def sim9_kmeans_cells(spark, sf_dir):
    """Per-cell stats after 2 Lloyd iterations over the IVF centroids."""
    cells = _kmeans_cells(spark, sf_dir)
    return cells.groupBy("cent_id").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
        F.round(F.sum(F.col("cos_c").cast("decimal(24,6)")).cast("double"), 4)
        .alias("sum_cos_to_centroid"),
    )


def _km_sql_iter(prev_cents: str, idx: int) -> str:
    """One unrolled Lloyd iteration in DuckDB SQL: assign to ``prev_cents``
    then emit refined centroids as cents{idx}."""
    return f"""
scored{idx} AS (
  SELECT e.vec_id, e.label, e.v, c.cent_id,
         round(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))),
               6) AS cos_c
  FROM e CROSS JOIN {prev_cents} c
), cells{idx} AS (
  SELECT * FROM scored{idx}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cent_id) = 1
), comp{idx} AS (
  SELECT cent_id, generate_subscripts(v, 1) AS d, unnest(v) AS x FROM cells{idx}
), dimmean{idx} AS (
  SELECT cent_id, d,
         round(cast(sum(cast(x AS decimal(28,10))) AS double) / count(x), 6) AS cx
  FROM comp{idx} GROUP BY cent_id, d
), cents{idx} AS (
  SELECT cent_id, list(cx ORDER BY d) AS cv FROM dimmean{idx} GROUP BY cent_id
)"""


SIM9_SQL = (
    f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
cents0 AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),"""
    + _km_sql_iter("cents0", 1).lstrip()
    + ","
    + _km_sql_iter("cents1", 2)
    + f""",
final_scored AS (
  SELECT e.vec_id, e.label, c.cent_id,
         round(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))),
               6) AS cos_c
  FROM e CROSS JOIN cents2 c
), final_cells AS (
  SELECT * FROM final_scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cent_id) = 1
)
SELECT cent_id, count(*) AS n_vectors, count(DISTINCT label) AS n_labels,
       round(cast(sum(cast(cos_c AS decimal(24,6))) AS double), 4) AS sum_cos_to_centroid
FROM final_cells GROUP BY cent_id
"""
)


def sim10_embedding_dedup_clusters(spark, sf_dir):
    """End-to-end embedding-space dedup: connected components over the
    sim5 banded-LSH near-dup pairs, one row per cluster with the kept
    representative (min vec_id) — the embedding twin of dd6's text
    near-dup clustering, sharing the same cc_bigstar scale kernel
    (O(log^2 n) rounds of co-partitioned groupBy/joins; edges come from
    the bucketed LSH equi-join, never from all pairs).

    Reference-capability analog: duplicate-lap collapse keyed on derived
    similarity (/root/reference/src/ingestion/anomalies.py:39-95), lifted
    to vector space for training-data curation."""
    from ..operators.graph import cc_bigstar

    edges = sim5_embedding_neardup_pairs(spark, sf_dir).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    labels = cc_bigstar(edges)  # (doc_id, cluster_id), cluster = min id
    return labels.groupBy("cluster_id").agg(
        F.count("*").alias("n_vectors"),
        F.min("doc_id").alias("keep_vec"),
        F.max("doc_id").alias("max_vec"),
    )


SIM10_SQL = f"""
WITH RECURSIVE pairs AS (SELECT * FROM ({SIM5_SQL})),
base_edges AS (SELECT id_a AS src, id_b AS dst FROM pairs),
edges AS (
  SELECT src, dst FROM base_edges
  UNION ALL SELECT dst, src FROM base_edges
), nodes AS (
  SELECT DISTINCT src AS vec_id FROM edges
), reach(a, b) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
), labels AS (
  SELECT a AS vec_id, min(b) AS cluster_id FROM reach GROUP BY a
)
SELECT cluster_id, count(*) AS n_vectors, min(vec_id) AS keep_vec,
       max(vec_id) AS max_vec
FROM labels GROUP BY cluster_id
"""


QUERIES = {
    "sim1_cosine_topk": (sim1_cosine_topk, SIM1_SQL),
    "sim2_lsh_signatures": (sim2_lsh_signatures, SIM2_SQL),
    "sim3_lsh_bucket_stats": (sim3_lsh_bucket_stats, SIM3_SQL),
    "sim4_vector_norms": (sim4_vector_norms, SIM4_SQL),
    "sim5_embedding_neardup_pairs": (sim5_embedding_neardup_pairs, SIM5_SQL),
    "sim6_ivf_assign": (sim6_ivf_assign, SIM6_SQL),
    "sim7_ann_topk": (sim7_ann_topk, SIM7_SQL),
    "sim8_ivf_topk": (sim8_ivf_topk, SIM8_SQL),
    "sim9_kmeans_cells": (sim9_kmeans_cells, SIM9_SQL),
    "sim10_embedding_dedup_clusters": (
        sim10_embedding_dedup_clusters,
        SIM10_SQL,
    ),
}
