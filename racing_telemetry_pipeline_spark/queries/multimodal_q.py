"""Multimodal byte-column queries for the driver contract.

The Spark side runs the REAL binary plumbing (multimodal/binary_ops.py:
binary payload column, JVM byte functions over it); the DuckDB oracle
derives the same expected values from the text column the fake payload was
built from — a genuine differential check of the binary path, not a
restatement of it. Decode kernels stay test-level (container has no
image/audio libs); these queries cover the JVM-side feature family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hash64 import HASH64_SQL, pmod_sql
from ..multimodal.binary_ops import attach_fake_payload
from .common import t

# the repo-wide 64-bit hash (signed -> pmod for bucketing), matching
# attach_fake_payload's Spark-side hash64 exactly
_H64 = HASH64_SQL.format(x="text")


def mm1_payload_features(spark, sf_dir):
    """Byte features over the payload column, rolled up by (source,
    media_type): counts, total bytes, distinct magic prefixes."""
    docs = attach_fake_payload(t(spark, sf_dir, "documents"))
    return (
        docs.withColumn("magic_hex", F.hex(F.substring("payload", 1, 4)))
        .groupBy("source", "media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("magic_hex").alias("n_magic"),
            F.min("magic_hex").alias("min_magic"),
            F.sum(F.col("width").cast("long")).alias("sum_width"),
        )
    )


MM1_SQL = f"""
SELECT source, media_type, count(*) AS n_docs,
       cast(sum(n_bytes) AS bigint) AS total_bytes,
       count(DISTINCT magic_hex) AS n_magic,
       min(magic_hex) AS min_magic,
       cast(sum(width) AS bigint) AS sum_width
FROM (
  SELECT source,
         CASE ({pmod_sql(_H64, 3)})
           WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
           ELSE 'audio/wav' END AS media_type,
         64::bigint AS n_bytes,
         upper(substr(md5(text), 1, 8)) AS magic_hex,
         cast({pmod_sql(_H64, 64)} + 16 AS int) AS width
  FROM documents
)
GROUP BY source, media_type
"""


QUERIES = {
    "mm1_payload_features": (mm1_payload_features, MM1_SQL),
}
