"""Cross-engine signed 64-bit string hash (Spark <-> DuckDB bit-identical).

Both engines derive the SAME signed 64-bit value from the first 16 hex
digits of md5, assembled as two 32-bit halves (hi_signed * 2^32 + lo) so
every intermediate stays inside int64 on both engines and all 64 bits are
informative (bit 63 lands on the int64 sign bit). This is the ONE hash
used everywhere a Spark value must equal a DuckDB-oracle value (MinHash /
SimHash signatures, multimodal media-type selection); the weaker 60-bit
``conv(substr(md5, 1, 15))`` form is retired — 15 hex digits leave the top
4 bits always zero.

At 100 TB the md5 would be swapped for xxhash64 (Spark-side only); md5
here buys cross-engine verifiability.

The hash is SIGNED: modular bucketing must use ``F.pmod`` on Spark and
``((x % m) + m) % m`` in DuckDB (both engines' ``%`` keeps the dividend's
sign).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def hash64(col):
    """Signed 64-bit hash column from the first 16 hex digits of md5.

    hi_signed spans [-2^31, 2^31-1], so hi_signed * 2^32 + lo covers the
    full signed int64 range with no intermediate overflow on either
    engine.
    """
    md = F.md5(col.cast("binary"))
    hi = F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(md, 9, 8), 16, 10).cast("long")
    hi_signed = hi - F.when(hi >= F.lit(2**31), F.lit(2**32)).otherwise(F.lit(0))
    return hi_signed * F.lit(2**32) + lo


# DuckDB twin; .format(x="<sql expr>") with the expression to hash.
HASH64_SQL = (
    "((('0x' || substr(md5({x}), 1, 8))::bigint"
    " - CASE WHEN ('0x' || substr(md5({x}), 1, 8))::bigint >= 2147483648"
    " THEN 4294967296 ELSE 0 END) * 4294967296"
    " + ('0x' || substr(md5({x}), 9, 8))::bigint)"
)


def pmod_sql(expr: str, m: int) -> str:
    """Non-negative modulus in DuckDB SQL (twin of Spark ``F.pmod``)."""
    return f"((({expr}) % {m} + {m}) % {m})"
