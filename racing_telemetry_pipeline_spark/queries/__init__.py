"""Driver-contract query registry.

Each module exposes ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
equivalent DuckDB SQL over the pre-registered testdata views. Column names
and value rounding are kept identical on both sides (driver hashes values
after sorting columns by name).
"""

from __future__ import annotations

from . import (
    dedup_text,
    features,
    log_ops,
    multimodal_q,
    pipeline_queries,
    similarity,
    tpch,
)


def all_queries():
    out = {}
    for mod in (
        log_ops,
        tpch,
        dedup_text,
        similarity,
        features,
        multimodal_q,
        pipeline_queries,
    ):
        out.update(mod.QUERIES)
    return out
