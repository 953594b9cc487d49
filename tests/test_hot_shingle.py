"""Stop-shingle cap: a blocking key shared by every document must not
produce a quadratic candidate group (VERDICT.md round-1 "What's wrong" #3).

The fixture plants one boilerplate shingle in ALL docs; without the
MAX_SHINGLE_DF cap the dd2 self-join would emit ~n^2/2 pairs from that
shingle alone. With the cap, pair counts stay bounded by what the rare
shingles justify, and genuinely similar docs are still found.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from racing_telemetry_pipeline_spark.queries.dedup_text import (
    MAX_SHINGLE_DF,
    dd2_ngram_jaccard_pairs,
    dd6_dedup_clusters,
)

N_DOCS = 200  # > MAX_SHINGLE_DF, so the planted shingle is dropped


@pytest.fixture(scope="module")
def hot_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("hotshingle")
    docs = []
    for i in range(N_DOCS):
        # every doc ends with the same boilerplate 3-gram; unique body words
        # keep docs dissimilar except for planted near-dup pairs below
        body = " ".join(f"u{i}w{j}" for j in range(8))
        docs.append(f"{body} common boilerplate footer")
    # two genuine near-dup pairs that must survive the cap
    docs[10] = docs[11] = "alpha beta gamma delta epsilon zeta eta theta x y"
    docs[20] = docs[21] = "one two three four five six seven eight nine ten"
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(docs),
            "source": pa.array(["s"] * N_DOCS),
            "lang": pa.array(["en"] * N_DOCS),
            "n_chars": pa.array([len(x) for x in docs], pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_dd2_pair_count_bounded(spark, hot_dir):
    assert N_DOCS > MAX_SHINGLE_DF
    pairs = dd2_ngram_jaccard_pairs(spark, hot_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    # the hot shingle must not explode into ~N_DOCS^2/2 candidates
    assert len(got) < 50, f"{len(got)} pairs — hot shingle not capped"
    # the genuine duplicates survive
    assert (10, 11) in got and (20, 21) in got
    by_pair = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert by_pair[(10, 11)] == 1.0
    assert by_pair[(20, 21)] == 1.0


def test_dd6_clusters_bounded(spark, hot_dir):
    rows = dd6_dedup_clusters(spark, hot_dir).collect()
    # only the two planted duplicate pairs form clusters; the boilerplate
    # footer must not chain all 200 docs into one giant component
    clusters = {r.cluster_id: r.n_docs for r in rows}
    assert clusters == {10: 2, 20: 2}, clusters
