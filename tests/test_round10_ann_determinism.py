"""Round-10 pins: ANN trainer partition-invariance.

PARTITION_DETERMINISM_r09 measured 465/468 queries bit-identical at 5 vs
32 shuffle partitions; the 3 divergers were the ANN trainers, whose
Bernoulli sample() selected a partition-seeded subset and whose toPandas()
delivered it in partition order — so k-means init and float accumulation
order drifted with the partitioning. The fix (similarity._sample_matrix)
selects and orders the training sample by CONTENT hash only; these tests
pin that the sample, the trained centroids/codebooks, and the end-to-end
top-k results are all pure functions of corpus content, invariant to how
the corpus happens to be partitioned.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aircan_spark.data import load_table
from aircan_spark.ext import similarity

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_sample_matrix_partition_invariant(spark, emb):
    mats = [
        similarity._sample_matrix(emb.repartition(p), "embedding", 200, seed=42)
        for p in (1, 3, 17)
    ]
    assert mats[0].shape == (200, mats[0].shape[1])
    for m in mats[1:]:
        assert np.array_equal(mats[0], m)  # bit-identical rows, same order


def test_sample_matrix_bounded_and_full_below_cap(spark, emb):
    n = emb.count()
    full = similarity._sample_matrix(emb, "embedding", n + 100, seed=7)
    assert len(full) == n  # cap above corpus size -> whole corpus
    # the modulus filter keeps ~Binomial(n, 1/modulus) rows, so the exact
    # count is fixture-dependent — pin the bound and non-emptiness only
    small = similarity._sample_matrix(emb, "embedding", 50, seed=7)
    assert 0 < len(small) <= 50


def test_sample_matrix_duplicate_heavy_fallback(spark):
    """A corpus of many rows but few distinct values: duplicates share one
    hash, so the modulus filter can strand ZERO survivors — the sampler
    must fall back to the distinct-value set instead of crashing the
    trainers (np axis errors on an empty matrix)."""
    rows = [([float(i % 3), 1.0],) for i in range(5000)]  # 3 distinct vecs
    df = spark.createDataFrame(rows, "embedding array<double>")
    for seed in range(8):  # any seed must survive, hit-or-miss the modulus
        mat = similarity._sample_matrix(df, "embedding", 100, seed=seed)
        assert 1 <= len(mat) <= 100
    cents = similarity._train_centroids(df, "embedding", nlist=4, seed=3)
    assert cents.shape[1] == 2  # trains, with k clamped to distinct points
    import pytest as _pytest

    empty = spark.createDataFrame([], "embedding array<double>")
    with _pytest.raises(ValueError, match="empty corpus"):
        similarity._sample_matrix(empty, "embedding", 10, seed=0)


def test_train_centroids_partition_invariant(spark, emb):
    cents = [
        similarity._train_centroids(emb.repartition(p), "embedding", nlist=8, seed=42)
        for p in (2, 13)
    ]
    assert np.array_equal(cents[0], cents[1])
    norms = np.linalg.norm(cents[0], axis=1)
    assert np.allclose(norms, 1.0)  # spherical k-means: unit centroids


def test_pq_train_partition_invariant(spark, emb):
    books = [
        similarity.pq_train(emb.repartition(p), m=16, ksub=16, seed=11)
        for p in (2, 13)
    ]
    assert np.array_equal(books[0], books[1])


def test_ivf_topk_end_to_end_partition_invariant(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    out = [
        similarity.ivf_topk(
            emb.repartition(p), queries, k=3, nlist=8, nprobe=2
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        for p in (2, 13)
    ]
    assert out[0].equals(out[1])


def test_kmeanspp_init_spreads_and_survives_degenerate_input():
    rng = np.random.default_rng(0)
    # well-separated blobs: k-means++ must pick one center near each
    blobs = np.concatenate(
        [rng.standard_normal((50, 4)) * 0.01 + c for c in (0.0, 10.0, -10.0, 20.0)]
    )
    cents = similarity._kmeanspp_init(blobs, 4, np.random.default_rng(1))
    picked = sorted(round(float(c[0]) / 10.0) * 10 for c in cents)
    assert picked == [-10, 0, 10, 20]
    # all-identical rows: total distance is 0 -> must not divide by zero
    same = np.ones((20, 4))
    cents = similarity._kmeanspp_init(same, 5, np.random.default_rng(2))
    assert cents.shape == (5, 4) and np.array_equal(cents, np.ones((5, 4)))
    # k > n clamps to n
    cents = similarity._kmeanspp_init(same[:3], 5, np.random.default_rng(3))
    assert cents.shape == (3, 4)
