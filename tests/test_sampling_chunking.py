"""Unit tests for ext/sampling.py, ext/chunking.py, ext/vectors.py —
determinism, split stability under subsetting, chunk reconstruction, and
centroid math on crafted frames."""

import pytest
from pyspark.sql import functions as F

from aircan_spark.ext import chunking, sampling, vectors


@pytest.fixture()
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(1000)], "id long")


def test_shuffle_is_permutation_and_deterministic(spark, ids):
    a = sampling.deterministic_shuffle(ids, "id", seed=1).collect()
    b = sampling.deterministic_shuffle(ids, "id", seed=1).collect()
    assert a == b
    assert sorted(r["id"] for r in a) == list(range(1000))
    c = sampling.deterministic_shuffle(ids, "id", seed=2).collect()
    assert [r["id"] for r in a] != [r["id"] for r in c]  # seed changes order


def test_hash_split_fractions_and_stability(spark, ids):
    out = sampling.hash_split(ids, "id", seed=7)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts["train"] / 1000 == pytest.approx(0.8, abs=0.05)
    assert counts["val"] / 1000 == pytest.approx(0.1, abs=0.04)
    assert counts["test"] / 1000 == pytest.approx(0.1, abs=0.04)
    # stability: the same id keeps its split when scored within any subset
    full = {r["id"]: r["split"] for r in out.collect()}
    sub = sampling.hash_split(ids.filter(F.col("id") < 100), "id", seed=7)
    assert all(full[r["id"]] == r["split"] for r in sub.collect())


def test_stratified_sample_exact_counts(spark):
    df = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(20)] + [("tiny", 0), ("tiny", 1)],
        "g string, id long",
    )
    out = sampling.stratified_sample(df, ["g"], 5, "id", seed=3)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 5, "b": 5, "tiny": 2}  # capped at group size
    again = sampling.stratified_sample(df, ["g"], 5, "id", seed=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_chunking_sizes_and_reconstruction(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = chunking.chunk_documents(df, chunk_size=4, overlap=1)
    rows = sorted(out.collect(), key=lambda r: r["chunk_id"])
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 1]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    # stride-prefix reconstruction: first (chunk_size - overlap) tokens of
    # each chunk concatenated reproduce the document
    rebuilt = []
    for r in rows:
        rebuilt.extend(r["chunk_text"].split(" ")[:3])
    assert rebuilt[:10] == words


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rows = chunking.chunk_documents(df, chunk_size=32, overlap=4).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b"


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, chunk_size=4, overlap=4)


def test_vector_norms(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = {r["vec_id"]: r for r in vectors.vector_norms(df).collect()}
    assert rows[1]["l2_norm"] == 5.0 and rows[1]["dim"] == 2
    assert rows[2]["l2_norm"] == 0.0


def test_label_centroids(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 20.0])],
        "label long, embedding array<float>",
    )
    out = vectors.label_centroids(df)
    got = {(r["label"], r["pos"]): (r["centroid_val"], r["n_vectors"])
           for r in out.collect()}
    assert got[(0, 1)] == (2.0, 2) and got[(0, 2)] == (4.0, 2)
    assert got[(1, 1)] == (10.0, 1) and got[(1, 2)] == (20.0, 1)


def test_user_event_features_crafted(spark):
    from datetime import datetime, timedelta

    from aircan_spark.ext.features import user_event_features

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 5, t0, 1.5),
            (2, 5, t0 + timedelta(seconds=5), 2.5),
            (3, 6, t0, 10.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    rows = {r["event_id"]: r for r in user_event_features(df).collect()}
    assert rows[1]["micros_since_prev"] is None and rows[1]["n_prev_events"] == 0
    assert rows[2]["micros_since_prev"] == 5_000_000
    assert rows[2]["n_prev_events"] == 1
    assert rows[2]["cum_value"] == "4.000000"
    assert rows[3]["n_prev_events"] == 0 and rows[3]["cum_value"] == "10.000000"


def test_pivot_counts_fills_missing_with_zero(spark):
    from aircan_spark.ext.relational import pivot_counts

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "user_id long, kind string"
    )
    rows = {r["user_id"]: r for r in
            pivot_counts(df, ["user_id"], "kind", ["a", "b", "c"]).collect()}
    assert (rows[1]["a"], rows[1]["b"], rows[1]["c"]) == (2, 0, 0)
    assert (rows[2]["a"], rows[2]["b"], rows[2]["c"]) == (0, 1, 0)


def test_bernoulli_sample_extremes_and_stability(spark, ids):
    from aircan_spark.ext.sampling import bernoulli_sample
    from pyspark.sql import functions as F

    assert bernoulli_sample(ids, "id", F.lit(0.0)).count() == 0
    assert bernoulli_sample(ids, "id", F.lit(1.0)).count() == 1000
    half = bernoulli_sample(ids, "id", F.lit(0.5), seed=3)
    n = half.count()
    assert abs(n - 500) < 80  # hash-uniform
    kept = {r["id"] for r in half.collect()}
    sub = bernoulli_sample(ids.filter(F.col("id") < 100), "id", F.lit(0.5), seed=3)
    assert {r["id"] for r in sub.collect()} == {i for i in kept if i < 100}


def test_rolling_event_stats_window_boundaries(spark):
    """Trailing window includes the current row and events exactly at the
    span edge; older events fall out; keys never mix."""
    from datetime import datetime

    from aircan_spark.ext.features import rolling_event_stats

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def at(secs):
        return datetime.fromtimestamp(t0.timestamp() + secs)

    df = spark.createDataFrame(
        [
            (1, at(0), 10, 1.0),
            (2, at(3600), 10, 2.0),     # exactly 1h later: row 1 still in
            (3, at(3601), 10, 4.0),     # row 1 just fell out
            (4, at(0), 99, 100.0),      # other key, same ts
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    rows = {
        r["event_id"]: r
        for r in rolling_event_stats(df, span_seconds=3600).collect()
    }
    assert rows[1]["win_count"] == 1 and rows[1]["win_mean"] == 1.0
    assert rows[2]["win_count"] == 2 and rows[2]["win_mean"] == 1.5
    assert rows[3]["win_count"] == 2 and rows[3]["win_mean"] == 3.0
    assert rows[4]["win_count"] == 1 and rows[4]["win_mean"] == 100.0
    assert rows[2]["win_sum"] == "3.000000"


def test_zscore_crafted_and_degenerate_group(spark):
    """Known z-scores for a 3-value group; a zero-variance group yields
    NULL; NULL values pass through as NULL and don't shift the moments."""
    from aircan_spark.ext.features import zscore_normalize

    df = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "a", 2.0),
            (3, "a", 3.0),
            (4, "b", 5.0),
            (5, "b", 5.0),
            (6, "a", None),
        ],
        "id long, g string, value double",
    )
    rows = {r["id"]: r["zscore"] for r in zscore_normalize(df, ["g"], "value").collect()}
    assert rows[1] == -1.0 and rows[2] == 0.0 and rows[3] == 1.0
    assert rows[4] is None and rows[5] is None  # zero variance
    assert rows[6] is None


def test_histogram_boundaries(spark):
    """lo lands in bin 0, hi in the last bin, out-of-range rows drop,
    empty bins are absent."""
    from aircan_spark.ext.relational import histogram

    df = spark.createDataFrame(
        [(0.0,), (9.99,), (10.0,), (100.0,), (-0.01,), (100.01,), (None,)],
        "v double",
    )
    rows = {r["bin"]: r for r in histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert set(rows) == {0, 1, 9}
    assert rows[0]["n"] == 2          # 0.0, 9.99
    assert rows[1]["n"] == 1          # 10.0
    assert rows[9]["n"] == 1          # 100.0 clamps into the last bin
    assert rows[9]["bin_lo"] == 90.0 and rows[9]["bin_hi"] == 100.0


def test_cube_counts_levels(spark):
    """Cube emits all 4 level combinations for 2 dims; subtotals agree."""
    from aircan_spark.ext.relational import cube_counts

    df = spark.createDataFrame(
        [("x", "d1"), ("x", "d2"), ("y", "d1")], "t string, d string"
    )
    rows = {
        (r["t"], r["d"]): r["n"]
        for r in cube_counts(df, ["t", "d"], [F.count(F.lit(1)).alias("n")]).collect()
    }
    assert rows[("ALL", "ALL")] == 3
    assert rows[("x", "ALL")] == 2 and rows[("y", "ALL")] == 1
    assert rows[("ALL", "d1")] == 2 and rows[("ALL", "d2")] == 1
    assert rows[("x", "d1")] == 1 and len(rows) == 8


def test_pack_documents_greedy_boundaries(spark):
    """With one bucket, packing is the exclusive-cumsum floor in id
    order: docs straddling a boundary start in the earlier pack."""
    from aircan_spark.ext.chunking import pack_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # cum 3  -> pack 0
            (2, "a b c"),          # cum 6  -> pack 0 (starts at 3)
            (3, "a b c d"),        # cum 10 -> pack 1 (starts at 6)
            (4, "a b c d e f"),    # cum 16 -> pack 2 (starts at 10)
            (5, "a b"),            # cum 18 -> pack 3 (starts at 16)
        ],
        ["doc_id", "text"],
    )
    out = pack_documents(docs, seq_len=5, n_buckets=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(r["bucket"] == 0 for r in rows.values())
    assert [rows[i]["pack_id"] for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 2, 3]
    assert rows[4]["n_tokens"] == 6


def test_mixture_sample_rates(spark):
    """Rate 1.0 keeps every row, absent sources drop entirely, and a
    mid rate keeps a plausible fraction — all hash-deterministic."""
    from aircan_spark.ext.sampling import mixture_sample

    rows = [(i, "keep" if i % 3 == 0 else ("half" if i % 3 == 1 else "drop")) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = mixture_sample(df, "id", "src", {"keep": 1.0, "half": 0.5}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], set()).add(r["id"])
    assert len(by_src.get("keep", ())) == 1000
    assert "drop" not in by_src
    assert 350 < len(by_src["half"]) < 650
    again = mixture_sample(df, "id", "src", {"keep": 1.0, "half": 0.5}).collect()
    assert {r["id"] for r in again} == {r["id"] for r in out}


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    """Codes stay in [-127, 127], the max-|x| component hits ±127,
    dequantization reconstructs within scale/2 per cell, zero vectors
    quantize to zero with scale 0."""
    from aircan_spark.ext.vectors import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    q1 = [int(x) for x in rows[1]["qvec"].split(",")]
    s1 = rows[1]["scale"]
    assert min(q1) >= -127 and max(q1) <= 127
    assert -127 in q1                                  # the max-|x| cell
    for orig, code in zip([1.0, -2.0, 0.5], q1):
        assert abs(code * s1 - orig) <= s1 / 2 + 1e-9
    assert rows[2]["scale"] == 0.0
    assert rows[2]["qvec"] == "0,0,0"


def test_mad_by_group_crafted(spark):
    """Hand-computed MAD; NULLs are ignored; all-null group yields NULL;
    result is independent of row order (UDF sorts internally)."""
    from aircan_spark.ext.features import mad_by_group

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0), ("a", None),
         ("b", 7.0), ("c", None)],
        "g string, value double",
    )
    rows = {r["g"]: r["mad"] for r in mad_by_group(df, ["g"], "value").collect()}
    # a: median(1,2,3,100)=2.5; |v-2.5|=(1.5,0.5,0.5,97.5); median=1.0
    assert rows["a"] == 1.0
    assert rows["b"] == 0.0
    assert rows["c"] is None


# --- count-min sketch properties ----------------------------------------------------


def test_cms_never_underestimates_and_bounds(spark):
    from pyspark.sql import functions as F

    from aircan_spark.ext import sketch as cms

    items = spark.createDataFrame(
        [(f"w{i % 50}",) for i in range(2000)], "item string"
    )
    sk = cms.count_min_build(items, "item", depth=4, width=256, seed=7)
    exact = items.groupBy("item").agg(F.count(F.lit(1)).alias("exact"))
    est = cms.count_min_estimate(sk, exact.select("item"), "item", depth=4, width=256, seed=7)
    joined = {r["item"]: (r["exact"], r["cms_estimate"])
              for r in exact.join(est, "item").collect()}
    assert len(joined) == 50
    n = 2000
    for item, (ex, e) in joined.items():
        assert e >= ex, f"{item}: CMS underestimated {e} < {ex}"
        assert e <= ex + 2 * n / 256 * 4  # loose classic bound


def test_cms_merge_equals_build_on_union(spark):
    from aircan_spark.ext import sketch as cms

    a = spark.createDataFrame([(f"x{i % 10}",) for i in range(300)], "item string")
    b = spark.createDataFrame([(f"x{i % 7}",) for i in range(200)], "item string")
    merged = cms.count_min_merge(
        cms.count_min_build(a, "item", depth=3, width=64, seed=1),
        cms.count_min_build(b, "item", depth=3, width=64, seed=1),
    )
    direct = cms.count_min_build(a.unionByName(b), "item", depth=3, width=64, seed=1)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_aes_weighted_sample_properties(spark):
    from pyspark.sql import functions as F

    from aircan_spark.ext.sampling import aes_weighted_sample

    df = spark.createDataFrame(
        [(i, "g" + str(i % 3), float(1 + i % 9)) for i in range(300)],
        "id long, grp string, wt double",
    )
    out = aes_weighted_sample(df, "id", F.col("wt"), k=4, group_col="grp", seed=9)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["grp"], []).append(r["id"])
    assert all(len(v) == 4 for v in per.values())
    # deterministic across runs
    again = aes_weighted_sample(df, "id", F.col("wt"), k=4, group_col="grp", seed=9)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
    # ungrouped top-k path
    topk = aes_weighted_sample(df, "id", F.col("wt"), k=10, seed=9)
    assert topk.count() == 10
    # heavier rows are sampled more often: weight-1 ids vs weight-8 ids
    heavy = spark.createDataFrame(
        [(i, 100.0 if i % 2 == 0 else 0.01) for i in range(400)],
        "id long, wt double",
    )
    picked = aes_weighted_sample(heavy, "id", F.col("wt"), k=50, seed=3).collect()
    n_heavy = sum(1 for r in picked if r["wt"] == 100.0)
    assert n_heavy >= 45  # overwhelming-majority heavy picks


def test_aes_weighted_sample_nonpositive_weights_excluded(spark):
    """A-ES semantics for invalid weights (r2 advice): w=0 would divide by
    zero and w<0 would INVERT the key (sampling worst rows first) — both
    are excluded from the draw entirely, and the draw over the remaining
    rows is unchanged by their presence (subset stability)."""
    from pyspark.sql import functions as F

    from aircan_spark.ext.sampling import aes_weighted_sample

    good = [(i, float(1 + i % 5)) for i in range(100)]
    bad = [(1000, 0.0), (1001, -3.0), (1002, -0.5)]
    clean = spark.createDataFrame(good, "id long, wt double")
    dirty = spark.createDataFrame(good + bad, "id long, wt double")
    picked_clean = sorted(
        r["id"] for r in aes_weighted_sample(clean, "id", F.col("wt"), k=20, seed=4).collect()
    )
    picked_dirty = sorted(
        r["id"] for r in aes_weighted_sample(dirty, "id", F.col("wt"), k=20, seed=4).collect()
    )
    assert picked_clean == picked_dirty
    assert all(i < 1000 for i in picked_dirty)
