"""Property tests (SURVEY §5): sanitizer algebra, type-map totality, and
engine idempotence laws.

The hypothesis suites are pure-Python (no Spark) and run hundreds of cases;
the Spark idempotence laws use fixed frames (one spark-submit each is
plenty — the law, not the input, is the subject).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aircan_spark import ROW_NUMBER_COLUMN, UPDATED_AT_COLUMN
from aircan_spark.rownum import with_row_number
from aircan_spark.schema import (
    SchemaError,
    frictionless_to_spark_type,
    sanitize_column_name,
    spark_to_frictionless_type,
)
from aircan_spark.table import ParquetTable

TS = dt.datetime(2026, 3, 3, 9, 0, 0)


# --- sanitizer algebra (pure python, hypothesis) ------------------------------

names = st.text(min_size=1, max_size=200)


@given(names)
@settings(max_examples=500, deadline=None)
def test_sanitize_idempotent(name):
    try:
        once = sanitize_column_name(name)
    except SchemaError:
        return  # names that sanitize to empty are rejected, consistently
    assert sanitize_column_name(once) == once


@given(names)
@settings(max_examples=500, deadline=None)
def test_sanitize_output_is_identifier(name):
    try:
        out = sanitize_column_name(name)
    except SchemaError:
        return
    import re

    assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", out), out
    assert len(out) <= 128


@given(st.text(max_size=50))
@settings(max_examples=300, deadline=None)
def test_type_map_total(ftype):
    # every string maps to SOME spark type, and that type maps back to a
    # frictionless name — no KeyError path exists
    t = frictionless_to_spark_type(ftype)
    assert spark_to_frictionless_type(t)


# --- engine idempotence laws (Spark) -----------------------------------------


@pytest.fixture()
def seeded_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k long, s string, v double",
    )
    t = ParquetTable(spark, str(tmp_path), "t")
    t.overwrite(
        with_row_number(df, order_by=["k"]).withColumn(UPDATED_AT_COLUMN, F.lit(TS))
    )
    return t


def _snapshot(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_upsert_idempotent(spark, seeded_table):
    stage = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    ts = dt.datetime(2026, 4, 4, 9, 0, 0)
    seeded_table.upsert(stage, ["k"], job_ts=ts)
    once = _snapshot(seeded_table)
    seeded_table.upsert(stage, ["k"], job_ts=dt.datetime(2026, 5, 5, 9, 0, 0))
    twice = _snapshot(seeded_table)
    # second identical upsert changes NOTHING: values equal -> no update
    # branch fires, no _updated_at bump, no new _ids
    assert once == twice


def test_overwrite_rerun_idempotent(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    t = ParquetTable(spark, str(tmp_path), "t")
    numbered = with_row_number(df, order_by=["k"])
    t.overwrite(numbered)
    once = _snapshot(t)
    t.overwrite(numbered)
    assert _snapshot(t) == once


def test_rownum_deterministic_under_reordering(spark):
    base = [(i, f"s{i}") for i in range(1, 201)]
    df1 = spark.createDataFrame(base, "k long, s string")
    df2 = spark.createDataFrame(list(reversed(base)), "k long, s string").repartition(7)
    n1 = {(r["k"], r[ROW_NUMBER_COLUMN]) for r in with_row_number(df1, order_by=["k"]).collect()}
    n2 = {(r["k"], r[ROW_NUMBER_COLUMN]) for r in with_row_number(df2, order_by=["k"]).collect()}
    # explicit order_by makes numbering independent of physical layout
    assert n1 == n2


# --- chunking / sampling laws (Spark, few frames; laws are the subject) --------


def test_chunking_reconstruction_law(spark):
    """For ANY (chunk_size, overlap) the stride-prefixes of the chunks
    concatenated reproduce the token stream, and each chunk holds exactly
    min(chunk_size, n - start) tokens (windows overrunning the document
    are truncated, so several trailing chunks may be short)."""
    from aircan_spark.ext.chunking import chunk_documents

    words = [f"t{i}" for i in range(57)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    for chunk_size, overlap in [(8, 0), (8, 3), (5, 4), (57, 0), (64, 10), (1, 0)]:
        stride = chunk_size - overlap
        rows = sorted(
            chunk_documents(df, chunk_size=chunk_size, overlap=overlap).collect(),
            key=lambda r: r["chunk_id"],
        )
        rebuilt = []
        for r in rows:
            rebuilt.extend(r["chunk_text"].split(" ")[:stride])
        assert rebuilt[: len(words)] == words, (chunk_size, overlap)
        for r in rows:
            start = r["chunk_id"] * stride
            assert r["n_chunk_tokens"] == min(chunk_size, 57 - start), (
                chunk_size, overlap, r["chunk_id"],
            )


def test_hash_split_is_partition_function(spark):
    """Every row lands in exactly one split and the union is the input —
    for any weights dict."""
    from aircan_spark.ext.sampling import hash_split

    ids = spark.createDataFrame([(i,) for i in range(500)], "id long")
    for weights in [None, {"a": 0.5, "b": 0.5}, {"x": 0.99, "y": 0.01}]:
        out = hash_split(ids, "id", weights=weights, seed=5)
        assert out.count() == 500
        assert out.select("id").distinct().count() == 500
        labels = {r["split"] for r in out.select("split").distinct().collect()}
        expect = set((weights or {"train": 1, "val": 1, "test": 1}).keys())
        assert labels <= expect


def test_stratified_sample_is_subset_and_deterministic(spark):
    from aircan_spark.ext.sampling import stratified_sample

    df = spark.createDataFrame(
        [(f"g{i % 7}", i) for i in range(300)], "g string, id long"
    )
    out = stratified_sample(df, ["g"], 3, "id", seed=9)
    ids = {r["id"] for r in out.collect()}
    assert ids <= set(range(300))
    per_group = {r["g"]: r["n"] for r in out.groupBy("g").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 3 for n in per_group.values())
    again = {r["id"] for r in stratified_sample(df, ["g"], 3, "id", seed=9).collect()}
    assert ids == again
