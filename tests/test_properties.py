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
